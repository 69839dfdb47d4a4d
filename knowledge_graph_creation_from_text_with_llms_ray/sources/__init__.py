"""Corpus synthesis, readers/adapters, and the broadcast alias dictionary."""
