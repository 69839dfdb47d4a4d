"""Lineage manifests and partition-level resume."""
