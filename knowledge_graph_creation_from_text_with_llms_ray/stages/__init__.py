"""Dataset -> Dataset operators (the engine's stage library)."""
