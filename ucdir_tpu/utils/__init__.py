"""Utilities: logging, orbax checkpointing, torch checkpoint conversion."""
