"""Utilities: meters, checkpointing, logging, visualization."""
