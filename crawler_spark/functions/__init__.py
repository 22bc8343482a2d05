"""Vectorized column functions (the engine's scalar-function library)."""
