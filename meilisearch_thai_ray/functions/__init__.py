"""Shared scalar/vector helper functions (hashing, varint, text metrics)."""
