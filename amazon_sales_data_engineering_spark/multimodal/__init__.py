"""Multimodal (binary) column plumbing."""

from . import binary_ops  # noqa: F401
