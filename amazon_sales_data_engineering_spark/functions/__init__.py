"""Column-expression helpers shared by operators and query plans."""

from . import hashing, text  # noqa: F401
