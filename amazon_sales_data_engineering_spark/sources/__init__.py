"""File sources/sinks: format presets, metadata columns, load ledger."""

from . import ledger, readers, sinks  # noqa: F401
