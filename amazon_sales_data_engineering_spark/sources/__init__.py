"""File sources/sinks: format presets, metadata columns, load ledger."""

from . import formats, ledger, readers, sinks  # noqa: F401
