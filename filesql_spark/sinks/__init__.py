"""Export layer: DumpDatabase equivalent + per-format writers."""
