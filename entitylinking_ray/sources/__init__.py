"""Dataset sources/sinks (SURVEY §2.1)."""
