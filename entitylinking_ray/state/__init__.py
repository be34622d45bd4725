"""Checkpoint / lineage state (SURVEY §7.2 step 7)."""
