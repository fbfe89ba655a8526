"""Checkpoint manifest / lineage state for resumable runs."""
