"""Pure deterministic per-turn / per-document functions (no Ray)."""
