"""End-to-end pipelines and query catalogue (queries + oracle SQL)."""
