"""Batch jobs (spark-submit entry points)."""
