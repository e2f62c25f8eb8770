"""Spark-facing operators: extraction UDFs, dedup, similarity, text stats."""
