"""Structured Streaming surface.

The reference has no stream processing (SURVEY.md §2.8) — its only
"streaming" artifact is a reconnect loop (`ingress/db/db.go:108-132`).  The
graft is batch-first; this package exists to prove the engine's operators
also run under `readStream` (file source → windowless aggregation → memory
sink) for incremental ingest of new WARC drops.
"""
