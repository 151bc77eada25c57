"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY §2.6 — its crawler loop is
synchronous batch iteration), so nothing here is required for parity. These
operators extend the engine for continuously-arriving corpora:

- incremental.incremental_index: file-stream of new documents -> foreachBatch
  -> versioned index state via the I14 merge operator (old entries win,
  caps + IDF recomputed), exactly-once via the streaming checkpoint.
- incremental.token_trends: event-time windowed term counts with a
  watermark for late data.
"""
