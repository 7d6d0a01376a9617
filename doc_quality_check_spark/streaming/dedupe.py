"""Streaming deduplication: drop repeated clip_ids from a continuous feed.

A continuously-ingested clips table sees the same clip re-delivered
(at-least-once sources, backfills, retried uploads). Batch dedup
(operators/dedup.py) needs the whole table; the streaming twin keeps a
bounded state of recently-seen keys and drops repeats as they arrive:

- :func:`stream_dedupe` — exact keyed dedup with
  ``dropDuplicatesWithinWatermark``: a repeat arriving within the watermark
  of its first occurrence is dropped; state for keys older than the
  watermark is evicted, so state is bounded by (watermark window × arrival
  rate), not stream length. This is the standard Structured Streaming
  contract: duplicates are GUARANTEED dropped only while the first
  occurrence's state is still live — re-deliveries later than the watermark
  may pass (design the watermark to cover the source's re-delivery horizon).
- For batch DataFrames the same call degrades to plain
  ``dropDuplicates`` on the key (one shuffle), so one code path serves both
  (the engine-wide batch/streaming symmetry rule, streaming/windowed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedupe(
    df: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate-keyed rows from a (streaming or batch) DataFrame.

    Streaming: ``withWatermark(ts_col, watermark)`` then
    ``dropDuplicatesWithinWatermark(key_cols)`` — state per distinct key,
    evicted after the watermark passes. Batch: ``dropDuplicates(key_cols)``
    (watermark semantics don't apply; first-seen row per key wins
    arbitrarily, as in batch dedup)."""
    keys = key_cols or ["clip_id"]
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return df.dropDuplicates(keys)
