"""Streaming exact deduplication (SURVEY §2.7 streaming surface × the
LLM-pipeline dedup mandate).

A training-data ingest stream needs the same normalized-content dedup as
the batch path (``operators.dedup.exact_dedup``) but with STATE BOUNDS:
a standing stream cannot keep every content hash it has ever seen. Spark
provides exactly this shape natively —
``dropDuplicatesWithinWatermark`` keeps dedup state only for keys whose
event time is within the watermark, so memory is bounded by the stream's
rate × the watermark horizon, not its lifetime. The content key is the
same ``sha2(normalized_text, 256)`` the batch operators group by, so a
document deduped by the stream is exactly a document the batch path
would have deduped (modulo the horizon).

Semantics deltas vs batch ``exact_dedup`` (inherent to streaming, stated
rather than hidden):

- **first-arrival wins**, not min-id: a stream cannot know the minimum
  id of a group it has not finished seeing;
- duplicates farther apart in EVENT TIME than the watermark are NOT
  collapsed (state for the earlier copy has been evicted) — pick the
  horizon to cover the duplication window the corpus actually has, and
  run a periodic batch ``exact_dedup`` compaction behind the stream for
  global exactness (the standard lambda shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkschema.operators.dedup import normalized_text

_KEY = "__content_key"


def streaming_exact_dedup(stream_df: DataFrame, text_col: str,
                          ts_col: str | None = None,
                          watermark: str = "24 hours") -> DataFrame:
    """Drop exact (normalized-content) duplicates from a streaming
    DataFrame; returns the deduplicated stream with the input schema.

    With ``ts_col``: bounded state — the event-time watermark evicts
    dedup state older than ``watermark`` (``dropDuplicatesWithinWatermark``).
    Without ``ts_col``: ``dropDuplicates`` on the content key, which
    keeps state for EVERY distinct document forever — acceptable for
    bounded backfills (``trigger(availableNow=True)``), a memory leak on
    a standing stream, so prefer passing ``ts_col``.

    NULL-text rows pass through un-deduplicated (same contract as batch:
    absent documents are not copies of each other). The union of the
    NULL branch is stream-safe (both branches are append-only
    projections of the same source).
    """
    key = F.sha2(normalized_text(F.col(text_col)), 256).alias(_KEY)
    nulls = stream_df.where(F.col(text_col).isNull())
    docs = stream_df.where(F.col(text_col).isNotNull()) \
                    .withColumn(_KEY, key)
    if ts_col is not None:
        deduped = (docs.withWatermark(ts_col, watermark)
                       .dropDuplicatesWithinWatermark([_KEY]))
    else:
        deduped = docs.dropDuplicates([_KEY])
    return deduped.drop(_KEY).unionByName(nulls)
