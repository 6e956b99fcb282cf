"""Streaming exact deduplication — continuous-ingest dedup for a
training-data landing zone.

``dropDuplicatesWithinWatermark`` keeps per-key state only until the
watermark passes (bounded state), so re-delivered events/documents
(at-least-once sources, retried uploads) are dropped exactly while the
duplicate window is open. This is the streaming counterpart of
``operators.dedup.exact_dedup``: same content-hash key, incremental
instead of full-corpus.

Scale notes: state is one entry per distinct key inside the watermark
horizon — sized by ingest rate × lateness bound, independent of corpus
history. For exactly-once landing into parquet, pair with the file
sink's transactional commit log (as in the weekly stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose key re-appears within the watermark horizon.

    ``events`` must be a streaming DataFrame. The first arrival of each
    key wins; later duplicates are discarded while state is retained.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_documents_stream(
    documents: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Content-hash streaming dedup for a document landing zone: the
    same normalized-md5 identity as the batch ``exact_dedup``."""
    hashed = documents.withColumn(
        "content_hash",
        F.md5(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))),
    )
    return dedup_stream(hashed, ["content_hash"], ts_col, watermark)
