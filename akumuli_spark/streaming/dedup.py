"""Continuous exact dedup of an arriving document stream — the online
form of ``pipeline.dedup.exact_duplicates`` for ingest-time curation
(dedup the crawl as it lands instead of re-scanning the corpus).

Spark-first shape: ``dropDuplicates`` on the md5 text fingerprint over a
streaming frame — Spark's own streaming-deduplication state store (HDFS-
or RocksDB-backed at scale) keeps the seen-key set, partitioned by the
fingerprint, exactly the state layout a hand-rolled
``applyInPandasWithState`` would rebuild.  The fingerprint rule is the
batch operator's verbatim (md5 of the raw text), so the same key dedups
online and offline.

Keep rule: FIRST ARRIVAL wins.  The batch operator keeps min(doc_id);
for a stream delivered in doc_id order the two agree exactly
(pytest-pinned across arbitrary micro-batch splits and a checkpoint
restart).  Out-of-order delivery keeps an arbitrary-but-single copy per
fingerprint — the standard streaming-dedup contract.

State growth: unbounded in distinct fingerprints by design (exact dedup
IS membership over all history).  Two bounding strategies, both
standard: pass ``within`` to scope dedup to an event-time window
(``dropDuplicatesWithinWatermark`` — state evicts past the watermark,
the "recent-dup storm" filter), or periodically compact the stream into
the batch path (the marks-table rollup pattern in ``ingest.py``) and
let offline ``exact_duplicates`` own full history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(docs: DataFrame, within: str | None = None,
                          event_time_col: str = "ts") -> DataFrame:
    """First-seen-wins exact dedup of a streaming document frame.

    Input: a streaming frame with ``doc_id`` and ``text`` (plus an
    ``event_time_col`` timestamp column when ``within`` is used).
    Output: the surviving rows, with the ``fingerprint`` column added.

    ``within=None``: full-history dedup (state = all distinct
    fingerprints).  ``within="10 minutes"``: watermarked dedup — a
    duplicate arriving later than the window may be re-emitted, state is
    evicted with the watermark.
    """
    keyed = docs.withColumn("fingerprint", F.md5(F.col("text")))
    if within is None:
        return keyed.dropDuplicates(["fingerprint"])
    return (
        keyed.withWatermark(event_time_col, within)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
