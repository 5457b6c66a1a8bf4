"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

The image/audio codec libraries are not in this container, so the *decode
kernel* is a clearly-marked deterministic stub (`_fake_decode`) — but the
Spark-side plumbing is real and is what matters at 100 TB:

* payloads travel as a ``binary`` column (never stringified);
* decode runs per Arrow batch via ``mapInPandas`` — one Python round trip
  per batch, not per row, and the batch size bounds executor memory;
* outputs are typed metadata columns so downstream filters/aggregations
  stay JVM-side.

Swapping `_fake_decode` for PIL/ffmpeg is a one-function change; the
schema, partitioning and batch shape stay identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, channels long, "
    "format string"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload column (here: the utf-8 bytes of the text
    acting as a stand-in blob; in production this is the stored image)."""
    return docs.withColumn("payload", F.encode(F.col("text"), "utf-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, int, str]:
    """STUB for the real image decoder (PIL/libjpeg are not available in
    this environment).  Deterministic metadata derived from the bytes so
    the pipeline is testable end-to-end; replace with a real decode to
    productionize.  Raises on empty payloads the way a codec would."""
    if not payload:
        raise NotImplementedError("empty payload: nothing to decode")
    n = len(payload)
    width = 64 + n % 577
    height = 64 + (n * 31) % 417
    return n, width, height, 3, "fake-rgb"


def decode_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """mapInPandas decode stage: (doc_id, payload) → typed metadata."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                decoded, columns=["n_bytes", "width", "height", "channels", "format"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


#: oracle twin — the stub's arithmetic restated over the ASCII text length
DECODE_METADATA_SQL = """
SELECT doc_id,
       length(text)::BIGINT AS n_bytes,
       (64 + length(text) % 577)::BIGINT AS width,
       (64 + (length(text) * 31) % 417)::BIGINT AS height,
       3::BIGINT AS channels,
       'fake-rgb' AS format
FROM documents
""".strip()
