"""Deterministic distributed Bloom filter — the "seen before?" gate.

Web-scale ingestion needs an approximate-membership structure long
before it needs another join: has this URL been crawled, this document
fingerprint ingested, this span already trained on.  A Bloom filter
(Bloom 1970) answers with no false negatives and a tunable
false-positive rate in m bits — the gate that lets a 100 TB pipeline
skip the exact-dedup join for the overwhelmingly-common "never seen"
case.

This one is built ENGINE-PORTABLY so the oracle can replay the exact
bit pattern: the k probe positions derive from md5 chunks (the same
hash family as every other dedup operator here), and the bit array is
a table of (word_idx, bits) rows using 63 bits per long — the sign bit
stays clear, so Spark's ``bit_or``/``shiftleft`` and DuckDB's
``|``/``<<`` agree without signed-overflow edge cases.

Representation notes for 100 TB: the filter is a mergeable row-wise
aggregate (bit_or is commutative/associative), so shards build local
filters and OR them — the same two-phase shape as every sketch in
``operators/``; a 2³⁰-bit filter is ~17 M rows ≈ 260 MB as longs,
still broadcastable after the build, and the build itself is one
explode + one groupBy(word_idx).  Probing is a broadcast join of the
batch's k positions against the filter rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: default sizing: 2^20 bits, 7 hashes — ~0.8% FP at n = m/10 keys
BLOOM_MBITS = 1 << 20
BLOOM_K = 7

#: bits per stored word (63 keeps the long's sign bit clear on both engines)
_WORD = 63

#: salt for the second md5 (positions 4..7 need a second 128-bit digest)
_SALT = "!b2"


def _positions_expr(key: str, k: int, mbits: int) -> str:
    """Spark SQL array of the k probe positions for ``key`` (a string
    column/expr): 32-bit chunks of md5(key) and md5(key||salt), mod m."""
    if not 1 <= k <= 8:
        raise ValueError("k must be in 1..8 (two md5 digests)")
    return (
        f"transform(sequence(0, {k - 1}), j -> "
        f"CAST(conv(substring(CASE WHEN j < 4 THEN md5({key}) "
        f"ELSE md5(concat({key}, '{_SALT}')) END, (j * 8) % 32 + 1, 8), "
        f"16, 10) AS BIGINT) % {mbits})"
    )


def _positions_sql(key: str, k: int, mbits: int) -> str:
    """DuckDB twin of :func:`_positions_expr` — identical chunks, salt,
    and modulus, so both engines probe identical positions."""
    return (
        f"list_transform(range(0, {k}), j -> "
        f"('0x' || substr(CASE WHEN j < 4 THEN md5({key}) "
        f"ELSE md5({key} || '{_SALT}') END, ((j * 8) % 32) + 1, 8))::BIGINT "
        f"% {mbits})"
    )


def build_bloom_filter(keys: DataFrame, key_col: str = "fingerprint",
                       mbits: int = BLOOM_MBITS, k: int = BLOOM_K) -> DataFrame:
    """(word_idx, bits): the filter over every non-null key.  Mergeable:
    union two filters and re-``bit_or`` by word_idx to OR them."""
    pos = (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.explode(F.expr(_positions_expr(key_col, k, mbits)))
                .alias("p"))
    )
    return (
        pos.select(
            F.expr(f"p div {_WORD}").alias("word_idx"),
            F.expr(f"shiftleft(1L, CAST(p % {_WORD} AS INT))").alias("b"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )


def bloom_probe(batch: DataFrame, bloom: DataFrame,
                key_col: str = "fingerprint",
                mbits: int = BLOOM_MBITS, k: int = BLOOM_K) -> DataFrame:
    """Probe each batch row against a built filter: ``maybe_seen`` = 1
    iff ALL k positions are set (no false negatives; false positives at
    the designed rate).  Output: batch's columns + maybe_seen BIGINT.

    Scale shape: the batch's DISTINCT keys explode k-fold, left-join the
    (broadcast) filter rows on word_idx, and fold back with bool_and per
    key; the verdict joins back on the key itself — ``maybe_seen`` is a
    pure function of the key, so no synthetic row id is ever needed (a
    monotonically_increasing_id correlation here was a real bug: the id
    is assigned per-plan-evaluation, and the two sides of the rejoin can
    be recomputed under different partitionings).  NULL keys report 0.
    The corpus that built the filter is never touched."""
    pos = (
        batch.filter(F.col(key_col).isNotNull())
        .select(key_col).distinct()
        .select(
            key_col,
            F.explode(F.expr(_positions_expr(key_col, k, mbits))).alias("p"),
        )
        .withColumn("word_idx", F.expr(f"p div {_WORD}"))
    )
    hits = (
        pos.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            key_col,
            F.coalesce(
                F.expr(f"(shiftright(bits, CAST(p % {_WORD} AS INT)) & 1) = 1"),
                F.lit(False),
            ).alias("__hit"),
        )
        .groupBy(key_col)
        .agg(F.expr("bool_and(__hit)").cast("long").alias("maybe_seen"))
    )
    return batch.join(hits, key_col, "left").withColumn(
        "maybe_seen", F.coalesce("maybe_seen", F.lit(0))
    )


def bloom_probe_sql(seen_pred: str, mbits: int = BLOOM_MBITS,
                    k: int = BLOOM_K) -> str:
    """DuckDB twin of the registry's build-then-probe round trip over the
    documents table: keys are md5(text); rows matching ``seen_pred``
    (templated on ``{id}``) form the filter, the rest are the probe
    batch.  Emits (doc_id, maybe_seen, truly_seen) — truth from an exact
    semi-join so the oracle also pins the false-positive set."""
    seen = seen_pred.format(id="doc_id")
    pos = _positions_sql("md5(text)", k, mbits)
    return f"""
WITH seen AS (SELECT doc_id, md5(text) AS fp, {pos} AS ps
              FROM documents WHERE {seen}),
batch AS (SELECT doc_id, md5(text) AS fp, {pos} AS ps
          FROM documents WHERE NOT ({seen})),
bloom AS (
  SELECT p // {_WORD} AS word_idx,
         bit_or(1::BIGINT << (p % {_WORD})::INT) AS bits
  FROM (SELECT unnest(ps) AS p FROM seen)
  GROUP BY 1
),
probed AS (
  SELECT b.doc_id,
         bool_and(coalesce((bl.bits >> (u.p % {_WORD})::INT) & 1, 0) = 1)
           AS maybe
  FROM batch b, unnest(b.ps) AS u(p)
  LEFT JOIN bloom bl ON u.p // {_WORD} = bl.word_idx
  GROUP BY b.doc_id
)
SELECT p.doc_id,
       p.maybe::BIGINT AS maybe_seen,
       (EXISTS (SELECT 1 FROM seen s JOIN batch b2 ON s.fp = b2.fp
                WHERE b2.doc_id = p.doc_id))::BIGINT AS truly_seen
FROM probed p
""".strip()
