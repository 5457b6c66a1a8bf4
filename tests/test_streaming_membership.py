"""Streaming Bloom gate: never-seen rows pass exactly once across
micro-batch splits; seen keys never pass twice (no false negatives);
the exact pass set equals a sequential md5-position replay — FPs and
all; compaction preserves probe behavior."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from akumuli_spark.pipeline.membership import _SALT
from akumuli_spark.streaming.membership import (
    bloom_gate_batch,
    compact_bloom_store,
    start_streaming_bloom_gate,
)

SCHEMA = "doc_id long, text string"


def _rows(n: int = 48, n_distinct: int = 16):
    return [(i, f"page body {i % n_distinct}") for i in range(n)]


def _chunks(rows, cuts):
    return [rows[cuts[i]:cuts[i + 1]] for i in range(len(cuts) - 1)]


def _py_positions(key: str, k: int, mbits: int):
    import hashlib
    h1 = hashlib.md5(key.encode()).hexdigest()
    h2 = hashlib.md5((key + _SALT).encode()).hexdigest()
    return [
        int((h1 if j < 4 else h2)[(j * 8) % 32:(j * 8) % 32 + 8], 16) % mbits
        for j in range(k)
    ]


def _replay(batches, mbits, k):
    """Sequential reference: per batch, first occurrence per key probes
    the filter; passing keys' bits are set after the batch."""
    import hashlib
    bits: set[int] = set()
    passed: set[tuple] = set()
    for batch in batches:
        seen_in_batch: set[str] = set()
        novel = []
        for doc_id, text in batch:
            fp = hashlib.md5(text.encode()).hexdigest()
            if fp in seen_in_batch:
                continue
            seen_in_batch.add(fp)
            ps = _py_positions(fp, k, mbits)
            if not all(p in bits for p in ps):
                novel.append((doc_id, fp, ps))
        for doc_id, fp, ps in novel:
            passed.add((doc_id, fp))
            bits.update(ps)
    return passed


def test_stream_passes_first_arrivals_once(spark, tmp_path):
    rows = _rows()
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    cuts = [0, 5, 17, 18, 40, len(rows)]
    for i, chunk in enumerate(_chunks(rows, cuts)):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(in_dir, f"c{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
        .withColumn("fingerprint", F.md5("text"))
    )
    q = start_streaming_bloom_gate(
        stream, str(tmp_path / "store"), str(tmp_path / "out"),
        str(tmp_path / "chk"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["doc_id"], r["fingerprint"])
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    # file-per-trigger delivers in name order == the cut order
    from akumuli_spark.pipeline.membership import BLOOM_K, BLOOM_MBITS
    expect = _replay(_chunks(rows, cuts), BLOOM_MBITS, BLOOM_K)
    assert got == expect
    # at the design point there are no FPs: pass set == first arrivals
    first = {}
    for i, t in rows:
        first.setdefault(t, i)
    assert {d for d, _ in got} == set(first.values())


def test_gate_replay_exact_under_saturation(spark, tmp_path):
    """Undersized filter: false positives drop never-seen keys — the
    exact same ones the Python replay drops."""
    rows = [(i, f"k{i}") for i in range(120)]
    batches = _chunks(rows, [0, 40, 80, 120])
    store = str(tmp_path / "store")
    got = set()
    for batch in batches:
        out = bloom_gate_batch(
            spark, spark.createDataFrame(batch, SCHEMA).withColumn(
                "fingerprint", F.md5("text")),
            store, mbits=256, k=3,
        ).collect()
        got |= {(r["doc_id"], r["fingerprint"]) for r in out}
    expect = _replay(batches, 256, 3)
    assert got == expect
    assert len(got) < 120  # saturation really dropped some


def test_compaction_preserves_gate_behavior(spark, tmp_path):
    rows = _rows(30, 10)
    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(rows[:20], SCHEMA).withColumn(
        "fingerprint", F.md5("text"))
    bloom_gate_batch(spark, b1, store)
    n = compact_bloom_store(spark, store)
    assert 0 < n == spark.read.parquet(store).count()
    b2 = spark.createDataFrame(rows[20:], SCHEMA).withColumn(
        "fingerprint", F.md5("text"))
    out = bloom_gate_batch(spark, b2, store).collect()
    # rows 20..29 repeat fingerprints 0..9, all already in the filter
    assert out == []
