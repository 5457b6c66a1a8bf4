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


def _fp(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "fingerprint", F.md5("text"))


def test_epoch_replay_is_exactly_once(spark, tmp_path):
    """Replaying an epoch (foreachBatch retry) must return the identical
    pass set and leave store row-counts unchanged — with epoch keying the
    retry recomputes against the pre-epoch filter state and overwrites
    its own partition (VERDICT r8 Next #5)."""
    rows = [(i, f"k{i % 25}") for i in range(40)]
    batches = _chunks(rows, [0, 15, 40])
    store = str(tmp_path / "store")
    outs = []
    for e, batch in enumerate(batches):
        outs.append({
            (r["doc_id"], r["fingerprint"])
            for r in bloom_gate_batch(
                spark, _fp(spark, batch), store, epoch_id=e).collect()
        })
    n_store = spark.read.parquet(store).count()
    last = len(batches) - 1
    replay = {
        (r["doc_id"], r["fingerprint"])
        for r in bloom_gate_batch(
            spark, _fp(spark, batches[last]), store, epoch_id=last).collect()
    }
    assert replay == outs[last] and replay  # identical decisions, non-empty
    assert spark.read.parquet(store).count() == n_store  # no duplicate rows
    # a subsequent epoch sees the same world as if no replay happened:
    # every key is now in the filter, nothing passes
    again = bloom_gate_batch(
        spark, _fp(spark, rows), store, epoch_id=last + 1).collect()
    assert again == []


def test_epoch_replay_contrast_with_legacy_mode(spark, tmp_path):
    """The failure mode the epoch protocol closes: WITHOUT epoch keying a
    retry sees its own partial commit and passes zero rows — silently
    dropping data the downstream sink never received."""
    rows = [(i, f"legacy{i}") for i in range(10)]
    store = str(tmp_path / "store")
    first = bloom_gate_batch(spark, _fp(spark, rows), store).collect()
    assert len(first) == 10
    retry = bloom_gate_batch(spark, _fp(spark, rows), store).collect()
    assert retry == []  # at-least-once mode: the retry drops everything


def test_epoch_replay_survives_compaction(spark, tmp_path):
    """Compaction keeps the newest epoch's delta rows out of the fold, so
    a retry of the last epoch (the only one a checkpoint can replay) is
    still exact after a compaction ran between the attempt and the retry."""
    b0 = [(i, f"c{i}") for i in range(12)]
    b1 = [(i + 12, f"c{i + 6}") for i in range(12)]  # 6 seen, 6 novel
    store = str(tmp_path / "store")
    bloom_gate_batch(spark, _fp(spark, b0), store, epoch_id=0)
    out1 = {
        (r["doc_id"], r["fingerprint"])
        for r in bloom_gate_batch(
            spark, _fp(spark, b1), store, epoch_id=1).collect()
    }
    assert {d for d, _ in out1} == set(range(18, 24))  # the 6 novel keys
    n = compact_bloom_store(spark, store)
    assert n == spark.read.parquet(store).count()
    replay = {
        (r["doc_id"], r["fingerprint"])
        for r in bloom_gate_batch(
            spark, _fp(spark, b1), store, epoch_id=1).collect()
    }
    assert replay == out1
    assert spark.read.parquet(store).count() == n


def test_compaction_crash_rolls_forward(spark, tmp_path):
    """Crash in the one-syscall window between the two swap renames: the
    next gate heals the store (tmp is complete → roll forward) instead of
    reading None and passing every seen key again."""
    import os
    import shutil

    rows = [(i, f"r{i}") for i in range(8)]
    store = str(tmp_path / "store")
    bloom_gate_batch(spark, _fp(spark, rows), store)
    # simulate the crashed swap: folded tmp written (with _SUCCESS),
    # store renamed away, second rename never happened
    folded = spark.read.parquet(store).groupBy("word_idx").agg(
        F.expr("bit_or(bits)").alias("bits"))
    tmp = f"{store}.compact-tmp"
    folded.write.mode("overwrite").parquet(tmp)
    os.rename(store, f"{store}.compact-old")
    out = bloom_gate_batch(spark, _fp(spark, rows), store).collect()
    assert out == []  # healed store still knows every key
    assert os.path.exists(store)
    shutil.rmtree(f"{store}.compact-old", ignore_errors=True)


def test_compaction_crash_rolls_back_incomplete_tmp(spark, tmp_path):
    """If the crash happened before the tmp write completed (no _SUCCESS),
    recovery restores the original delta store."""
    import os

    rows = [(i, f"rb{i}") for i in range(8)]
    store = str(tmp_path / "store")
    bloom_gate_batch(spark, _fp(spark, rows), store)
    os.rename(store, f"{store}.compact-old")
    os.makedirs(f"{store}.compact-tmp")  # incomplete: no _SUCCESS
    out = bloom_gate_batch(spark, _fp(spark, rows), store).collect()
    assert out == []  # rolled back: original deltas still gate
    assert os.path.exists(store)


def test_unrecoverable_store_fails_loudly(spark, tmp_path):
    """A missing store with unrecoverable compaction leftovers must raise,
    never silently treat every key as never-seen."""
    import os

    import pytest

    store = str(tmp_path / "store")
    os.makedirs(f"{store}.compact-tmp")  # incomplete tmp, no old to restore
    with pytest.raises(RuntimeError, match="refusing"):
        bloom_gate_batch(
            spark, _fp(spark, [(0, "x")]), store)


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
