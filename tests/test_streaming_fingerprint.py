"""Continuous fingerprint (multimodal signature) dedup: the stream's
cumulative pair set must equal the one-shot batch pairing over all
signatures, each pair once; epoch replays reproduce decisions exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from akumuli_spark.pipeline.dedup import _signature_hamming_pairs
from akumuli_spark.streaming.fingerprint import (
    fingerprint_batch_against_store,
    start_streaming_fingerprint_dedup,
)

SCHEMA = "id long, simhash long"


def _sigs(n: int = 30):
    # hash-like signatures with planted near-dups: id i and i+10 differ
    # in exactly 2 bits for i in 0..4; everything else far apart
    base = [(i, (0x5A5A5A5A5A5A5A5 * (i + 3)) & ((1 << 60) - 1))
            for i in range(n)]
    out = dict(base)
    for i in range(5):
        out[i + 10] = out[i] ^ 0b101  # hamming 2
    return sorted(out.items())


def test_streaming_fingerprint_equals_batch_pairs(spark, tmp_path):
    rows = _sigs()
    sig_df = spark.createDataFrame(rows, SCHEMA)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for k, lo, hi in ((0, 0, 11), (1, 11, 22), (2, 22, 30)):
        sig_df.filter(f"id >= {lo} AND id < {hi}").coalesce(1) \
            .write.parquet(os.path.join(in_dir, f"b{k}"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "*"))
    )
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")
    q = start_streaming_fingerprint_dedup(
        stream, store, pairs_dir, str(tmp_path / "chk"), max_hamming=3
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in spark.read.parquet(pairs_dir).collect()
    )
    want = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in _signature_hamming_pairs(sig_df, 3).collect()
    )
    assert got == want and len(got) >= 5  # all planted pairs found once
    assert len(got) == len(set(got))
    assert spark.read.parquet(store).select("id").distinct().count() == 30


def test_fingerprint_epoch_replay_exactly_once(spark, tmp_path):
    rows = _sigs()
    sig_df = spark.createDataFrame(rows, SCHEMA)
    store = str(tmp_path / "store")
    splits = [(0, 0, 11), (1, 11, 22), (2, 22, 30)]
    outs = {}
    for e, lo, hi in splits:
        outs[e] = sorted(map(tuple, fingerprint_batch_against_store(
            spark, sig_df.filter(f"id >= {lo} AND id < {hi}"), store,
            max_hamming=3, epoch_id=e,
        ).collect()))
    n_store = spark.read.parquet(store).count()
    e, lo, hi = splits[-1]
    replay = sorted(map(tuple, fingerprint_batch_against_store(
        spark, sig_df.filter(f"id >= {lo} AND id < {hi}"), store,
        max_hamming=3, epoch_id=e,
    ).collect()))
    assert replay == outs[e]
    assert spark.read.parquet(store).count() == n_store
    # cumulative output equals the one-shot pairing
    got = sorted(set().union(*map(set, outs.values())))
    want = sorted(map(tuple, _signature_hamming_pairs(sig_df, 3).collect()))
    assert got == want


def test_fingerprint_stream_accepts_image_hashes(spark, tmp_path):
    """End-to-end with REAL image hashes: dHash frames rename into the
    gate; byte-identical images across batches pair at hamming 0."""
    import struct

    from akumuli_spark.pipeline import multimodal as mm

    def bmp(body: bytes, w: int, h: int) -> bytearray:
        hdr = struct.pack(
            "<2sIHHIIiiHHIIiiII",
            b"BM", 54 + len(body), 0, 0, 54,
            40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
        )
        return bytearray(hdr + body)

    b1 = spark.createDataFrame(
        [(1, bmp(b"abc", 9, 5)), (2, bmp(b"zzzz", 7, 7))],
        "doc_id long, payload binary",
    )
    b2 = spark.createDataFrame(
        [(3, bmp(b"abc", 9, 5))],  # identical to doc 1
        "doc_id long, payload binary",
    )
    store = str(tmp_path / "store")

    def sigs(pay):
        return mm.image_dhash(pay).filter(
            F.col("dhash").isNotNull()
        ).select(F.col("doc_id").alias("id"), F.col("dhash").alias("simhash"))

    p1 = fingerprint_batch_against_store(
        spark, sigs(b1), store, max_hamming=3, epoch_id=0).collect()
    p2 = fingerprint_batch_against_store(
        spark, sigs(b2), store, max_hamming=3, epoch_id=1).collect()
    assert p1 == []
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in p2] == [(1, 3, 0)]
