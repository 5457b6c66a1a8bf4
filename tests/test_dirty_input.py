"""Dirty-row totality: NULL text, empty/whitespace text, NULL
embeddings, and empty (zero-length) embedding arrays appended to real
tables must flow through every operator — dropped, bucketed out, or
surfaced as typed corrupt rows — never crash a stage.  A full
148-entry sweep ran green in round 8; this pins the 17 entries that
used to fail (ANSI divide-by-zero on zero-norm cosine pairs,
element_at past the end of an empty vector, np.stack over NULL/ragged
embeddings, NaN token counts in the pack kernel, .encode on NULL
text in the payload synths)."""

from __future__ import annotations

import pytest

from akumuli_spark import registry
from tests.conftest import SF_DIR

ENTRIES = [
    "ann_lsh_topk", "dedup_embedding_cosine", "dedup_embedding_lsh",
    "dedup_embedding_lsh_multi", "dedup_semantic_incremental",
    "dedup_semantic_indexed", "multimodal_decode_bmp",
    "multimodal_decode_dirty", "multimodal_decode_jpeg",
    "multimodal_decode_png", "multimodal_decode_wav",
    "multimodal_features", "multimodal_frame_sample", "multimodal_resize",
    "pack_materialize", "pack_sequences", "pack_sequences_sharded",
]


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_dirty")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        (spark.read.parquet(f"{SF_DIR}/{t}.parquet")
         .write.mode("overwrite").parquet(str(dst / f"{t}.parquet")))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.unionByName(spark.createDataFrame(
        [(900001, None, None, "dirty", 0),
         (900002, "", "en", "dirty", 0),
         (900003, "   ", "en", "dirty", 3)], docs.schema
    )).write.mode("overwrite").parquet(str(dst / "documents.parquet"))
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    embs.unionByName(spark.createDataFrame(
        [(900001, None, None), (900002, [], 7)], embs.schema
    )).write.mode("overwrite").parquet(str(dst / "embeddings.parquet"))
    return str(dst)


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_total_on_dirty_rows(spark, dirty_dir, name):
    # totality is the contract; result content for dirty rows is pinned
    # per-operator (corrupt rows, zero-token packs, dropped vectors)
    registry.queries()[name](spark, dirty_dir).count()


def test_dirty_vectors_never_pair(spark, dirty_dir):
    """NULL/empty vectors must not appear in any near-dup pair."""
    from akumuli_spark.sources.testdata import load_table
    from akumuli_spark.pipeline import dedup

    embs = load_table(spark, dirty_dir, "embeddings")
    pairs = dedup.embedding_near_dup_lsh_multi(embs, threshold=0.0)
    bad = pairs.filter(
        (pairs["id_a"] >= 900001) | (pairs["id_b"] >= 900001)
    ).count()
    assert bad == 0


def test_null_text_packs_as_zero_tokens(spark, dirty_dir):
    from akumuli_spark.sources.testdata import load_table
    from akumuli_spark.pipeline import cluster

    docs = load_table(spark, dirty_dir, "documents")
    packed = cluster.pack_sequences(
        docs, budget=512, stratum_col="source", n_shards=2
    )
    row = packed.filter(packed["doc_id"] == 900001).collect()
    assert len(row) == 1 and row[0]["n_tokens"] == 0
