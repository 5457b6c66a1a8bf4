"""pipeline.quality: Gopher quality rules, line repetition, paragraph
dedup — unit semantics over hand-built multi-line documents plus the
registry's cross-engine gate over the synthetic corpus (the corpus is
single-line, so the real line/bullet/ellipsis behavior is pinned here)."""

from __future__ import annotations

import pytest

from akumuli_spark.pipeline import quality as Q


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _row(df, doc_id):
    return {r["doc_id"]: r.asDict() for r in df.collect()}[doc_id]


# ---------------------------------------------------------------------------
# gopher_quality_flags
# ---------------------------------------------------------------------------


def test_gopher_passes_clean_prose(spark):
    text = " ".join(
        ["the quick brown fox jumps over that lazy dog with vigor and"] * 6
    )  # 72 words, all alpha, stops: the/that/with/and ⇒ 4 hits
    out = _row(Q.gopher_quality_flags(_docs(spark, [(1, text)])), 1)
    assert out["n_words"] == 72
    assert out["passes"] == 1
    assert out["alpha_word_frac"] == 1.0
    assert out["n_stop_hits"] == 4


def test_gopher_word_count_bounds(spark):
    short = "the cat sat with that hat"  # 6 words < 50
    out = _row(Q.gopher_quality_flags(_docs(spark, [(1, short)])), 1)
    assert out["passes"] == 0 and out["n_words"] == 6


def test_gopher_mean_word_len(spark):
    # 60 one-char words: mean length 1 < 3 ⇒ fail that rule
    text = " ".join(["a"] * 58 + ["the", "with"])
    out = _row(Q.gopher_quality_flags(_docs(spark, [(1, text)])), 1)
    assert out["mean_word_len"] < 3
    assert out["passes"] == 0


def test_gopher_symbol_ratios(spark):
    base = ["the word with data that runs fine here now ok"] * 5  # 50 words
    hashy = " ".join(base) + " " + "# # # # # #"  # 6 hashes / 56 words > 0.1
    out = _row(Q.gopher_quality_flags(_docs(spark, [(1, hashy)])), 1)
    assert out["hash_word_ratio"] > 0.1 and out["passes"] == 0
    dots = " ".join(base) + " x... y... z... w... v... u... t..."
    out2 = _row(Q.gopher_quality_flags(_docs(spark, [(2, dots)])), 2)
    assert out2["ellipsis_word_ratio"] > 0.1 and out2["passes"] == 0
    # unicode ellipsis counts too
    uni = " ".join(base) + " x… y… z… w… v… u… t…"
    out3 = _row(Q.gopher_quality_flags(_docs(spark, [(3, uni)])), 3)
    assert out3["ellipsis_word_ratio"] == pytest.approx(7 / 57)


def test_gopher_line_rules(spark):
    words = " ".join(["the data with more here"] * 12)  # 60 words, 1 line
    # bullet lines stay alpha-rich ("-" itself is a non-alpha token and
    # the alpha-word rule sees every token)
    bullets = "\n".join(["- item alpha beta"] * 9 + [words])
    out = _row(Q.gopher_quality_flags(_docs(spark, [(1, bullets)])), 1)
    assert out["bullet_line_frac"] == pytest.approx(0.9)
    # 0.9 is the boundary: rule is <= 0.9 so still passes
    assert out["passes"] == 1
    ell = "\n".join(["trailing thing..."] * 2 + [words, words])
    out2 = _row(Q.gopher_quality_flags(_docs(spark, [(2, ell)])), 2)
    assert out2["ellipsis_line_frac"] == pytest.approx(0.5)
    assert out2["passes"] == 0


def test_gopher_alpha_and_stops(spark):
    nums = " ".join(["111 222 333 444 555 the with 888 999 000"] * 6)
    out = _row(Q.gopher_quality_flags(_docs(spark, [(1, nums)])), 1)
    assert out["alpha_word_frac"] == pytest.approx(0.2)
    assert out["n_stop_hits"] == 2
    assert out["passes"] == 0


def test_gopher_empty_and_whitespace(spark):
    out = Q.gopher_quality_flags(
        _docs(spark, [(1, ""), (2, "   "), (3, "\n\n")])
    )
    rows = {r["doc_id"]: r.asDict() for r in out.collect()}
    for d in (1, 2, 3):
        assert rows[d]["n_words"] == 0
        assert rows[d]["passes"] == 0
        assert rows[d]["bullet_line_frac"] == 0.0


def test_gopher_keep_passthrough(spark):
    """The keep-columns passthrough (r14: lets the curation composition
    gate without a corpus self-join) must change NOTHING about the
    computed signals, and the kept columns must ride through verbatim —
    including 'text' itself, which the flag computation also consumes."""
    docs = spark.createDataFrame(
        [(1, "the cat sat with a dog and they were happy at home", "en"),
         (2, "", "fr")],
        "doc_id long, text string, lang string",
    )
    plain = {r["doc_id"]: r.asDict()
             for r in Q.gopher_quality_flags(docs).collect()}
    kept = {r["doc_id"]: r.asDict()
            for r in Q.gopher_quality_flags(docs, "text", "lang").collect()}
    src = {r["doc_id"]: r.asDict() for r in docs.collect()}
    for d in (1, 2):
        for col, v in plain[d].items():
            assert kept[d][col] == v, (d, col)
        assert kept[d]["text"] == src[d]["text"]
        assert kept[d]["lang"] == src[d]["lang"]


# ---------------------------------------------------------------------------
# line_repetition_signals
# ---------------------------------------------------------------------------


def test_line_repetition_counts_every_occurrence(spark):
    # 4 lines, "dup" appears twice ⇒ dup fraction 2/4 (Gopher counts both
    # occurrences), char fraction weighted by line length
    text = "dup\nunique line\ndup\nanother"
    out = _row(Q.line_repetition_signals(_docs(spark, [(1, text)])), 1)
    assert out["n_lines"] == 4
    assert out["dup_line_frac"] == pytest.approx(0.5)
    chars = 3 + 11 + 3 + 7
    assert out["dup_line_char_frac"] == pytest.approx(6 / chars)


def test_line_repetition_trims_and_skips_blanks(spark):
    text = "  x \n\n   \nx\ny"
    out = _row(Q.line_repetition_signals(_docs(spark, [(1, text)])), 1)
    assert out["n_lines"] == 3  # "x", "x", "y"
    assert out["dup_line_frac"] == pytest.approx(2 / 3)


def test_line_repetition_empty_doc_present(spark):
    out = Q.line_repetition_signals(_docs(spark, [(1, ""), (2, "a\nb")]))
    rows = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert rows[1]["n_lines"] == 0 and rows[1]["dup_line_frac"] == 0.0
    assert rows[2]["n_lines"] == 2 and rows[2]["dup_line_frac"] == 0.0


# ---------------------------------------------------------------------------
# dedup_paragraphs
# ---------------------------------------------------------------------------


def test_paragraph_dedup_first_occurrence_wins(spark):
    docs = _docs(spark, [
        (1, "alpha\nbeta"),
        (2, "beta\ngamma"),      # beta already in doc 1 ⇒ dropped
        (3, "gamma\nalpha"),     # both seen ⇒ emptied
    ])
    out = {r["doc_id"]: r.asDict() for r in Q.dedup_paragraphs(docs).collect()}
    assert out[1]["text_clean"] == "alpha\nbeta" and out[1]["n_kept"] == 2
    assert out[2]["text_clean"] == "gamma" and out[2]["n_kept"] == 1
    assert out[3]["text_clean"] == "" and out[3]["n_kept"] == 0
    assert out[3]["n_paras"] == 2


def test_paragraph_dedup_within_doc_and_order(spark):
    # repeated paragraph inside one doc keeps only the first; surviving
    # order is the original position order
    docs = _docs(spark, [(7, "z\ny\nz\nx")])
    out = _row(Q.dedup_paragraphs(docs), 7)
    assert out["text_clean"] == "z\ny\nx"
    assert out["n_paras"] == 4 and out["n_kept"] == 3


def test_paragraph_dedup_position_breaks_ties_within_doc(spark):
    # same paragraph at two positions of the same doc: idx orders the win
    docs = _docs(spark, [(1, "p\nq"), (2, "q\np")])
    out = {r["doc_id"]: r.asDict() for r in Q.dedup_paragraphs(docs).collect()}
    assert out[1]["n_kept"] == 2 and out[2]["n_kept"] == 0


# ---------------------------------------------------------------------------
# pseudo-line derivation used by the oracle entries
# ---------------------------------------------------------------------------


def test_word_chunk_lines(spark):
    docs = _docs(spark, [(1, "a b c d e"), (2, "x")])
    out = {r["doc_id"]: r["text"]
           for r in Q.with_word_chunk_lines(docs, 2).collect()}
    assert out[1] == "a b\nc d\ne"
    assert out[2] == "x"


def test_word_chunk_lines_rejects_bad_chunk(spark):
    with pytest.raises(ValueError):
        Q.with_word_chunk_lines(_docs(spark, [(1, "a")]), 0)


# ---------------------------------------------------------------------------
# cross-engine parity on hand-built MULTI-LINE docs (the synthetic corpus
# is single-line; the registry gate can't see these branches)
# ---------------------------------------------------------------------------


def test_gopher_sql_twin_on_multiline(spark, duck):
    rows = [
        (1, "- bullet one\n- bullet two\nthe end with that..."),
        (2, "the plain sentence with enough words to be real and that"),
        (3, ""),
        (4, "# # #\nhash heavy..."),
    ]
    sdf = Q.gopher_quality_flags(_docs(spark, rows)).toPandas()
    duck.sql("CREATE OR REPLACE TEMP TABLE qdocs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO qdocs VALUES (?, ?)", rows)
    ddf = duck.sql(Q.gopher_quality_sql("qdocs")).df()
    sdf = sdf.sort_values("doc_id").reset_index(drop=True)
    ddf = ddf[sdf.columns].sort_values("doc_id").reset_index(drop=True)
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        if a.dtype == float:
            import numpy as np
            assert np.allclose(a, b, equal_nan=True), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


def test_paragraph_dedup_sql_twin_on_multiline(spark, duck):
    rows = [(1, "alpha\nbeta"), (2, "beta\ngamma"), (3, "gamma\nalpha")]
    sdf = Q.dedup_paragraphs(_docs(spark, rows)).toPandas()
    duck.sql("CREATE OR REPLACE TEMP TABLE pdocs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO pdocs VALUES (?, ?)", rows)
    ddf = duck.sql(Q.dedup_paragraphs_sql("pdocs")).df()
    sdf = sdf.sort_values("doc_id").reset_index(drop=True)
    ddf = ddf[sdf.columns].sort_values("doc_id").reset_index(drop=True)
    for c in sdf.columns:
        assert (sdf[c].astype(str) == ddf[c].astype(str)).all(), c


# ---------------------------------------------------------------------------
# product quantization (similarity.pq_*) — structural invariants; the
# cross-engine values are gated by the ann_pq_topk registry entry
# ---------------------------------------------------------------------------


def _embs(spark, sf="/root/testdata/sf0.001"):
    from akumuli_spark.sources.testdata import load_table
    return load_table(spark, sf, "embeddings")


def test_pq_encode_shape_and_range(spark):
    from akumuli_spark.pipeline import similarity as S
    enc = S.pq_encode(_embs(spark), m=8, ks=16).collect()
    assert all(len(r["codes"]) == 8 for r in enc)
    assert all(1 <= c <= 16 for r in enc for c in r["codes"])


def test_pq_topk_precomputed_codes_equal_oneshot(spark):
    from akumuli_spark.pipeline import similarity as S
    embs = _embs(spark)
    cb = S.pq_codebooks(embs, m=8, ks=16)
    codes = S.pq_encode(embs, m=8, ks=16, codebooks=cb).localCheckpoint()
    a = S.pq_topk(embs, [0, 1], k=5).collect()
    b = S.pq_topk(embs, [0, 1], k=5, codebooks=cb, codes=codes).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pq_topk_ranks_monotone_and_self_excluded(spark):
    from akumuli_spark.pipeline import similarity as S
    rows = S.pq_topk(_embs(spark), [3], k=10).collect()
    assert len(rows) == 10
    dists = [r["adc_dist"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert dists == sorted(dists)
    assert all(r["neighbor_id"] != 3 for r in rows)


def test_pq_rejects_indivisible_dim(spark):
    from akumuli_spark.pipeline import similarity as S
    import pytest as _pt
    with _pt.raises(ValueError):
        S.pq_codebooks(_embs(spark), m=7)


def test_pq_adc_zero_for_identical_vector(spark):
    """A candidate whose subvectors quantize to the query's own codes has
    ADC distance = the query's own quantization error; an exact copy of
    the query vector has the SAME codes, so its ADC distance equals the
    query's self-distance — and a copied corpus row must rank first."""
    from akumuli_spark.pipeline import similarity as S
    from pyspark.sql import functions as F
    embs = _embs(spark).limit(50)
    clone = embs.filter(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding",
        *[c for c in embs.columns if c not in ("vec_id", "embedding")],
    )
    aug = embs.unionByName(clone)
    top = S.pq_topk(aug, [7], k=3).collect()
    best = min(top, key=lambda r: r["rank"])
    assert best["neighbor_id"] == 10_007


def test_ivfadc_subset_of_probed_lists(spark):
    """Every IVFADC neighbor must live in one of the query's nprobe
    lists — the probe prunes, ADC only reranks."""
    from akumuli_spark.pipeline import similarity as S
    from pyspark.sql import functions as F
    embs = _embs(spark)
    cents = S._centroids(embs, S.IVF_NLIST)
    assigned = {r["vec_id"]: r["list_id"]
                for r in S._assign_lists(embs, cents).collect()}
    out = S.ivfadc_topk(embs, [2], k=10, nprobe=2).collect()
    probe_lists = {assigned[r["neighbor_id"]] for r in out}
    assert len(probe_lists) <= 2


def test_ivfadc_stored_artifacts_equal_oneshot(spark):
    from akumuli_spark.pipeline import similarity as S
    embs = _embs(spark)
    cents = S._centroids(embs, S.IVF_NLIST).localCheckpoint()
    cb = S.pq_codebooks(embs).localCheckpoint()
    codes = S.pq_encode(embs, codebooks=cb).localCheckpoint()
    a = S.ivfadc_topk(embs, [0, 4], k=5).collect()
    b = S.ivfadc_topk(embs, [0, 4], k=5, centroids=cents,
                      codebooks=cb, codes=codes).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivfadc_acos_bounded(spark):
    """PQ-approximated cosine of real (non-degenerate) vectors stays in
    a sane band — a blown LUT index would produce wild magnitudes."""
    from akumuli_spark.pipeline import similarity as S
    rows = S.ivfadc_topk(_embs(spark), [1], k=10).collect()
    assert len(rows) == 10
    assert all(-2.0 < r["acos"] < 2.0 for r in rows)


# ---------------------------------------------------------------------------
# scrub_duplicated_spans (dedup.py) — removal semantics against the
# coverage operator and a direct set-math reference
# ---------------------------------------------------------------------------


def test_scrub_spans_removes_shared_ngram(spark):
    from akumuli_spark.pipeline import dedup as D
    shared = "one two three four five"
    docs = _docs(spark, [
        (1, f"intro words here {shared} tail words here two"),
        (2, f"{shared} different ending entirely for this doc"),
        (3, "completely unrelated text with no shared spans at all"),
    ])
    out = {r["doc_id"]: r.asDict()
           for r in D.scrub_duplicated_spans(docs, n=5).collect()}
    # the shared 5-gram's 5 positions vanish from both docs
    assert "one two three four five" not in out[1]["text_clean"]
    assert "one two three four five" not in out[2]["text_clean"]
    assert out[1]["text_clean"].startswith("intro words here")
    assert out[2]["text_clean"] == "different ending entirely for this doc"
    assert out[3]["n_kept"] == out[3]["n_tokens"]


def test_scrub_spans_consistent_with_coverage(spark):
    """n_tokens - n_kept must equal coverage's n_cov: the two operators
    share one definition of 'covered position'."""
    from akumuli_spark.pipeline import dedup as D
    from akumuli_spark.sources.testdata import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    cov = {r["doc_id"]: r["n_cov"]
           for r in D.duplicated_span_coverage(docs, n=5).collect()}
    scrub = D.scrub_duplicated_spans(docs, n=5).collect()
    assert len(scrub) == len(cov)
    for r in scrub:
        assert r["n_tokens"] - r["n_kept"] == cov[r["doc_id"]], r["doc_id"]


def test_scrub_spans_fully_duplicated_doc_empties(spark):
    from akumuli_spark.pipeline import dedup as D
    same = "a b c d e f"
    docs = _docs(spark, [(1, same), (2, same)])
    out = {r["doc_id"]: r.asDict()
           for r in D.scrub_duplicated_spans(docs, n=5).collect()}
    for d in (1, 2):
        assert out[d]["n_kept"] == 0 and out[d]["text_clean"] == ""
        assert out[d]["n_tokens"] == 6


def test_scrub_spans_short_docs_untouched(spark):
    from akumuli_spark.pipeline import dedup as D
    docs = _docs(spark, [(1, "tiny doc"), (2, "tiny doc")])
    out = {r["doc_id"]: r.asDict()
           for r in D.scrub_duplicated_spans(docs, n=5).collect()}
    # below n tokens there are no n-grams, hence nothing to remove
    assert out[1]["text_clean"] == "tiny doc" and out[1]["n_kept"] == 2


def test_ivfadc_index_serves_equal_to_inmemory(spark, tmp_path):
    from akumuli_spark.pipeline import similarity as S
    from pyspark.sql import functions as F
    embs = _embs(spark)
    path = str(tmp_path / "idx")
    S.build_ivfadc_index(embs, path)
    queries = embs.filter(F.col("vec_id").isin([0, 3])).select(
        "vec_id", "embedding")
    a = S.ivfadc_topk_from_index(spark, path, queries, k=5).collect()
    b = S.ivfadc_topk(embs, [0, 3], k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivfadc_append_equals_rebuild(spark, tmp_path):
    from akumuli_spark.pipeline import similarity as S
    from pyspark.sql import functions as F
    embs = _embs(spark)
    cents = S._centroids(embs, S.IVF_NLIST).localCheckpoint()
    cb = S.pq_codebooks(embs).localCheckpoint()
    grown = str(tmp_path / "grown")
    fresh = str(tmp_path / "fresh")
    S.build_ivfadc_index(embs.filter(F.col("vec_id") % 3 != 0), grown,
                         centroids=cents, codebooks=cb)
    S.append_ivfadc_index(embs.filter(F.col("vec_id") % 3 == 0), grown)
    S.build_ivfadc_index(embs, fresh, centroids=cents, codebooks=cb)
    # stored code rows are identical...
    ga = sorted(map(tuple, spark.read.parquet(f"{grown}/codes").collect()))
    fa = sorted(map(tuple, spark.read.parquet(f"{fresh}/codes").collect()))
    assert ga == fa
    # ...and so is the served answer
    queries = embs.filter(F.col("vec_id").isin([1, 2])).select(
        "vec_id", "embedding")
    a = S.ivfadc_topk_from_index(spark, grown, queries, k=5).collect()
    b = S.ivfadc_topk_from_index(spark, fresh, queries, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivfadc_index_prunes_partitions(spark, tmp_path):
    """The codes scan must carry PartitionFilters (static pruning), not
    filter a full read."""
    from akumuli_spark.pipeline import similarity as S
    from pyspark.sql import functions as F
    embs = _embs(spark)
    path = str(tmp_path / "idx")
    S.build_ivfadc_index(embs, path)
    queries = embs.filter(F.col("vec_id") == 5).select("vec_id", "embedding")
    df = S.ivfadc_topk_from_index(spark, path, queries, k=5)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*list_id[^\]]*)\]", plan)
    assert m, "no partition filter on list_id reached the codes scan"


def test_ivfadc_empty_index_serves_zero(spark, tmp_path):
    from akumuli_spark.pipeline import similarity as S
    from pyspark.sql import functions as F
    embs = _embs(spark)
    path = str(tmp_path / "idx")
    # build over an empty corpus: directories exist, no data files
    S.build_ivfadc_index(embs.filter(F.lit(False)), path,
                         centroids=S._centroids(embs, 4).localCheckpoint(),
                         codebooks=S.pq_codebooks(embs).localCheckpoint())
    queries = embs.filter(F.col("vec_id") == 1).select("vec_id", "embedding")
    assert S.ivfadc_topk_from_index(spark, path, queries, k=5).count() == 0


def test_pq_encode_vectorized_matches_fold(spark):
    """The numpy kernel and the HOF fold agree exactly away from ties
    (the synthetic corpus has none)."""
    from akumuli_spark.pipeline import similarity as S
    embs = _embs(spark).limit(200)
    a = {r["vec_id"]: list(r["codes"])
         for r in S.pq_encode(embs).collect()}
    b = {r["vec_id"]: list(r["codes"])
         for r in S.pq_encode(embs, vectorized=True).collect()}
    assert a == b


def test_ivfadc_vectorized_build_matches_fold_build(spark, tmp_path):
    """The one-pass numpy build kernel writes the same discrete index
    (list assignments + codes) as the fold path away from ties; the
    stored norm is a continuous value where numpy's pairwise summation
    may differ from the sequential fold in the LAST ULP — compared to
    relative 1e-15, the documented vectorized-path contract."""
    from akumuli_spark.pipeline import similarity as S
    embs = _embs(spark).limit(200)
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    cents = S._centroids(embs, S.IVF_NLIST).localCheckpoint()
    cb = S.pq_codebooks(embs).localCheckpoint()
    S.build_ivfadc_index(embs, a_path, centroids=cents, codebooks=cb)
    S.build_ivfadc_index(embs, b_path, centroids=cents, codebooks=cb,
                         vectorized=True)
    a = {r["vec_id"]: r for r in
         spark.read.parquet(f"{a_path}/codes").collect()}
    b = {r["vec_id"]: r for r in
         spark.read.parquet(f"{b_path}/codes").collect()}
    assert a.keys() == b.keys()
    for vid, ra in a.items():
        rb = b[vid]
        assert (list(ra["codes"]), ra["list_id"]) == \
            (list(rb["codes"]), rb["list_id"]), vid
        assert abs(ra["en"] - rb["en"]) <= 1e-15 * ra["en"], vid


def test_refine_recovers_exact_topk_at_full_shortlist(spark):
    """With R = corpus size the refine step IS exact search: results
    must equal cosine_topk row for row."""
    from akumuli_spark.pipeline import similarity as S
    embs = _embs(spark).limit(80)
    sl = S.pq_topk(embs, [0, 1], k=80)
    a = sorted(map(tuple, S.refine_topk(embs, sl, k=5).collect()))
    b = sorted(map(tuple, S.cosine_topk(embs, [0, 1], k=5).collect()))
    assert a == b


def test_refine_recall_improves_over_adc_rank(spark):
    """On the synthetic corpus the ADC ranking is noisy (documented —
    iid-random embeddings are PQ-adversarial); refining a 10x shortlist
    must recover at least as many exact neighbors as raw ADC@k."""
    from akumuli_spark.pipeline import similarity as S
    embs = _embs(spark)
    qids = [0, 1, 2, 3, 4]
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.cosine_topk(embs, qids, k=10).collect()}
    adc = {(r["query_id"], r["neighbor_id"])
           for r in S.pq_topk(embs, qids, k=10).collect()}
    refined = {(r["query_id"], r["neighbor_id"])
               for r in S.refine_topk(
                   embs, S.pq_topk(embs, qids, k=100), k=10).collect()}
    assert len(refined & exact) >= len(adc & exact)
    assert len(refined & exact) > len(exact) // 2


def test_ivfadc_serve_vectorized_matches_fold(spark, tmp_path):
    """The cogrouped numpy ADC serve returns the same neighbors/ranks as
    the HOF path (same index bytes; acos within last-ulp)."""
    from akumuli_spark.pipeline import similarity as S
    from pyspark.sql import functions as F
    embs = _embs(spark)
    path = str(tmp_path / "idx")
    S.build_ivfadc_index(embs, path)
    queries = embs.filter(F.col("vec_id").isin([0, 2, 9])).select(
        "vec_id", "embedding")
    a = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["acos"])
         for r in S.ivfadc_topk_from_index(spark, path, queries, k=7)
         .collect()}
    b = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["acos"])
         for r in S.ivfadc_topk_from_index(spark, path, queries, k=7,
                                           vectorized=True).collect()}
    assert a.keys() == b.keys()
    for key, (na, ca) in a.items():
        nb, cb = b[key]
        assert na == nb, key
        assert abs(ca - cb) <= 1e-12 * max(abs(ca), 1e-9), key


def test_fuzzy_decontaminate_catches_paraphrase(spark):
    """A light paraphrase (one word changed in a long doc) shares no
    8-gram with the benchmark but IS MinHash-similar — the case the
    fuzzy path exists for."""
    from akumuli_spark.pipeline import dedup as D
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    words = base.split()
    paraphrase = " ".join(words[:3] + ["CHANGED"] + words[4:])
    docs = _docs(spark, [
        (1, paraphrase),
        (2, "totally different content with no relation to anything here "
            "at all in any way shape or form whatsoever truly none"),
    ])
    bench = _docs(spark, [(100, base)])
    # exact 8-gram overlap DOES flag it here (long shared runs), but a
    # change every 7 words would kill all 8-grams; assert the fuzzy
    # flag + jaccard level, and the clean doc's absence
    out = D.fuzzy_decontaminate(docs, bench, n=5, threshold=0.3).collect()
    flagged = {r["doc_id"] for r in out}
    assert flagged == {1}
    assert all(r["bench_id"] == 100 for r in out)


def test_fuzzy_decontaminate_sparse_changes_beat_exact_ngrams(spark):
    """Change every 8th word of a 60-word doc: no 8-gram survives intact
    (exact decontamination goes blind) while the MinHash path still
    flags at jaccard ≈ 0.76 — above the 4×4 banding's ~0.7 collision
    knee, so the candidate join finds it (deterministic md5 hashes:
    this fixed input collides forever, not probabilistically)."""
    from akumuli_spark.pipeline import dedup as D
    words = [f"w{i}" for i in range(60)]
    base = " ".join(words)
    edited = " ".join(
        w if i % 8 != 2 else "X" + w for i, w in enumerate(words)
    )
    docs = _docs(spark, [(1, edited)])
    bench = _docs(spark, [(100, base)])
    exact = D.benchmark_contamination(docs, bench, n=8).collect()
    assert exact == []  # every 8-gram window contains an edit
    fuzzy = D.fuzzy_decontaminate(docs, bench, n=1, threshold=0.3).collect()
    assert {r["doc_id"] for r in fuzzy} == {1}
    assert fuzzy[0]["jaccard"] == pytest.approx(0.7647, abs=1e-3)


def test_fuzzy_decontaminate_stored_signatures_equal_oneshot(spark):
    from akumuli_spark.pipeline import dedup as D
    from akumuli_spark.sources.testdata import load_table
    from pyspark.sql import functions as F
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("doc_id") % 13 != 5)
    bench = docs.filter(F.col("doc_id") % 13 == 5)
    stored = D.minhash_signatures(corpus, n=5).localCheckpoint(eager=True)
    a = D.fuzzy_decontaminate(corpus, bench, n=5, threshold=0.5).collect()
    b = D.fuzzy_decontaminate(corpus, bench, n=5, threshold=0.5,
                              signatures=stored).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivfadc_batch_matches_interactive(spark, tmp_path):
    """The no-driver-collect batch path returns the same neighbors/ranks
    as the interactive vectorized serve for the same query set."""
    from akumuli_spark.pipeline import similarity as S
    from pyspark.sql import functions as F
    embs = _embs(spark)
    path = str(tmp_path / "idx")
    S.build_ivfadc_index(embs, path)
    queries = embs.filter(F.col("vec_id") < 6).select("vec_id", "embedding")
    a = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in S.ivfadc_topk_batch_from_index(spark, path, queries, k=5)
        .collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in S.ivfadc_topk_from_index(spark, path, queries, k=5,
                                          vectorized=True).collect()
    )
    assert a == b


def test_cluster_balanced_sample_covers_every_cluster(spark):
    from akumuli_spark.pipeline import cluster as C
    from akumuli_spark.pipeline import similarity as S
    from akumuli_spark.sources.testdata import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    embs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = C.cluster_balanced_sample(docs, embs, per_cluster=5).collect()
    by_cid = {}
    for r in out:
        by_cid.setdefault(r["cid"], []).append(r)
    # every non-empty cluster contributes, never more than per_cluster
    n_clusters = (
        S._assign_lists(embs, S._centroids(embs, 16))
        .select("list_id").distinct().count()
    )
    assert len(by_cid) == n_clusters
    for cid, rows in by_cid.items():
        assert len(rows) <= 5
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        quals = [r["quality"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert quals == sorted(quals, reverse=True)


def test_cluster_balanced_sample_rejects_bad_quota(spark):
    from akumuli_spark.pipeline import cluster as C
    from akumuli_spark.sources.testdata import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    embs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError):
        C.cluster_balanced_sample(docs, embs, per_cluster=0)


def test_export_roundtrip_manifest(spark, tmp_path):
    """Write JSONL shards + manifest; re-derive the manifest from the
    read-back rows — equality is the end-to-end integrity check (and a
    mutated corpus must break it)."""
    from akumuli_spark.pipeline import cluster as C
    from akumuli_spark.sources.testdata import load_table
    from pyspark.sql import functions as F
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text")
    out = str(tmp_path / "export")
    written = C.export_jsonl_shards(docs, out, n_shards=8)
    stored = spark.read.parquet(f"{out}/_manifest")
    assert sorted(map(tuple, written.collect())) == \
        sorted(map(tuple, stored.collect()))
    back = spark.read.json(f"{out}/data").select("doc_id", "text")
    rederived = C.export_manifest(back, n_shards=8)
    assert sorted(map(tuple, rederived.collect())) == \
        sorted(map(tuple, stored.collect()))
    # a single altered row must break exactly its shard's checksum
    tampered = back.withColumn(
        "text",
        F.when(F.col("doc_id") == 3, F.lit("EVIL")).otherwise(F.col("text")),
    )
    diff = (
        C.export_manifest(tampered, n_shards=8).alias("t")
        .join(stored.alias("s"), "shard")
        .filter(F.col("t.content_sum") != F.col("s.content_sum"))
        .count()
    )
    assert diff == 1


def test_dedup_lines_within_doc_keeps_first_never_crosses_docs(spark):
    docs = _docs(spark, [
        (1, "nav bar\ncontent one\nnav bar\nfooter\nfooter"),
        (2, "nav bar\ncontent two"),  # same line in ANOTHER doc survives
    ])
    out = {r["doc_id"]: r.asDict()
           for r in Q.dedup_lines_within_doc(docs).collect()}
    assert out[1]["text_clean"] == "nav bar\ncontent one\nfooter"
    assert out[1]["n_lines"] == 5 and out[1]["n_kept"] == 3
    assert out[2]["text_clean"] == "nav bar\ncontent two"


def test_dedup_lines_within_doc_trims_and_blanks(spark):
    docs = _docs(spark, [(1, " x \n\nx\n  \ny\nx")])
    out = _row(Q.dedup_lines_within_doc(docs), 1)
    assert out["text_clean"] == "x\ny"
    assert out["n_lines"] == 4 and out["n_kept"] == 2


def test_cluster_keep_best_prefers_quality_over_min_id(spark):
    """Three near-identical docs: the min-id one is padded with repeats
    (low uniq_ratio => low quality), so keep-best must pick a HIGHER id
    than the min-id canonical rule would."""
    from akumuli_spark.pipeline import cluster as C
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [
        (1, base + " " + "pad pad pad pad pad pad pad pad"),
        (2, base + " closing words here"),
        (3, "unrelated totally different text with nothing shared at all"),
    ])
    out = {r["doc_id"]: r.asDict()
           for r in C.dedup_clusters_keep_best(
               docs, n=3, threshold=0.3, max_df=None).collect()}
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == 1
    assert out[2]["keep"] == 1 and out[1]["keep"] == 0
    assert out[3]["keep"] == 1  # singleton keeps itself
    # exactly one keeper per cluster
    keeps = {}
    for r in out.values():
        keeps[r["cluster_id"]] = keeps.get(r["cluster_id"], 0) + r["keep"]
    assert all(v == 1 for v in keeps.values())
