"""Rule-based document quality filters and line/paragraph-level dedup.

The reference engine has no document pipeline (it is a time-series
store); these operators are the training-data-curation side of the
brief, modeled on the published web-corpus filtering stacks:

* ``gopher_quality_flags`` — the Gopher quality heuristics (Rae et al.
  2021, "Scaling Language Models: Methods, Analysis & Insights from
  Training Gopher", Appendix A1.1), the rule set FineWeb / Dolma /
  RedPajama all descend from.
* ``line_repetition_signals`` — the Gopher *repetition* rules at line
  granularity (duplicate-line fraction and duplicate-line character
  fraction); the n-gram-granularity rules live in
  ``text.repetition_signals``.
* ``dedup_paragraphs`` — corpus-wide paragraph-level exact dedup with
  first-occurrence survivorship and document reconstruction (the C4
  "discard duplicated three-sentence spans" idea at paragraph
  granularity, Raffel et al. 2020 §2.2).

Everything is built-in-function Spark SQL (zero Python UDFs); the
line/paragraph operators use explode + two-phase aggregation rather
than within-row quadratic array expressions so per-task cost stays
O(lines) even for pathologically long documents.

Each operator ships a DuckDB twin for the oracle gate.  The synthetic
``documents`` table is single-line prose, so the registry entries run
the line/paragraph operators over deterministically derived pseudo-
lines (fixed-width word chunks, built identically on both engines by
``with_word_chunk_lines`` / ``word_chunk_lines_cte``) — the operators
themselves take any separator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Gopher's "must contain 2 of" stop-word list (Rae et al. 2021 A1.1).
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: leading characters treated as bullets (trimmed-line first char)
BULLET_CHARS = ("•", "‣", "▪", "-", "*")


def _words_expr() -> str:
    # whitespace tokens, empties dropped (leading/trailing/double spaces)
    return "filter(split(text, '\\\\s+'), w -> w <> '')"


def _lines_expr() -> str:
    # trimmed non-empty lines
    return "filter(transform(split(text, chr(10)), l -> trim(l)), l -> l <> '')"


def gopher_quality_flags(docs: DataFrame, *keep: str) -> DataFrame:
    """Per-document Gopher quality signals and the combined pass flag.

    ``keep`` columns of ``docs`` pass through unchanged (same contract
    as ``text._tf_pairs``), so a composed pipeline can gate on the flags
    WITHOUT joining the flag frame back to the corpus — the flags are a
    pure per-row projection, and the join form scans (and re-tokenizes)
    the input once per consumer.

    Signals (rule threshold in brackets — a document *passes* iff every
    rule holds; Rae et al. 2021 Appendix A1.1):

    * ``n_words`` — whitespace tokens [50 ≤ n ≤ 100 000]
    * ``mean_word_len`` — mean token length [3 ≤ m ≤ 10]
    * ``hash_word_ratio`` — '#' occurrences / words [≤ 0.1]
    * ``ellipsis_word_ratio`` — '...' or '…' occurrences / words [≤ 0.1]
    * ``bullet_line_frac`` — lines starting with a bullet [≤ 0.9]
    * ``ellipsis_line_frac`` — lines ending with an ellipsis [≤ 0.3]
    * ``alpha_word_frac`` — words containing ≥1 [A-Za-z] [≥ 0.8]
    * ``n_stop_hits`` — distinct GOPHER_STOPS present as tokens [≥ 2]

    ``passes`` is BIGINT 0/1 (canonical-comparison-friendly).  Line
    fractions over a document with no non-empty lines are 0; a document
    with no words fails (mean undefined ⇒ rule false).

    Scale shape: ONE narrow projection per row — no shuffle, no UDF;
    tokenization happens once through a layered select (same rationale
    as ``text.quality_score``).
    """
    # keep names must not collide with the produced columns: a duplicate
    # output column poisons every downstream reference with an
    # ambiguous-attribute AnalysisException far from this call (only
    # "text" is special-cased — it is consumed, not duplicated)
    reserved = {
        "doc_id", "n_words", "mean_word_len", "hash_word_ratio",
        "ellipsis_word_ratio", "bullet_line_frac", "ellipsis_line_frac",
        "alpha_word_frac", "n_stop_hits", "passes", "__ws", "__ls",
        "__n_hash", "__n_ell", "n_lines",
    }
    bad = sorted(set(keep) & reserved)
    if bad:
        raise ValueError(
            f"gopher_quality_flags keep columns collide with produced "
            f"columns: {bad}"
        )
    extra = [c for c in keep if c != "text"]
    base = docs.select(
        "doc_id",
        F.expr(_words_expr()).alias("__ws"),
        F.expr(_lines_expr()).alias("__ls"),
        F.col("text"),
        *extra,
    ).select(
        "doc_id",
        *keep,
        "__ws",
        "__ls",
        F.size("__ws").cast("long").alias("n_words"),
        F.size("__ls").cast("long").alias("n_lines"),
        # non-overlapping occurrence counts via replace-length deltas
        ((F.length("text") - F.length(F.expr("replace(text, '#', '')"))))
        .cast("long").alias("__n_hash"),
        (
            (F.length("text") - F.length(F.expr("replace(text, '...', '')")))
            / F.lit(3)
            + (F.length("text") - F.length(F.expr("replace(text, '…', '')")))
        ).cast("long").alias("__n_ell"),
    )
    nw = F.col("n_words")
    nwd = F.nullif(nw, F.lit(0)).cast("double")
    nld = F.nullif(F.col("n_lines"), F.lit(0)).cast("double")
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPS)
    sig = base.select(
        "doc_id",
        *keep,
        nw,
        (F.expr("aggregate(__ws, 0L, (a, w) -> a + length(w))") / nwd)
        .alias("mean_word_len"),
        (F.col("__n_hash") / nwd).alias("hash_word_ratio"),
        (F.col("__n_ell") / nwd).alias("ellipsis_word_ratio"),
        F.coalesce(
            F.expr(
                "size(filter(__ls, l -> left(l, 1) IN "
                f"({', '.join(repr(c) for c in BULLET_CHARS)})))"
            ) / nld,
            F.lit(0.0),
        ).alias("bullet_line_frac"),
        F.coalesce(
            F.expr(
                "size(filter(__ls, l -> right(l, 3) = '...' OR right(l, 1) = '…'))"
            ) / nld,
            F.lit(0.0),
        ).alias("ellipsis_line_frac"),
        (F.expr("size(filter(__ws, w -> w rlike '[A-Za-z]'))") / nwd)
        .alias("alpha_word_frac"),
        # distinct stop words present = |stops ∩ lowered tokens|:
        # array_intersect lowercases the token array ONCE (the old
        # filter+array_contains form re-evaluated the transform once
        # per stop word)
        F.expr(
            f"size(array_intersect(array({stops}), "
            "transform(__ws, w -> lower(w))))"
        ).cast("long").alias("n_stop_hits"),
    )
    ok = (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("hash_word_ratio") <= 0.1)
        & (F.col("ellipsis_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_stop_hits") >= 2)
    )
    return sig.withColumn(
        "passes", F.coalesce(ok, F.lit(False)).cast("long")
    )


def gopher_quality_sql(table: str = "documents") -> str:
    """DuckDB twin — identical tokenization, arithmetic, and thresholds,
    so the unrounded flag comparisons agree bit-for-bit (same integer
    operands through the same IEEE divisions)."""
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPS)
    bullets = ", ".join(f"'{c}'" for c in BULLET_CHARS)
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS ls,
         (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
         ((length(text) - length(replace(text, '...', ''))) // 3
          + (length(text) - length(replace(text, '…', ''))))::BIGINT AS n_ell
  FROM {table}
), s AS (
  SELECT doc_id,
         len(ws)::BIGINT AS n_words,
         list_sum(list_transform(ws, w -> length(w)))
           / nullif(len(ws), 0)::DOUBLE AS mean_word_len,
         n_hash / nullif(len(ws), 0)::DOUBLE AS hash_word_ratio,
         n_ell / nullif(len(ws), 0)::DOUBLE AS ellipsis_word_ratio,
         coalesce(len(list_filter(ls, l -> left(l, 1) IN ({bullets})))
           / nullif(len(ls), 0)::DOUBLE, 0.0) AS bullet_line_frac,
         coalesce(len(list_filter(ls,
             l -> right(l, 3) = '...' OR right(l, 1) = '…'))
           / nullif(len(ls), 0)::DOUBLE, 0.0) AS ellipsis_line_frac,
         len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
           / nullif(len(ws), 0)::DOUBLE AS alpha_word_frac,
         len(list_filter([{stops}],
             s -> list_contains(list_transform(ws, w -> lower(w)), s)))::BIGINT
           AS n_stop_hits
  FROM t
)
SELECT *,
       coalesce(n_words BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3 AND 10
                AND hash_word_ratio <= 0.1
                AND ellipsis_word_ratio <= 0.1
                AND bullet_line_frac <= 0.9
                AND ellipsis_line_frac <= 0.3
                AND alpha_word_frac >= 0.8
                AND n_stop_hits >= 2, FALSE)::BIGINT AS passes
FROM s
""".strip()


# ---------------------------------------------------------------------------
# line-level repetition (the Gopher repetition rules at line granularity)
# ---------------------------------------------------------------------------


def line_repetition_signals(docs: DataFrame) -> DataFrame:
    """Per-document duplicate-line fraction and duplicate-line character
    fraction (Rae et al. 2021 A1.1: "fraction of lines that are
    duplicates" counts EVERY occurrence of a repeated line, so two
    identical lines out of four ⇒ 0.5, and the character fraction
    weights each occurrence by its length).

    Output: (doc_id, n_lines, dup_line_frac, dup_line_char_frac); a
    document with no non-empty lines reports 0 lines and 0.0 fractions.

    Scale shape: pure per-row projection — run-length counts over the
    doc's SORTED line array (the shared boundary kernel of
    ``text._tf_pairs``), O(L log L) per document, zero shuffles and no
    join back (the pre-r14 shape exploded to (doc_id, line), paid two
    hash exchanges — per-(doc, md5(line)) then per-doc — and re-joined
    the doc spine).  Grouping is by the literal line, not its md5, so
    the (never-observed) digest-collision merge disappears; every real
    input yields identical counts.
    """
    base = docs.select("doc_id", F.expr(_lines_expr()).alias("__ls"))
    bnd = (
        "CASE WHEN size(__sls) = 0 THEN slice(array(1), 1, 0) "
        "WHEN size(__sls) = 1 THEN array(1) "
        "ELSE concat(array(1), filter(sequence(2, size(__sls)), j -> "
        "element_at(__sls, j) != element_at(__sls, j - 1))) END"
    )
    # per distinct line: its occurrence count and its character length
    runs = (
        "transform(__bnd, (j, i) -> named_struct("
        "'c', CAST(IF(i + 2 > size(__bnd), size(__sls) + 1, "
        "element_at(__bnd, i + 2)) - j AS BIGINT), "
        "'l', CAST(length(element_at(__sls, j)) AS BIGINT)))"
    )
    dup_n = f"aggregate({runs}, 0L, (a, x) -> a + IF(x.c > 1, x.c, 0L))"
    dup_ch = f"aggregate({runs}, 0L, (a, x) -> a + IF(x.c > 1, x.c * x.l, 0L))"
    tot_ch = f"aggregate({runs}, 0L, (a, x) -> a + x.c * x.l)"
    n_lines = F.size("__ls")
    return (
        base.withColumn("__sls", F.expr("array_sort(__ls)"))
        .withColumn("__bnd", F.expr(bnd))
        .select(
            "doc_id",
            n_lines.cast("long").alias("n_lines"),
            F.when(
                n_lines > 0,
                F.expr(dup_n).cast("double") / n_lines.cast("double"),
            ).otherwise(F.lit(0.0)).alias("dup_line_frac"),
            F.coalesce(
                F.expr(dup_ch).cast("double")
                / F.nullif(F.expr(tot_ch), F.lit(0)).cast("double"),
                F.lit(0.0),
            ).alias("dup_line_char_frac"),
        )
    )


def line_repetition_sql(table: str = "documents", prelude: str = "") -> str:
    """``prelude`` is an extra leading CTE (``"d2 AS (...)"``) spliced
    before the twin's own CTE chain — used with
    :func:`word_chunk_lines_cte` to point ``table`` at a derived view."""
    pre = f"{prelude},\n" if prelude else ""
    return f"""
WITH {pre}b AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS ls
  FROM {table}
), e AS (
  SELECT doc_id, md5(l) AS h, length(l)::BIGINT AS c, count(*) AS n
  FROM b, unnest(ls) AS u(l)
  GROUP BY doc_id, md5(l), length(l)
), a AS (
  SELECT doc_id,
         sum(n)::BIGINT AS n_lines,
         coalesce(sum(n) FILTER (WHERE n > 1), 0) / sum(n)::DOUBLE
           AS dup_line_frac,
         coalesce(sum(n * c) FILTER (WHERE n > 1), 0)
           / nullif(sum(n * c), 0)::DOUBLE AS dup_line_char_frac
  FROM e GROUP BY doc_id
)
SELECT b.doc_id,
       coalesce(a.n_lines, 0)::BIGINT AS n_lines,
       coalesce(a.dup_line_frac, 0.0) AS dup_line_frac,
       coalesce(a.dup_line_char_frac, 0.0) AS dup_line_char_frac
FROM b LEFT JOIN a ON b.doc_id = a.doc_id
""".strip()


# ---------------------------------------------------------------------------
# corpus-wide paragraph dedup with first-occurrence survivorship
# ---------------------------------------------------------------------------


def dedup_paragraphs(docs: DataFrame) -> DataFrame:
    """Remove every paragraph that already occurred earlier in the
    corpus (global first-occurrence keep, ordered by (doc_id, position))
    and reconstruct each document from its surviving paragraphs — the
    C4 span-dedup idea (Raffel et al. 2020 §2.2) at paragraph
    granularity, where a "paragraph" is a trimmed non-empty
    newline-separated segment.

    Output: (doc_id, n_paras, n_kept, text_clean) — every input doc is
    present; a document whose every paragraph occurred earlier keeps
    ``n_kept = 0`` and ``text_clean = ''`` (flag-and-filter downstream,
    same survivorship contract as ``dedup.exact_duplicates``).

    Scale shape: posexplode → ONE shuffle on md5(paragraph) for the
    first-occurrence window (digest key, not the paragraph text) → one
    shuffle back on doc_id for the ordered reconstruction.  No driver
    state, no UDFs; min-over-window instead of row_number would also
    work but row_number keeps the "first occurrence" rule readable.
    """
    paras = docs.select(
        "doc_id",
        F.expr(_lines_expr()).alias("__ps"),
    )
    exploded = paras.select(
        "doc_id",
        F.size("__ps").cast("long").alias("n_paras"),
        F.posexplode("__ps").alias("idx", "para"),
    ).withColumn("__h", F.md5("para"))
    w = Window.partitionBy("__h").orderBy("doc_id", "idx")
    kept = (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(idx, para))), "
                       "s -> s.para)"),
                "\n",
            ).alias("text_clean"),
        )
    )
    return (
        paras.select("doc_id", F.size("__ps").cast("long").alias("n_paras"))
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_paras",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def dedup_paragraphs_sql(table: str = "documents", prelude: str = "") -> str:
    """Same ``prelude`` contract as :func:`line_repetition_sql`."""
    pre = f"{prelude},\n" if prelude else ""
    return f"""
WITH {pre}b AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS ps
  FROM {table}
), e AS (
  SELECT doc_id, len(ps)::BIGINT AS n_paras, u.idx - 1 AS idx, u.para
  FROM b, unnest(list_transform(range(1, len(ps) + 1),
                                i -> {{'idx': i, 'para': ps[i]}})) AS t(u)
), k AS (
  SELECT doc_id, idx, para,
         row_number() OVER (PARTITION BY md5(para)
                            ORDER BY doc_id, idx) AS rn
  FROM e
), r AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(para, chr(10) ORDER BY idx) AS text_clean
  FROM k WHERE rn = 1 GROUP BY doc_id
)
SELECT b.doc_id, len(b.ps)::BIGINT AS n_paras,
       coalesce(r.n_kept, 0)::BIGINT AS n_kept,
       coalesce(r.text_clean, '') AS text_clean
FROM b LEFT JOIN r ON b.doc_id = r.doc_id
""".strip()


# ---------------------------------------------------------------------------
# pseudo-line derivation (both engines, byte-identical) for the oracle
# entries: the synthetic corpus is single-line, so chunk its words into
# fixed-width "lines" to exercise the line/paragraph rules non-trivially
# ---------------------------------------------------------------------------


def with_word_chunk_lines(docs: DataFrame, chunk: int) -> DataFrame:
    """Rewrite ``text`` to newline-joined groups of ``chunk`` words —
    deterministic scaffolding for line-granularity oracle entries."""
    c = int(chunk)
    if c <= 0:
        raise ValueError("chunk must be positive")
    # split once through a layered projection: inlining split(text) into
    # the transform would re-tokenize the row once per CHUNK (O(words²)
    # per doc — measured 3.0 → sub-second dedup_paragraphs at sf0.1)
    cols = [col for col in docs.columns if col != "text"]
    return docs.select(
        *cols, F.split(F.col("text"), " ").alias("__wcl_ws")
    ).select(
        *cols,
        F.expr(
            "array_join(transform("
            f"  sequence(0, (size(__wcl_ws) + {c} - 1) div {c} - 1),"
            f"  i -> array_join(slice(__wcl_ws, i * {c} + 1, {c}), ' ')"
            "), chr(10))"
        ).alias("text"),
    )


def word_chunk_lines_cte(chunk: int, table: str = "documents") -> str:
    """DuckDB CTE body producing the identical rewritten table; splice as
    ``WITH d2 AS ({this}) ...`` and point the twin's ``table`` at d2."""
    c = int(chunk)
    return (
        f"SELECT * REPLACE (array_to_string(list_transform("
        f"range(0, cast((len(string_split(text, ' ')) + {c} - 1) // {c} AS INT)), "
        f"i -> array_to_string(string_split(text, ' ')[(i * {c} + 1):(i * {c} + {c})], ' ')"
        f"), chr(10)) AS text) FROM {table}"
    )


def dedup_lines_within_doc(docs: DataFrame) -> DataFrame:
    """WITHIN-document line dedup: keep the first occurrence of each
    repeated line inside a document and rebuild the text — the
    boilerplate-stripping pass (nav bars, repeated footers) web-corpus
    stacks run per document (Dolma's in-document line dedup), the
    removal complement of :func:`line_repetition_signals`.

    Corpus-global first-occurrence semantics live in
    :func:`dedup_paragraphs`; this one never crosses documents, so it
    needs NO shuffle at all — the dedup is a per-row higher-order
    filter over the line array (a line survives iff no EARLIER index
    holds the same trimmed line).  Per-row cost is O(lines²) string
    compares, bounded by document size; documents are the unit of
    parallelism and nothing leaves the scan.

    Output: (doc_id, n_lines, n_kept, text_clean); blank lines are
    dropped like every line-granularity operator here.
    """
    base = docs.select("doc_id", F.expr(_lines_expr()).alias("__ls"))
    # "no earlier index holds the same line" ⇔ "my first occurrence is
    # me": array_position returns the FIRST 1-based index, scanning the
    # array in place — the slice()+array_contains form allocated an
    # i-element array copy per element (O(lines²) allocations, not just
    # compares).  Same survivors in the same order.
    kept = F.expr(
        "filter(__ls, (l, i) -> array_position(__ls, l) = i + 1)"
    )
    return base.select(
        "doc_id",
        F.size("__ls").cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, "\n").alias("text_clean"),
    )


def dedup_lines_within_doc_sql(table: str = "documents",
                               prelude: str = "") -> str:
    """Same ``prelude`` contract as :func:`line_repetition_sql`."""
    pre = f"{prelude},\n" if prelude else ""
    return f"""
WITH {pre}b AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS ls
  FROM {table}
)
SELECT doc_id,
       len(ls)::BIGINT AS n_lines,
       len(list_filter(ls, (l, i) -> i = 1
             OR NOT list_contains(ls[1:i-1], l)))::BIGINT AS n_kept,
       array_to_string(list_filter(ls, (l, i) -> i = 1
             OR NOT list_contains(ls[1:i-1], l)), chr(10)) AS text_clean
FROM b
""".strip()
