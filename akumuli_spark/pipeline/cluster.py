"""Near-duplicate clustering and deterministic corpus sampling.

Pair lists (from :mod:`akumuli_spark.pipeline.dedup`) are only half of a
dedup pipeline: the end goal is "keep ONE document per duplicate group".
That requires grouping the pairs into connected components — two documents
that never compared directly (A~B, B~C) must still land in one group so
that exactly one of {A, B, C} survives.

Scale design: components are computed with iterative min-label
propagation plus pointer-jumping (the two-phase scheme of the MapReduce
connected-components literature, e.g. Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14).  Each round is two
distributed hash joins on (node id) — no global structures, no driver
state beyond the loop counter; convergence needs O(log(diameter)) rounds
and near-dup graphs have tiny diameters (clusters are quasi-cliques), so
in practice 2–3 rounds.  Each round materializes an O(|nodes|)
two-column frame via localCheckpoint (eager, GC-released), which also
truncates the iterative lineage.

Determinism: the component label is the minimum document id of the
component, so results are engine-independent and DuckDB can replay them
with a recursive CTE (see :func:`dedup_clusters_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from akumuli_spark.grouped import grouped_map_batched
from akumuli_spark.pipeline import dedup as _dedup


def connected_components(nodes: DataFrame, pairs: DataFrame,
                         max_iter: int = 25) -> DataFrame:
    """Connected components of the undirected graph (nodes, pairs).

    ``nodes``: one column ``id``; ``pairs``: columns ``doc_a``/``doc_b``.
    Returns (id, comp) where comp is the minimum id in the component.
    Isolated nodes get comp = id.

    The iterative loop runs over EDGE-TOUCHED nodes only (see
    :func:`_components_of_pairs`): a node with no edge can never change
    its label, so dragging the whole corpus through every round's joins
    — the pre-r14 shape — did per-round work proportional to |corpus|
    instead of |near-dup set|.  Isolated nodes are re-attached afterward
    with one broadcast-sized left join (loop labels are O(duplicates)).
    """
    labels = _components_of_pairs(pairs, max_iter=max_iter)
    # F.broadcast pins the O(duplicates) label frame as the build side:
    # the checkpointed loop output carries no size statistics, so the
    # static plan would otherwise SortMergeJoin — shuffling the corpus —
    # and only AQE's runtime stats would rescue it (guide §3.1).
    return nodes.join(
        F.broadcast(labels.withColumnRenamed("comp", "__comp")), "id", "left"
    ).select("id", F.coalesce("__comp", F.col("id")).alias("comp"))


def _components_of_pairs(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Min-label components over just the nodes that appear in ``pairs``
    — the frame every round's joins actually operate on.

    Iterative (driver loop) — inherent to transitive closure; every
    per-round step is a distributed join and the materialized state is
    two BIGINT columns per edge-touched node (O(near-duplicates), NOT
    O(corpus)).  ONE job per round: the checkpoints are lazy
    (``eager=False``), so the round's convergence ``count()`` is the
    action that materializes the checkpointed frame — the changed-label
    count rides along with the propagate+jump job instead of running as
    a second full job over the round's output (at 100 TB every extra
    action is a full cluster job).
    """
    # symmetrize by exploding both orientations of each pair in ONE pass:
    # the union-of-two-projections form executed the whole pair-generator
    # subtree (for semantic_clusters, the within-cluster cosine self-join)
    # once per branch inside the checkpoint's materializing job
    edges = pairs.select(
        F.explode(F.array(
            F.struct(F.col("doc_a").alias("s"), F.col("doc_b").alias("d")),
            F.struct(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")),
        )).alias("__e")
    ).select("__e.s", "__e.d").localCheckpoint(eager=False)

    # the symmetric union means selecting one endpoint column covers both
    labels = edges.select(F.col("s").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    ).localCheckpoint(eager=False)

    for _ in range(max_iter):
        # propagate: candidate label = min over neighbours' labels
        nbr = (
            edges.join(labels, edges["s"] == labels["id"])
            .groupBy(F.col("d").alias("id2"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        step = (
            labels.join(nbr, labels["id"] == nbr["id2"], "left")
            .select(
                "id",
                "comp",
                F.least("comp", F.coalesce("nbr_comp", "comp")).alias("new_comp"),
            )
        )
        # pointer-jumping: follow the label one hop (comp := comp's comp);
        # labels are node ids, so the hop is a self-join on the same frame.
        l2 = step.select(F.col("id").alias("jid"), F.col("new_comp").alias("jcomp"))
        step = (
            step.join(l2, step["new_comp"] == l2["jid"], "left")
            .select(
                "id",
                "comp",
                F.least("new_comp", F.coalesce("jcomp", "new_comp")).alias("next_comp"),
            )
            .localCheckpoint(eager=False)
        )
        # this count is the round's ONLY action: it materializes the lazy
        # checkpoint (truncating the iterative lineage) and reads the
        # convergence signal from the same job
        n_changed = step.filter(F.col("next_comp") < F.col("comp")).count()
        labels = step.select("id", F.col("next_comp").alias("comp"))
        if n_changed == 0:
            return labels
    raise RuntimeError(f"_components_of_pairs: no fixpoint after {max_iter} rounds")


def dedup_clusters(docs: DataFrame, n: int = 5, threshold: float = 0.5,
                   max_df: int | None = 64) -> DataFrame:
    """Duplicate clusters over the corpus: (doc_id, cluster_id, is_canonical).

    Pairs come from word-n-gram Jaccard (same audited semantics as the
    ``dedup_ngram_jaccard`` registry entry, skew guard included); the
    canonical survivor of each cluster is its minimum doc_id.  Filtering
    the corpus to ``is_canonical`` is the complete dedup operation.
    """
    pairs = _dedup.ngram_jaccard_pairs(docs, n=n, threshold=threshold,
                                       max_df=max_df)
    nodes = docs.select(F.col("doc_id").alias("id"))
    comp = connected_components(nodes, pairs)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("comp") == F.col("id")).alias("is_canonical"),
    )


def dedup_clusters_sql(n: int = 5, threshold: float = 0.5,
                       max_df: int | None = 64) -> str:
    """DuckDB twin of :func:`dedup_clusters` (recursive-CTE closure).

    Labels propagate only downward (``r.comp < e.d``): the component
    minimum reaches every member through monotonically pruned paths, and
    the prune bounds the closure frontier.
    """
    pairs_sql = _dedup.ngram_jaccard_sql(n=n, threshold=threshold, max_df=max_df)
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
reach(id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id
  WHERE r.comp < e.d
)
SELECT id AS doc_id, min(comp) AS cluster_id, min(comp) = id AS is_canonical
FROM reach GROUP BY id
""".strip()


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      stratum_col: str = "lang", id_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample of a corpus.

    Training mixes need reproducible sampling ("50% of en, 25% of de"):
    each row's inclusion is decided by a uniform hash of its id —
    u = md5(id)[:8] / 2^32 — kept iff u < rate(stratum).  No RNG state,
    no shuffle (a pure filter over the scan, predicate-pushdown
    friendly), identical output on any engine / any partitioning / any
    re-run, and a rate increase strictly grows the previous sample
    (nested samples, the property reservoir sampling cannot give).

    Output: (doc_id, stratum, sample_key) for the kept rows.
    """
    rate_expr = F.lit(float(default_rate))
    for k in sorted(rates):  # deterministic plan
        rate_expr = F.when(F.col(stratum_col) == k, F.lit(float(rates[k]))).otherwise(rate_expr)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") / F.lit(4294967296.0)
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            u.alias("sample_key"),
            rate_expr.alias("__rate"),
        )
        .filter(F.col("sample_key") < F.col("__rate"))
        .drop("__rate")
    )


def deterministic_shuffle(docs: DataFrame, seed: str = "s0",
                          n_shards: int = 16,
                          id_col: str = "doc_id") -> DataFrame:
    """Reproducible global shuffle + shard assignment for training-data
    export.

    Training runs need the corpus in a *fixed pseudo-random order* that
    any re-run (and any engine) reproduces: order by
    ``md5(seed || ':' || id)``, sharded by the key's top 32 bits so
    every shard is an independent, internally-ordered output stream.
    Changing ``seed`` reshuffles; changing ``n_shards`` re-buckets but
    keeps the same global key order.

    Output: (doc_id, shard, pos) — ``pos`` is the 1-based position
    within the shard.

    Scale shape: one hash-partition shuffle on ``shard`` plus a per-shard
    sort (the window below partitions by shard, so no global ordering
    bottleneck — each of the ``n_shards`` streams sorts independently,
    exactly the layout a sharded training-data writer wants).  Size
    ``n_shards`` to the cluster: ≥ executor count, and small enough that
    a shard fits a task's spill budget.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(seed), F.lit(":"),
                         F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint")
        % F.lit(int(n_shards))
    )
    w = Window.partitionBy("shard").orderBy("__key")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            key.alias("__key"),
            shard.alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


def deterministic_shuffle_sql(seed: str = "s0", n_shards: int = 16) -> str:
    """DuckDB twin of :func:`deterministic_shuffle` —
    ``('0x' || hex)::BIGINT`` replays Spark's ``conv(hex, 16, 10)``."""
    return f"""
WITH keyed AS (
  SELECT doc_id,
         md5('{seed}:' || doc_id::VARCHAR) AS __key,
         ('0x' || substr(md5('{seed}:' || doc_id::VARCHAR), 1, 8))::BIGINT
           % {int(n_shards)} AS shard
  FROM documents
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY __key) AS pos
FROM keyed
""".strip()


def _shard_expr(id_col: str, n_shards: int):
    """Deterministic, engine-portable shard of a document id: the top 32
    bits of md5(id) mod n_shards — the same hash family as
    :func:`stratified_sample`, so DuckDB replays it exactly (Spark's
    ``F.hash`` is murmur3, which DuckDB cannot reproduce)."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % F.lit(int(n_shards))
    )


#: per-stream straggler guard for pack_sequences' AUTO mode: one pandas
#: task packing more rows than this is the measured straggler
#: (tools/scale_smoke.py pack: a 4.5 M-row stratum at n_shards=1 vs 32)
AUTO_SHARD_ROWS = 1_000_000
#: rows per task the AUTO mode aims for once it shards
AUTO_SHARD_TARGET = 250_000


def pack_sequences(docs: DataFrame, budget: int = 256,
                   stratum_col: str = "lang", id_col: str = "doc_id",
                   text_col: str = "text",
                   n_shards: int | None = None) -> DataFrame:
    """Next-fit sequence packing: assign documents to fixed-token-budget
    packs (training micro-batches / context windows), per (stratum, shard).

    Documents are taken in ``id_col`` order within each pack stream; a doc
    that would overflow the running pack opens the next one (next-fit —
    one pass, deterministic, no bin search).  Packing is inherently
    sequential *within* a pack stream, so the recursion runs per stream
    via ``applyInPandas``.

    The pack stream is (stratum, shard), shard = md5(id) mod ``n_shards``
    — the shard key is first-class because stratum alone is a skew trap:
    on a real corpus the language distribution is heavily skewed (en ≫
    rest), and one pandas task packing the entire ``en`` stratum is the
    classic straggler/OOM at 100 TB.  ``n_shards`` bounds the per-task
    work unit at ~|stratum|/n_shards rows regardless of skew; real
    pipelines pack per shard/stream for the same reason.  Packing quality
    is unaffected (each stream is still next-fit over id order); only the
    grouping of documents into streams changes, deterministically.

    ``n_shards=None`` (default) is AUTO: one eager per-stratum count
    probes the largest stratum; at or below :data:`AUTO_SHARD_ROWS` the
    single-stream shape is used (identical to ``n_shards=1``), above it
    the shard count is the power of two that bounds per-task work at
    ~:data:`AUTO_SHARD_TARGET` rows — so the straggler can't bite a
    naive caller (VERDICT r8 wrong #4).  Deterministic for a given
    corpus; pass an explicit ``n_shards`` for a size-independent layout
    (the oracle twins pin it explicitly).

    Output: (doc_id, stratum, shard, n_tokens, pack_id); pack_id counts
    from 0 within each (stratum, shard).  Tokens = whitespace tokens.
    """
    if n_shards is None:
        top = (
            docs.groupBy(stratum_col).count()
            .agg(F.max("count")).collect()[0][0]
        ) or 0
        if top <= AUTO_SHARD_ROWS:
            n_shards = 1
        else:
            import math

            n_shards = 1 << math.ceil(
                math.log2(top / AUTO_SHARD_TARGET)
            )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        _shard_expr(id_col, n_shards).alias("shard"),
        # coalesce: NULL text packs as a zero-token doc instead of
        # feeding NaN into the per-shard running sum (dirty rows are
        # routine; the SQL twin sees no NULLs on the audited corpus)
        F.expr(f"coalesce(size(split({text_col}, ' ')), 0)")
        .cast("long").alias("n_tokens"),
    )

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        ids, running, pid = [], 0, 0
        for t in pdf["n_tokens"]:
            if running and running + t > budget:
                pid += 1
                running = 0
            running += int(t)
            ids.append(pid)
        pdf["pack_id"] = ids
        return pdf

    # batched grouped map (guide §4.5): same next-fit kernel per
    # (stratum, shard) stream, one Python round per shuffle partition
    # instead of per stream, no group-delimiting JVM sort (the kernel
    # orders by doc_id itself)
    return grouped_map_batched(
        toks, ["stratum", "shard"], pack,
        "doc_id long, stratum string, shard long, n_tokens long, "
        "pack_id long",
        ["doc_id", "stratum", "shard", "n_tokens", "pack_id"],
    )


def pack_sequences_sql(budget: int = 256, stratum_col: str = "lang",
                       id_col: str = "doc_id", text_col: str = "text",
                       n_shards: int = 1) -> str:
    """DuckDB twin of :func:`pack_sequences` (per-(stratum, shard)
    recursive CTE carrying (pack_id, running) state; the shard hash is
    the same md5-top-32-bits family both engines compute)."""
    return f"""
WITH RECURSIVE base AS MATERIALIZED (
  SELECT {id_col} AS doc_id, {stratum_col} AS stratum,
         (('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT
          % {int(n_shards)}) AS shard,
         CAST(len(string_split({text_col}, ' ')) AS BIGINT) AS n_tokens,
         CAST(row_number() OVER (PARTITION BY {stratum_col},
                 (('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT
                  % {int(n_shards)})
                                 ORDER BY {id_col}) AS BIGINT) AS rn
  FROM documents
),
rec AS (
  SELECT stratum, shard, doc_id, rn, n_tokens,
         CAST(0 AS BIGINT) AS pack_id, n_tokens AS running
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.stratum, b.shard, b.doc_id, b.rn, b.n_tokens,
         CASE WHEN r.running + b.n_tokens > {budget}
              THEN r.pack_id + 1 ELSE r.pack_id END,
         CASE WHEN r.running + b.n_tokens > {budget}
              THEN b.n_tokens ELSE r.running + b.n_tokens END
  FROM rec r JOIN base b
    ON b.stratum = r.stratum AND b.shard = r.shard AND b.rn = r.rn + 1
)
SELECT doc_id, stratum, shard, n_tokens, pack_id FROM rec
""".strip()


def stratified_sample_sql(rates: dict[str, float], stratum_col: str = "lang",
                          id_col: str = "doc_id",
                          default_rate: float = 0.0) -> str:
    """DuckDB twin of :func:`stratified_sample`."""
    branches = " ".join(
        f"WHEN {stratum_col} = '{k}' THEN {float(rates[k])!r}"
        for k in sorted(rates)
    )
    return f"""
SELECT doc_id, stratum, sample_key FROM (
  SELECT {id_col} AS doc_id, {stratum_col} AS stratum,
         (('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT
          / 4294967296.0) AS sample_key,
         CASE {branches} ELSE {float(default_rate)!r} END AS rate
  FROM documents
) WHERE sample_key < rate
""".strip()


def quota_sample(docs: DataFrame, quotas: dict[str, int],
                 stratum_col: str = "lang",
                 n_salts: int = 32) -> DataFrame:
    """Budgeted per-stratum curation: keep the ``quotas[stratum]`` BEST
    documents of each stratum, ranked by the corpus quality heuristic —
    the "take the top N per language" selection rule of mixture-budgeted
    training runs (rank-and-cut, vs :func:`stratified_sample`'s
    rate-based Bernoulli).

    Ranking: quality desc, doc_id asc — the tie order is deterministic
    and the quality blend evaluates in the same IEEE op order on both
    engines, so the cut boundary is engine-stable.

    Output: (doc_id, stratum, quality, rank), rank 1-based within the
    stratum, only rows inside the quota.  Strata without a quota entry
    are dropped.

    Scale shape: a naive ``row_number() over (partition by stratum)``
    funnels each stratum through ONE task — the biggest stratum is the
    whole corpus in the worst case.  Two-phase instead: phase 1 ranks
    inside (stratum, salt) sub-partitions (salt = md5(doc_id) mod
    ``n_salts``, the engine-portable hash family) and keeps at most
    ``quota`` rows per sub-partition, which is correct because a row
    outside its salt's top-quota is outrank-dominated by quota rows in
    ANY merged order; phase 2 re-ranks the ≤ n_salts·quota survivors
    per stratum.  Per-task work is bounded by max(stratum/n_salts,
    n_salts·quota) rows — size ``n_salts`` ~ cluster parallelism.  The
    two phases reuse one hash partitioning family, and the result is
    provably identical to the single-window form (the DuckDB twin IS
    the single-window form).
    """
    from akumuli_spark.pipeline.text import quality_score

    from pyspark.sql import Window

    if not quotas:
        raise ValueError("quotas must name at least one stratum")
    quota_expr = F.lit(None).cast("int")
    for k in sorted(quotas, reverse=True):
        quota_expr = F.when(
            F.col("stratum") == k, F.lit(int(quotas[k]))
        ).otherwise(quota_expr)
    scored = quality_score(docs, carry=(stratum_col,)).select(
        "doc_id", F.col(stratum_col).alias("stratum"), "quality"
    ).withColumn("__quota", quota_expr).filter(F.col("__quota").isNotNull())
    salt = _shard_expr("doc_id", n_salts)
    w1 = Window.partitionBy("stratum", "__salt").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    survivors = (
        scored.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= F.col("__quota"))
    )
    w2 = Window.partitionBy("stratum").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= F.col("__quota"))
        .select("doc_id", "stratum", "quality", "rank")
    )


def quota_sample_sql(quotas: dict[str, int], stratum_col: str = "lang") -> str:
    """DuckDB twin of :func:`quota_sample` — the single-window form the
    two-phase plan is provably equal to."""
    from akumuli_spark.pipeline.text import quality_score_sql

    branches = " ".join(
        f"WHEN stratum = '{k}' THEN {int(quotas[k])}"
        for k in sorted(quotas)
    )
    return f"""
WITH __q AS (
  SELECT q.doc_id, d.{stratum_col} AS stratum, q.quality
  FROM ({quality_score_sql()}) q JOIN documents d ON q.doc_id = d.doc_id
),
__ranked AS (
  SELECT doc_id, stratum, quality,
         row_number() OVER (
           PARTITION BY stratum ORDER BY quality DESC, doc_id ASC
         ) AS rank,
         CASE {branches} ELSE NULL END AS quota
  FROM __q
)
SELECT doc_id, stratum, quality, rank::BIGINT AS rank
FROM __ranked WHERE quota IS NOT NULL AND rank <= quota
""".strip()


def mixture_plan(docs: DataFrame, weights: dict[str, float],
                 budget_tokens: int,
                 stratum_col: str = "lang") -> DataFrame:
    """Training-mixture planning: turn target mixture weights + a token
    budget into per-stratum sampling rates — the static sizing step in
    front of :func:`stratified_sample` (rates) or :func:`quota_sample`
    (counts) when assembling a training mix ("30% en, 20% code, ...").

    Per stratum named in ``weights``:

    * ``avail_tokens`` — whitespace tokens available in the corpus;
    * ``target_tokens`` — budget · weight / Σweights;
    * ``rate`` — min(1, target/avail): the Bernoulli rate that hits the
      target in expectation (feed straight into ``stratified_sample``);
    * ``epochs`` — target/avail uncapped: >1 means the stratum must be
      UPSAMPLED (repeated ~epochs times) to meet its weight, the
      standard under-resourced-language case.

    Scale shape: one low-cardinality hash agg over a single scan (the
    tokenizing projection is per-row, map-side partials collapse the
    shuffle to |strata|×partitions rows); the plan math is a projection
    over |weights| rows.
    """
    if not weights or budget_tokens <= 0:
        raise ValueError("weights must be non-empty and budget positive")
    total_w = float(sum(weights.values()))
    target = F.lit(None).cast("double")
    for k in sorted(weights, reverse=True):
        target = F.when(
            F.col("stratum") == k,
            F.lit(float(budget_tokens) * float(weights[k]) / total_w),
        ).otherwise(target)
    agg = (
        docs.select(
            F.col(stratum_col).alias("stratum"),
            F.expr("size(split(text, ' '))").cast("long").alias("__t"),
        )
        .groupBy("stratum")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__t").cast("long").alias("avail_tokens"),
        )
    )
    return (
        agg.withColumn("target_tokens", target)
        .filter(F.col("target_tokens").isNotNull())
        .withColumn(
            "epochs", F.col("target_tokens") / F.col("avail_tokens")
        )
        .withColumn("rate", F.least(F.lit(1.0), F.col("epochs")))
        .select("stratum", "n_docs", "avail_tokens", "target_tokens",
                "rate", "epochs")
    )


def mixture_plan_sql(weights: dict[str, float], budget_tokens: int,
                     stratum_col: str = "lang") -> str:
    """DuckDB twin of :func:`mixture_plan`."""
    total_w = float(sum(weights.values()))
    branches = " ".join(
        f"WHEN stratum = '{k}' THEN "
        f"{float(budget_tokens) * float(weights[k]) / total_w!r}::DOUBLE"
        for k in sorted(weights)
    )
    return f"""
WITH __agg AS (
  SELECT {stratum_col} AS stratum, count(*)::BIGINT AS n_docs,
         sum(len(string_split(text, ' ')))::BIGINT AS avail_tokens
  FROM documents GROUP BY 1
),
__t AS (
  SELECT *, CASE {branches} ELSE NULL::DOUBLE END AS target_tokens FROM __agg
)
SELECT stratum, n_docs, avail_tokens, target_tokens,
       least(1.0::DOUBLE, target_tokens / avail_tokens) AS rate,
       target_tokens / avail_tokens AS epochs
FROM __t WHERE target_tokens IS NOT NULL
""".strip()


def semantic_clusters(embs: DataFrame, nlist: int = 16,
                      threshold: float = 0.4) -> DataFrame:
    """SemDeDup with the paper's exact keep rule: connected components
    over the within-cluster near-dup pairs, ONE canonical survivor per
    near-dup SET (minimum vec_id).  The flat prune flag
    (``dedup.semantic_dedup``) can over-prune a chain A~B~C where only
    adjacent pairs clear the threshold; the transitive form keeps A and
    prunes exactly {B, C}.

    Output: (vec_id, cluster_id, is_canonical) over the full corpus —
    filtering to ``is_canonical`` IS the dedup.  Same pointer-jumping
    component scheme (and scale argument) as :func:`dedup_clusters`.
    """
    pairs = _dedup.semantic_near_dup_pairs(
        embs, nlist=nlist, threshold=threshold
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    nodes = embs.select(F.col("vec_id").alias("id"))
    comp = connected_components(nodes, pairs)
    return comp.select(
        F.col("id").alias("vec_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("comp") == F.col("id")).alias("is_canonical"),
    )


def semantic_clusters_sql(nlist: int = 16, threshold: float = 0.4) -> str:
    """DuckDB twin of :func:`semantic_clusters` — the recursive-CTE
    closure over the semantic pair list (same downward-propagation prune
    as :func:`dedup_clusters_sql`)."""
    pairs_sql = _dedup.semantic_pairs_sql(nlist=nlist, threshold=threshold)
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(id, comp) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id
  WHERE r.comp < e.d
)
SELECT id AS vec_id, min(comp) AS cluster_id, min(comp) = id AS is_canonical
FROM reach GROUP BY id
""".strip()


def materialize_packs(docs: DataFrame, packed: DataFrame,
                      sep: str = " <eod> ",
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Turn :func:`pack_sequences` assignments into actual training
    rows: one row per (stratum, shard, pack_id) with the member texts
    concatenated in ``id_col`` order, separated by ``sep`` — the final
    export step before tokenized shards.

    Output: (stratum, shard, pack_id, n_docs, n_tokens, text).

    Scale shape: one equi-join on the doc id (assignment table back to
    text) then one agg per pack; the in-group ordered concat runs on
    collected structs bounded by the pack's token budget — the same
    per-group bound packing guarantees by construction.
    """
    if not text_col.isidentifier():
        raise ValueError(f"text_col must be a plain identifier: {text_col!r}")
    joined = packed.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        "doc_id",
    )
    # sep is interpolated into a single-quoted Spark SQL literal:
    # escape backslashes and quotes so separators like "' <eod> '" or
    # "\n" survive verbatim instead of breaking the expression.
    sep_lit = sep.replace("\\", "\\\\").replace("'", "\\'")
    ordered = F.expr(
        f"array_join(transform(array_sort(collect_list("
        f"struct(doc_id, {text_col}))), x -> x.{text_col}), '{sep_lit}')"
    )
    return joined.groupBy("stratum", "shard", "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        ordered.alias("text"),
    )


def materialize_packs_sql(pack_sql: str, sep: str = " <eod> ") -> str:
    """DuckDB twin; ``pack_sql`` is the full pack_sequences_sql query
    (wrapped as a subquery and joined back to documents)."""
    sep = sep.replace("'", "''")
    return f"""
SELECT p.stratum, p.shard, p.pack_id,
       count(*) AS n_docs, sum(p.n_tokens) AS n_tokens,
       string_agg(d.text, '{sep}' ORDER BY p.doc_id) AS text
FROM (
{pack_sql}
) p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY p.stratum, p.shard, p.pack_id
""".strip()


def cluster_balanced_sample(docs: DataFrame, embs: DataFrame,
                            per_cluster: int = 10, nlist: int = 16,
                            centroids: DataFrame | None = None,
                            n_salts: int = 32) -> DataFrame:
    """Diversity sampling: the best ``per_cluster`` documents of EVERY
    embedding-space cluster — uniform coverage of the semantic space
    instead of the head-heavy sample a global quality cut produces (the
    SemDeDup-family observation that semantic density, not quality,
    decides what a naive sample over-represents).

    Assignment is the IVF coarse quantizer (seeded codebook for the
    oracle; pass trained ``centroids`` in production, same contract as
    every IVF path); ranking is the corpus quality heuristic, quality
    desc / doc_id asc — engine-stable.  Docs without an embedding row
    are not sampled.

    Output: (doc_id, cid, quality, rank), rank 1-based within cluster.

    Scale shape: one broadcast-codebook assignment (zero shuffle), one
    doc_id equi-join to the quality projection, then the same salted
    two-phase per-cluster top-k as :func:`quota_sample` — no cluster
    ever funnels through a single task.
    """
    from akumuli_spark.pipeline.similarity import _assign_lists, _centroids
    from akumuli_spark.pipeline.text import quality_score

    from pyspark.sql import Window

    if per_cluster <= 0:
        raise ValueError("per_cluster must be positive")
    cents = centroids if centroids is not None else _centroids(embs, nlist)
    assigned = _assign_lists(embs, cents).select(
        F.col("vec_id").alias("doc_id"), F.col("list_id").alias("cid")
    )
    scored = quality_score(docs).select("doc_id", "quality").join(
        assigned, "doc_id"
    )
    salt = _shard_expr("doc_id", n_salts)
    w1 = Window.partitionBy("cid", "__salt").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    survivors = (
        scored.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= per_cluster)
    )
    w2 = Window.partitionBy("cid").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= per_cluster)
        .select("doc_id", F.col("cid").cast("long").alias("cid"),
                "quality", "rank")
    )


def cluster_balanced_sample_sql(per_cluster: int = 10,
                                nlist: int = 16) -> str:
    """DuckDB twin — the single-window form over the same seeded-codebook
    assignment (cosine desc, cid asc tie) and quality blend."""
    from akumuli_spark.pipeline.text import quality_score_sql

    cos = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
           "* sqrt(list_dot_product({b}, {b})))")
    return f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cid, embedding::DOUBLE[] AS ce
  FROM embeddings ORDER BY vec_id LIMIT {nlist}
),
assigned AS (
  SELECT vec_id AS doc_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {cos.format(a='v.e', b='c.ce')} DESC, c.cid) AS r
    FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) v, cents c
  ) WHERE r = 1
),
scored AS (
  SELECT q.doc_id, a.cid, q.quality
  FROM ({quality_score_sql()}) q JOIN assigned a USING (doc_id)
)
SELECT doc_id, cid::BIGINT AS cid, quality, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY cid ORDER BY quality DESC, doc_id ASC
  )::BIGINT AS rank
  FROM scored
) WHERE rank <= {per_cluster}
""".strip()


def export_manifest(docs: DataFrame, n_shards: int = 16,
                    text_col: str = "text") -> DataFrame:
    """Per-shard export manifest: the integrity record a training run
    checks before trusting a materialized corpus (row/char counts, id
    range, and an order-insensitive content checksum per shard).

    Shard assignment is the deterministic md5 shard key every export
    path here uses (`deterministic_shuffle` / `pack_sequences`), and the
    checksum is the SUM of a 32-bit md5-derived integer over
    ``doc_id:text`` rows — commutative, so it is shuffle-order-proof and
    engine-portable (the oracle recomputes it exactly); a dropped,
    duplicated, or altered row moves it (per-row miss chance 2⁻³²).
    32 bits, not 60: the int64 accumulator must hold shard_rows · max
    sig without overflow, and 2³² leaves headroom for ~2·10⁹ rows per
    shard — size n_shards so shards stay under that.

    Output: (shard, n_rows, n_chars, min_id, max_id, content_sum).

    Scale shape: one projection + one n_shards-group aggregate — the
    cheapest full-corpus integrity pass possible.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    shard = _shard_expr("doc_id", n_shards)
    sig = F.expr(
        f"CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', "
        f"{text_col})), 1, 8), 16, 10) AS BIGINT)"
    )
    return (
        docs.select(
            shard.alias("shard"),
            F.length(text_col).cast("long").alias("__c"),
            F.col("doc_id"),
            sig.alias("__sig"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("__c").cast("long").alias("n_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.sum("__sig").cast("long").alias("content_sum"),
        )
        .select("shard", "n_rows", "n_chars", "min_id", "max_id",
                "content_sum")
    )


def export_jsonl_shards(docs: DataFrame, out_dir: str, n_shards: int = 16,
                        text_col: str = "text") -> DataFrame:
    """Materialize the corpus as shard-partitioned JSONL plus the
    manifest at ``{out_dir}/_manifest`` — the standard training-data
    hand-off artifact (one dir per shard, newline-delimited JSON rows,
    integrity record alongside).  Returns the manifest frame.

    The manifest is computed from the SAME frame that is written, so a
    reader re-deriving :func:`export_manifest` over the read-back rows
    and comparing is the end-to-end integrity check
    (test_export_roundtrip_manifest pins it)."""
    shard = _shard_expr("doc_id", n_shards)
    (
        docs.withColumn("shard", shard)
        .repartition("shard")
        .write.mode("overwrite").partitionBy("shard")
        .json(f"{out_dir}/data")
    )
    manifest = export_manifest(docs, n_shards, text_col=text_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/_manifest"
    )
    return manifest


def export_manifest_sql(n_shards: int = 16) -> str:
    return f"""
SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         % {n_shards}) AS shard,
       count(*)::BIGINT AS n_rows,
       sum(length(text))::BIGINT AS n_chars,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id,
       sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
            1, 8))::BIGINT)::BIGINT AS content_sum
FROM documents
GROUP BY 1
""".strip()


def dedup_clusters_keep_best(docs: DataFrame, n: int = 5,
                             threshold: float = 0.5,
                             max_df: int | None = 64) -> DataFrame:
    """Near-dup cluster survivorship by QUALITY: within each duplicate
    cluster keep the highest-quality member (ties → doc_id asc) — the
    production keep rule (min-id is arbitrary; when copies differ, you
    want the cleanest one), the cluster-level analogue of
    ``dedup.exact_keep_best``.

    Output: (doc_id, cluster_id, quality, keep) — the full corpus,
    keep as BIGINT 0/1.  Singletons keep themselves.

    Scale shape: components as in :func:`dedup_clusters` (keyed joins,
    pointer jumping), then ONE per-cluster max via the window over
    components — cluster sizes are near-dup-set sizes (tiny), so the
    window partitions are bounded by duplication, not corpus size.
    """
    from akumuli_spark.pipeline.text import quality_score

    # Components over edge-touched nodes only (O(duplicates)); the old
    # shape windowed row_number over the WHOLE corpus partitioned by
    # cluster_id — a full corpus shuffle+sort to rank mostly-singleton
    # partitions.  Singletons keep themselves by definition, so the
    # per-cluster winner is computed on the tiny labeled frame and
    # re-attached with broadcast-sized joins; the corpus itself is never
    # shuffled.
    pairs = _dedup.ngram_jaccard_pairs(docs, n=n, threshold=threshold,
                                       max_df=max_df)
    labels = _components_of_pairs(pairs)  # (id, comp), O(duplicates)
    # quality feeds BOTH the winners agg and the full-corpus scored
    # frame — left lazy, the tokenize-heavy per-row score projection
    # executes once per join.  The frame is two narrow columns per doc
    # (8-byte id + double), far smaller than the text it derives from —
    # the cheap side of the materialize-once trade.
    q = (
        quality_score(docs).select("doc_id", "quality")
        .localCheckpoint(eager=True)
    )
    # winner of each non-singleton cluster: max quality, ties → min doc_id
    # (max over struct(quality, -doc_id) == the old row_number order
    # quality DESC, doc_id ASC)
    # F.broadcast pins the O(duplicates) labels and O(clusters) winners
    # as build sides: both are post-checkpoint frames with no size
    # statistics, so the static plan would otherwise SortMergeJoin the
    # corpus-scale q side through an exchange (guide §3.1); the
    # "corpus is never shuffled" shape now holds statically, not only
    # after AQE's runtime rescue.
    winners = (
        q.join(F.broadcast(labels), q["doc_id"] == labels["id"])
        .groupBy(F.col("comp").alias("cluster_id"))
        .agg((-F.max(F.struct(F.col("quality"), (-F.col("doc_id")).alias("nid")))
              .getField("nid")).alias("__winner"))
    )
    scored = q.join(F.broadcast(labels), q["doc_id"] == labels["id"], "left").select(
        "doc_id", F.coalesce("comp", F.col("doc_id")).alias("cluster_id"),
        "quality",
    )
    return scored.join(F.broadcast(winners), "cluster_id", "left").select(
        "doc_id", "cluster_id", "quality",
        F.when(F.col("__winner").isNull(), F.lit(1))
        .otherwise((F.col("doc_id") == F.col("__winner")).cast("long"))
        .cast("long").alias("keep"),
    )


def dedup_clusters_keep_best_sql(n: int = 5, threshold: float = 0.5,
                                 max_df: int | None = 64) -> str:
    from akumuli_spark.pipeline.text import quality_score_sql

    comp_sql = dedup_clusters_sql(n=n, threshold=threshold, max_df=max_df)
    return f"""
WITH comp AS (
{comp_sql}
),
scored AS (
  SELECT c.doc_id, c.cluster_id, q.quality
  FROM comp c JOIN ({quality_score_sql()}) q USING (doc_id)
)
SELECT doc_id, cluster_id, quality,
       (row_number() OVER (PARTITION BY cluster_id
          ORDER BY quality DESC, doc_id ASC) = 1)::BIGINT AS keep
FROM scored
""".strip()


def mine_contrastive_triplets(pairs: DataFrame, neighbors: DataFrame,
                              per_anchor: int = 1) -> DataFrame:
    """Contrastive training triplets (anchor, positive, hard negative) —
    the embedding-model training set a curation pipeline mines from its
    own dedup and ANN passes: positives are near-duplicate partners
    (either side of a pairs frame), hard negatives are the anchor's
    highest-cosine ANN neighbors that are NOT among its positives (and
    not itself) — the "close but not a duplicate" examples that make
    contrastive training hard, rather than random negatives.

    Inputs compose from the existing families:
    ``pairs`` = any near-dup pair frame ((doc_a, doc_b) + anything) —
    :func:`~akumuli_spark.pipeline.dedup.ngram_jaccard_pairs`,
    MinHash/SimHash/semantic pairs, or the image/audio hash pairs;
    ``neighbors`` = any ANN result frame ((query_id, neighbor_id,
    cosine) + anything) — exact, IVF, or IVFADC, batch or indexed.

    Output: (anchor_id, pos_id, neg_id, neg_cosine, neg_rank) — one row
    per (anchor, positive) × its top ``per_anchor`` eligible negatives;
    anchors lacking a positive or an eligible negative emit nothing
    (inner-join semantics: the miner only emits complete triplets).

    Scale shape: symmetric positive expansion is a union; negative
    eligibility is one keyed anti-join of the neighbors frame against
    the positives; the final window partitions by anchor over ≤ k ANN
    rows.  Nothing here touches raw text or embeddings — the miner runs
    entirely over the (tiny) pair and top-k frames.
    """
    # Symmetrize in ONE pass over the pair generator (explode of both
    # orientations, not a union of two projections), then materialize:
    # pos feeds BOTH the anti-join and the final triplet join, and each
    # unmaterialized consumption would re-execute the whole upstream
    # pair generator (for the registry shape, the shingle self-join) —
    # 4 executions in the pre-r14 plan (2 union branches × 2 consumers).
    # The frame is O(near-dup pairs), so the eager checkpoint is small
    # at any scale; localCheckpoint (not persist) for GC-release.
    pos = pairs.select(
        F.explode(F.array(
            F.struct(F.col("doc_a").alias("anchor_id"),
                     F.col("doc_b").alias("pos_id")),
            F.struct(F.col("doc_b").alias("anchor_id"),
                     F.col("doc_a").alias("pos_id")),
        )).alias("__e")
    ).select("__e.anchor_id", "__e.pos_id").distinct().localCheckpoint(
        eager=True
    )
    from pyspark.sql import Window

    neigh = neighbors.select(
        F.col("query_id").alias("anchor_id"),
        F.col("neighbor_id").alias("neg_id"),
        F.col("cosine").alias("neg_cosine"),
    )
    n, p = neigh.alias("n"), pos.alias("p")
    # broadcast the O(near-dup pairs) positives as the anti-join build
    # side: the checkpointed frame has no size statistics, so the
    # static plan would otherwise shuffle both sides (guide §3.1)
    elig = n.join(
        F.broadcast(p),
        (F.col("n.anchor_id") == F.col("p.anchor_id"))
        & (F.col("n.neg_id") == F.col("p.pos_id")),
        "left_anti",
    ).filter(
        # "not itself" is enforced HERE, not assumed of the input: the
        # in-repo ANN frames never emit self-matches, but the documented
        # contract is "any ANN result frame" (ADVICE r9)
        F.col("neg_id") != F.col("anchor_id")
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("neg_cosine").desc(), F.col("neg_id").asc()
    )
    best = (
        elig.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= int(per_anchor))
    )
    # broadcast the ≤ per_anchor-per-anchor winners frame: the pos side
    # is post-checkpoint (no stats), so the static plan would otherwise
    # exchange both of these small frames
    return pos.join(F.broadcast(best), "anchor_id").select(
        "anchor_id", "pos_id", "neg_id", "neg_cosine", "neg_rank"
    )


def mine_triplets_sql(pairs_sql: str, neighbors_sql: str,
                      per_anchor: int = 1) -> str:
    """DuckDB twin of :func:`mine_contrastive_triplets` — the two input
    families arrive as their own oracle SQL texts, so the composition is
    pinned end to end against exactly the frames the Spark side used."""
    return f"""
WITH pairs AS ({pairs_sql}),
neigh AS ({neighbors_sql}),
pos AS (
  SELECT DISTINCT anchor_id, pos_id FROM (
    SELECT doc_a AS anchor_id, doc_b AS pos_id FROM pairs
    UNION ALL
    SELECT doc_b AS anchor_id, doc_a AS pos_id FROM pairs
  )
),
elig AS (
  SELECT n.query_id AS anchor_id, n.neighbor_id AS neg_id,
         n.cosine AS neg_cosine
  FROM neigh n ANTI JOIN pos p
    ON n.query_id = p.anchor_id AND n.neighbor_id = p.pos_id
  WHERE n.neighbor_id <> n.query_id
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
                               ORDER BY neg_cosine DESC, neg_id ASC)
            AS neg_rank
  FROM elig
)
SELECT p.anchor_id, p.pos_id, b.neg_id, b.neg_cosine,
       b.neg_rank::BIGINT AS neg_rank
FROM pos p JOIN best b USING (anchor_id)
WHERE b.neg_rank <= {int(per_anchor)}
""".strip()
