"""Approximate distinct counting via a deterministic HyperLogLog sketch.

The reference's ``aggregate`` count is exact per-series (it never needs
cardinality estimation single-node), but a 100 TB curation run constantly
asks for cardinalities — distinct users, URLs, tokens, fingerprints —
where the exact ``count(distinct)`` shuffle of every distinct key IS the
cost.  HyperLogLog (Flajolet et al. 2007, public) is the standard
answer: m = 2^b small registers replace the distinct-key shuffle, the
error is ~1.04/sqrt(m), and registers merge by elementwise ``max``, so
one sketch composes across partitions, days, and incremental loads.

This implementation is deterministic and engine-portable *by
construction*:

* the hash is md5 — identical lowercase hex in Spark and DuckDB;
* the bucket key is the first b/4 hex chars kept AS A STRING (no
  hex→int conversion, which the two engines spell differently);
* the rank (position of the first 1-bit in the next 64 bits) is derived
  from the 16-char hex tail with pure string ops: count leading '0'
  chars (4 zero bits each), then classify the first nonzero nibble with
  a CASE over hex chars.

The DuckDB oracle replays the identical computation, so the *estimate*
cross-checks exactly — unlike the engines' native approx_count_distinct
whose sketches are engine-private and mutually incomparable.

Two-stage API, mirroring how a production pipeline uses it:
``hll_registers`` produces the mergeable (group, bucket, register)
table — persist it, union increments, ``max`` per bucket;
``hll_estimate`` folds registers into the bias-corrected estimate
(small-range linear counting included).  ``approx_distinct`` composes
the two for one-shot use.

Scale shape: one scan → groupBy(group, bucket) two-phase agg (map-side
partials collapse each partition to ≤ m rows per group) → groupBy(group)
over ≤ m rows per group.  Nothing keyed by the *value* ever shuffles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

#: 16 hex chars = 64 bits of rank material after the bucket prefix.
_TAIL_HEX = 16


def _check_b(b: int) -> int:
    if b % 4 != 0 or not 4 <= b <= 16:
        # nibble alignment keeps the bucket a clean hex-prefix string
        raise ValueError("b must be a multiple of 4 in [4, 16]")
    return 1 << b


def _alpha(m: int) -> float:
    """Bias-correction constant alpha_m from the HLL paper."""
    if m == 16:
        return 0.673
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str,
                  group_cols: Sequence[str] = (), b: int = 8) -> DataFrame:
    """Mergeable HLL register table for ``col``, optionally per group.

    Output: ``(*group_cols, bucket, register)`` — ``bucket`` is the
    b/4-char hex prefix (string key), ``register`` the max rank observed
    in that bucket.  Buckets no value hashed into are simply absent
    (treated as register 0 by :func:`hll_estimate`).  Null values are
    ignored, matching ``count(distinct)``; duplicates are free by
    construction (same hash → same (bucket, rank)).

    Merging increments: ``union`` the register tables then
    :func:`hll_merge` (max per (group, bucket)) — :func:`hll_estimate`
    expects one row per bucket.
    """
    _check_b(b)
    nb = b // 4
    gcols = list(group_cols)
    hx = F.md5(F.col(col).cast("string"))
    bucket = F.substring(hx, 1, nb)
    tail = F.substring(hx, nb + 1, _TAIL_HEX)
    z = F.length(F.regexp_extract(tail, "^0*", 0))
    ch = tail.substr(z + F.lit(1), F.lit(1))
    extra = (
        F.when(ch.isin(*"89abcdef"), 0)
        .when(ch.isin("4", "5", "6", "7"), 1)
        .when(ch.isin("2", "3"), 2)
        .otherwise(3)
    )
    rho = F.when(z >= _TAIL_HEX, 4 * _TAIL_HEX + 1).otherwise(z * 4 + extra + 1)
    return (
        df.where(F.col(col).isNotNull())
        .select(*gcols, bucket.alias("bucket"), rho.alias("__rho"))
        .groupBy(*gcols, "bucket")
        .agg(F.max("__rho").cast("int").alias("register"))
    )


def hll_merge(registers: DataFrame,
              group_cols: Sequence[str] = ()) -> DataFrame:
    """Fold a union of register tables back to one row per bucket."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate(registers: DataFrame,
                 group_cols: Sequence[str] = (), b: int = 8) -> DataFrame:
    """Bias-corrected HLL estimate from a register table.

    Absent buckets count as register 0 (contributing 2^0 = 1 to the
    harmonic sum); the small-range branch (raw ≤ 2.5 m with empty
    registers present) switches to linear counting m·ln(m/V) per the
    paper.  The 2^64-range correction is omitted: with a 64-bit rank
    domain it only matters beyond ~10^17 distincts.

    A group whose values are all NULL produces no registers and is
    absent from the output (count(distinct) would say 0).
    """
    m = _check_b(b)
    gcols = list(group_cols)
    # coalesce: ungrouped agg over an EMPTY register table yields one
    # row with sum=NULL; with __sp=0 and __np=0 the linear-counting
    # branch gives m·ln(m/m) = 0 — matching count(distinct) over empty
    # input instead of a NULL estimate.
    agg = registers.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("__np"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("register"))), F.lit(0.0)
        ).alias("__sp"),
    )
    raw = F.lit(_alpha(m) * m * m) / (F.col("__sp") + (F.lit(m) - F.col("__np")))
    v = (F.lit(m) - F.col("__np")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > F.lit(0.0)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(*gcols, est.alias("approx_distinct"))


def approx_distinct(df: DataFrame, col: str,
                    group_cols: Sequence[str] = (), b: int = 8) -> DataFrame:
    """One-shot ``(*group_cols, approx_distinct)`` estimate of
    ``count(distinct col)`` — see module docstring for the sketch
    contract."""
    return hll_estimate(
        hll_registers(df, col, group_cols, b), group_cols, b
    )


# ---------------------------------------------------------------------------
# DuckDB twin
# ---------------------------------------------------------------------------


def hll_sql(source_sql: str, group_cols: Sequence[str] = (),
            b: int = 8) -> str:
    """DuckDB SQL replaying the identical register computation.

    ``source_sql`` must yield the value pre-cast to VARCHAR as ``__v``
    plus the group columns (matching Spark's ``cast("string")``
    rendering — integer and plain-string columns round-trip
    identically).  All constants (alpha·m², thresholds) are Python-
    computed once and inlined with full repr so both engines divide by
    the same literal.
    """
    m = _check_b(b)
    nb = b // 4
    gsel = ", ".join(group_cols)
    gpfx = f"{gsel}, " if group_cols else ""
    gby = f"GROUP BY {gsel}" if group_cols else ""
    alpha_m2 = repr(_alpha(m) * m * m)
    return f"""
WITH __src AS ({source_sql}),
__h AS (
  SELECT {gpfx}md5(__v) AS hx FROM __src WHERE __v IS NOT NULL
),
__p AS (
  SELECT {gpfx}substr(hx, 1, {nb}) AS bucket,
         length(regexp_extract(substr(hx, {nb + 1}, {_TAIL_HEX}), '^0*')) AS z,
         substr(substr(hx, {nb + 1}, {_TAIL_HEX}),
                length(regexp_extract(substr(hx, {nb + 1}, {_TAIL_HEX}), '^0*')) + 1,
                1) AS ch
  FROM __h
),
__reg AS (
  SELECT {gpfx}bucket,
         max(CASE WHEN z >= {_TAIL_HEX} THEN {4 * _TAIL_HEX + 1}
                  ELSE 4 * z + (CASE WHEN ch IN ('8','9','a','b','c','d','e','f') THEN 0
                                     WHEN ch IN ('4','5','6','7') THEN 1
                                     WHEN ch IN ('2','3') THEN 2
                                     ELSE 3 END) + 1 END) AS register
  FROM __p GROUP BY {gpfx}bucket
),
__agg AS (
  SELECT {gpfx}count(*) AS np, sum(power(2.0, -register)) AS sp
  FROM __reg {gby}
),
__est AS (
  SELECT {gpfx}{alpha_m2} / (sp + ({m} - np)) AS raw,
         CAST({m} - np AS DOUBLE) AS v
  FROM __agg
)
SELECT {gpfx}CASE WHEN raw <= {repr(2.5 * m)} AND v > 0.0
            THEN {repr(float(m))} * ln({repr(float(m))} / v)
            ELSE raw END AS approx_distinct
FROM __est
""".strip()
