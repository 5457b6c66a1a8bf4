"""PII detection and redaction for training-data curation.

Web-scale corpora leak emails, phone numbers, IP addresses and
government-ID-shaped strings; scrubbing them is a standard pre-training
step (the C4/RefinedWeb pipelines run exactly this class of regex pass).
Both operators here are pure per-row projections over JVM-side regex
functions — zero shuffles, scan-bound at 100 TB, and Catalyst prunes
every untouched column.

Pattern dialect: the patterns below restrict themselves to the syntax
subset where Java regex (Spark) and RE2 (DuckDB oracle) agree — character
classes, bounded repetition, alternation and ASCII ``\\b`` word
boundaries; no lookaround or backreferences (RE2 has neither).

The driver corpus contains no organic PII, so the oracle entries run
over :func:`synth_pii_text`, which deterministically injects
email/IPv4/phone/SSN-shaped spans derived from ``doc_id`` — the same
real-kernel round-trip pattern as ``multimodal.synth_bmp_payloads``: the
injection is reproduced arithmetically in SQL, so a regression in either
the patterns or the replacement order breaks the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: (name, pattern, placeholder) — applied IN ORDER by the scrubber, so
#: earlier replacements cannot create or destroy later matches: emails go
#: first (their domains may contain digit runs an IPv4 pattern could
#: clip), then the two dash-digit shapes (disjoint: 3-3-4 vs 3-2-4), then
#: bare IPv4.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("id", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def synth_pii_text(docs: DataFrame) -> DataFrame:
    """Deterministically append PII-shaped spans to each document.

    Per-doc presence varies with ``doc_id`` residues so the detector
    output is non-constant: every doc gets an email, docs with
    ``doc_id % 2 == 0`` an IPv4, ``doc_id % 3 == 0`` a phone number,
    ``doc_id % 5 == 0`` an SSN-shaped ID.  Output: (doc_id, text).
    """
    d = F.col("doc_id")
    parts = [
        F.col("text"),
        F.concat(
            F.lit(" contact u"), d.cast("string"),
            F.lit("@ex"), (d % 7).cast("string"), F.lit(".com"),
        ),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit(" from 10."), (d % 256).cast("string"),
                F.lit("."), ((d * 7) % 256).cast("string"),
                F.lit("."), ((d * 13) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(" tel 555-"),
                F.lpad((d % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad(((d * 3) % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit(" ssn "),
                F.lpad((d % 900).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((d % 90).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad(((d * 11) % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    ]
    return docs.select("doc_id", F.concat(*parts).alias("text"))


#: SQL fragment reproducing synth_pii_text's injection arithmetically —
#: shared by every oracle below so the injected bytes are definitionally
#: identical on both sides.
SYNTH_PII_SQL_EXPR = """
text
|| ' contact u' || doc_id::VARCHAR || '@ex' || (doc_id % 7)::VARCHAR || '.com'
|| CASE WHEN doc_id % 2 = 0 THEN
     ' from 10.' || (doc_id % 256)::VARCHAR || '.'
     || ((doc_id * 7) % 256)::VARCHAR || '.'
     || ((doc_id * 13) % 256)::VARCHAR
   ELSE '' END
|| CASE WHEN doc_id % 3 = 0 THEN
     ' tel 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
     || '-' || lpad(((doc_id * 3) % 10000)::VARCHAR, 4, '0')
   ELSE '' END
|| CASE WHEN doc_id % 5 = 0 THEN
     ' ssn ' || lpad((doc_id % 900)::VARCHAR, 3, '0')
     || '-' || lpad((doc_id % 90)::VARCHAR, 2, '0')
     || '-' || lpad(((doc_id * 11) % 10000)::VARCHAR, 4, '0')
   ELSE '' END
""".strip()


def pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII match counts, one column per pattern, plus a
    ``has_pii`` gate bit.  Pure projection — ``regexp_count`` runs
    JVM-side inside whole-stage codegen; no Python, no shuffle.

    Output: (doc_id, n_email, n_phone, n_id, n_ipv4, has_pii).
    """
    t = F.col(text_col)
    cols, total = [], None
    for name, pat, _ in PII_PATTERNS:
        c = F.regexp_count(t, F.lit(pat))
        cols.append(c.cast("long").alias(f"n_{name}"))
        total = c if total is None else total + c
    return docs.select("doc_id", *cols, (total > 0).alias("has_pii"))


def pii_signals_sql(text_expr: str = SYNTH_PII_SQL_EXPR) -> str:
    cols = []
    totals = []
    for name, pat, _ in PII_PATTERNS:
        cols.append(
            f"len(regexp_extract_all(__t, '{pat}'))::BIGINT AS n_{name}"
        )
        totals.append(f"len(regexp_extract_all(__t, '{pat}'))")
    return f"""
WITH t AS (SELECT doc_id, {text_expr} AS __t FROM documents)
SELECT doc_id, {", ".join(cols)}, ({" + ".join(totals)}) > 0 AS has_pii
FROM t
""".strip()


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact every PII match with its typed placeholder, applying the
    patterns in ``PII_PATTERNS`` order (see ordering note there).

    Output: (doc_id, clean_text, n_redacted) where n_redacted is the
    total number of replaced spans.  Still a pure projection — the four
    chained ``regexp_replace`` calls fuse into one codegen stage.
    """
    t = F.col(text_col)
    n_redacted = None
    clean = t
    for _, pat, placeholder in PII_PATTERNS:
        c = F.regexp_count(t, F.lit(pat))
        n_redacted = c if n_redacted is None else n_redacted + c
        clean = F.regexp_replace(clean, pat, placeholder)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_redacted.cast("long").alias("n_redacted"),
    )


def pii_scrub_sql(text_expr: str = SYNTH_PII_SQL_EXPR) -> str:
    clean = "__t"
    counts = []
    for _, pat, placeholder in PII_PATTERNS:
        # counts run against the ORIGINAL text, replacements chain —
        # mirroring pii_scrub exactly
        counts.append(f"len(regexp_extract_all(__t, '{pat}'))")
        clean = f"regexp_replace({clean}, '{pat}', '{placeholder}', 'g')"
    return f"""
WITH t AS (SELECT doc_id, {text_expr} AS __t FROM documents)
SELECT doc_id, {clean} AS clean_text,
       ({" + ".join(counts)})::BIGINT AS n_redacted
FROM t
""".strip()
