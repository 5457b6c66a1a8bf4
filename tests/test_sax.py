"""SAX node tests vs an independent reimplementation (the reference's
test_sax.py analogue; no SQL oracle exists for symbolization)."""

from __future__ import annotations

import math
from statistics import NormalDist

import pytest

from akumuli_spark.query.engine import execute_query
from akumuli_spark.query.errors import QueryValidationError
from akumuli_spark.query.plan import parse_timestamp_ns
from akumuli_spark.sources.testdata import app_metrics_view
from tests.conftest import SF_DIR

E0 = parse_timestamp_ns("20240101T000000")
E1 = parse_timestamp_ns("20240201T000000")


def reference_sax(rows, alphabet, width):
    """Independent reimplementation of saxencoder.cpp:189-203."""
    cuts = [NormalDist().inv_cdf(i / alphabet) for i in range(1, alphabet)]
    letters = "abcdefghijklmnopqrstu"

    def to_char(v):
        for i, c in enumerate(cuts):
            if v < c:
                return letters[i]
        return letters[len(cuts)]

    out = []
    window, last = [], None
    for ts, x in rows:
        window.append(x)
        if len(window) > width:
            window.pop(0)
        if len(window) == width:
            n = len(window)
            s, sq = sum(window), sum(v * v for v in window)
            mean = s / n
            var = (n * sq - s * s) / (n * (n - 1))
            std = math.sqrt(var) if var > 0 else 0.0
            if std < 1e-10:
                word = "".join(to_char(v - mean) for v in window)
            else:
                word = "".join(to_char((v - mean) / std) for v in window)
            if word != last:
                last = word
                out.append((ts, word))
    return out


def test_sax_matches_reference_semantics(spark, duck):
    am = app_metrics_view(spark, SF_DIR)
    df = execute_query(
        spark,
        {
            "select": "app.view",
            "range": {"from": E0, "to": E1},
            "apply": [{"name": "sax", "alphabet_size": 4, "window_width": 5}],
        },
        am,
        allow_irregular=True,
    )
    got = {}
    for r in df.collect():
        got.setdefault(r["series"], []).append((r["ts_ns"], r["sax"]))
    base = duck.sql(
        f"""SELECT 'app.' || event_type || ' user=' || CAST(user_id % 8 AS VARCHAR) AS series,
               epoch_ns(ts) AS ts_ns, value
        FROM events WHERE event_type = 'view'
          AND epoch_ns(ts) >= {E0} AND epoch_ns(ts) < {E1}
        ORDER BY 1, 2"""
    ).fetchall()
    byseries = {}
    for series, ts, val in base:
        byseries.setdefault(series, []).append((ts, val))
    for series, rows in byseries.items():
        expected = reference_sax(rows, 4, 5)
        assert got.get(series, []) == expected, series
    # words use only the 4-letter alphabet
    all_words = [w for rows in got.values() for _, w in rows]
    assert all_words and all(set(w) <= set("abcd") and len(w) == 5 for w in all_words)


def test_sax_validation(spark):
    am = app_metrics_view(spark, SF_DIR)
    with pytest.raises(QueryValidationError):
        execute_query(
            spark,
            {
                "select": "app.view",
                "range": {"from": E0, "to": E1},
                "apply": [{"name": "sax", "alphabet_size": 25, "window_width": 5}],
            },
            am,
            allow_irregular=True,
        )
