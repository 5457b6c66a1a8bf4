"""Property-based parser tests — the pytest analogue of the reference's
AFL fuzz harnesses (fuzzers/afl_*.cpp: series-name, timestamp, RESP)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from akumuli_spark.datamodel import canonical_series_name, parse_series_name
from akumuli_spark.query.errors import QueryParseError
from akumuli_spark.query.plan import parse_duration_ns, parse_timestamp_ns
from akumuli_spark.sources.resp import RespError, parse_resp

ident = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="._-"),
    min_size=1, max_size=12,
).filter(lambda s: "=" not in s and " " not in s)


@given(metric=ident, tags=st.dictionaries(ident, ident, min_size=0, max_size=6))
def test_series_name_roundtrip(metric, tags):
    name = canonical_series_name(metric, tags)
    m, t = parse_series_name(name)
    assert m == metric and t == tags
    # canonical form is a fixed point
    assert canonical_series_name(m, t) == name


@given(st.text(max_size=50))
def test_series_parser_never_crashes(text):
    try:
        parse_series_name(text)
    except ValueError:
        pass  # rejection is fine; crashes are not


@given(st.integers(min_value=0, max_value=2**62))
def test_timestamp_int_passthrough(ns):
    assert parse_timestamp_ns(ns) == ns
    assert parse_timestamp_ns(str(ns)) == ns


@given(st.text(max_size=30))
def test_timestamp_parser_never_crashes(text):
    try:
        parse_timestamp_ns(text)
    except QueryParseError:
        pass


@given(st.integers(min_value=1, max_value=10**6),
       st.sampled_from(["n", "us", "ms", "s", "m", "min", "h", "d", "w"]))
def test_duration_units_scale(num, unit):
    ns = parse_duration_ns(f"{num}{unit}")
    assert ns % num == 0 and ns // num == parse_duration_ns(f"1{unit}")


@given(st.text(max_size=60))
@settings(max_examples=200)
def test_resp_parser_never_crashes(text):
    try:
        parse_resp(text)
    except (RespError, ValueError):
        pass


@given(metric=ident, tags=st.dictionaries(ident, ident, min_size=1, max_size=4),
       ts=st.integers(min_value=1, max_value=2**60),
       value=st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_resp_roundtrip(metric, tags, ts, value):
    name = " ".join([metric] + [f"{k}={v}" for k, v in tags.items()])
    [s] = parse_resp(f"+{name}\n:{ts}\n+{value!r}\n")
    assert s.metric == metric
    assert s.tags == tags
    assert s.ts_ns == ts
    assert s.value == float(repr(value))


# ---------------------------------------------------------------------------
# ingest late-write gate — interleavings of batches and marks-table loss
# (VERDICT r5 #7: hypothesis around HighWaterState)
# ---------------------------------------------------------------------------

_LATE = 100
_SERIES = ["cpu host=a", "cpu host=b", "mem host=a"]

_batch_st = st.lists(
    st.tuples(st.integers(0, len(_SERIES) - 1), st.integers(0, 500)),
    min_size=1, max_size=5,
)
_ops_st = st.lists(st.tuples(st.booleans(), _batch_st), min_size=1, max_size=3)


@settings(max_examples=6, deadline=None)
@given(ops=_ops_st)
def test_ingest_gate_matches_model_under_marks_loss(spark, ops):
    """Drive the production batch path (gate_and_commit_batch) through
    arbitrary interleavings of micro-batches and marks-side-table loss,
    against a reference model of the gate semantics:

    * a row is late iff its series has a committed mark and
      ts <= mark - late_after (rows within one batch never gate each
      other — the split joins against PRE-batch marks);
    * losing the side table must not change any gate decision (it
      re-seeds from the committed sink, whose per-series maxima ARE the
      marks) — it only costs exactly one extra seed scan.
    """
    import shutil
    import tempfile

    from akumuli_spark.streaming.ingest import (
        HighWaterState,
        gate_and_commit_batch,
    )

    base = tempfile.mkdtemp(prefix="ingest_prop_")
    out_dir = f"{base}/out"
    rej_dir = f"{base}/rej"
    try:
        hw = HighWaterState(f"{base}/marks")
        marks_model: dict[str, int] = {}
        acc_model: list[tuple[str, int]] = []
        rej_model: list[tuple[str, int]] = []
        expected_seed_scans = 0
        for i, (lose_marks, rows) in enumerate(ops):
            if lose_marks:
                shutil.rmtree(hw.marks_dir, ignore_errors=True)
            if lose_marks or i == 0:
                expected_seed_scans += 1
            pre = dict(marks_model)
            for idx, ts in rows:
                s = _SERIES[idx]
                if s in pre and ts <= pre[s] - _LATE:
                    rej_model.append((s, ts))
                else:
                    acc_model.append((s, ts))
                    marks_model[s] = max(marks_model.get(s, ts), ts)
            batch = spark.createDataFrame(
                [(_SERIES[idx].split(" ")[0], _SERIES[idx], ts, 1.0)
                 for idx, ts in rows],
                "metric string, series string, ts_ns long, value double",
            )
            gate_and_commit_batch(batch, out_dir, rej_dir, _LATE, hw)
            assert hw.marks == marks_model
        assert hw.seed_scans == expected_seed_scans
        read = spark.read.schema(
            "series string, ts_ns long, value double, metric string"
        )
        got_acc = sorted(
            (r["series"], r["ts_ns"]) for r in read.parquet(out_dir).collect()
        )
        got_rej = sorted(
            (r["series"], r["ts_ns"]) for r in read.parquet(rej_dir).collect()
        )
        assert got_acc == sorted(acc_model)
        assert got_rej == sorted(rej_model)
    finally:
        shutil.rmtree(base, ignore_errors=True)
