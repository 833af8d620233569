"""As-of join (operators/asof.py): semantics vs a tiny hand model and
a randomized pandas ``merge_asof`` cross-check, plus the plan-shape
pin (one key shuffle + window — no range-join / BroadcastNestedLoop)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kafka_connect_jdbc_flatten_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def dims(spark):
    return spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:00:00"), 1, "v1"),
            ("a", _ts("2024-01-03T00:00:00"), 2, "v2"),
            ("a", _ts("2024-01-03T00:00:00"), 3, "v2b"),  # same-ts tie
            ("b", _ts("2024-01-02T00:00:00"), 4, "w1"),
            (None, _ts("2024-01-01T00:00:00"), 5, "nullkey"),
            ("c", None, 6, "nullts"),
        ],
        "k string, ts timestamp, ver int, payload string",
    )


@pytest.fixture()
def facts(spark):
    return spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-02T00:00:00")),  # -> v1
            (2, "a", _ts("2024-01-03T00:00:00")),  # tie: inclusive, max ver -> v2b
            (3, "a", _ts("2024-01-04T00:00:00")),  # -> v2b
            (4, "b", _ts("2024-01-01T00:00:00")),  # before any dim -> null
            (5, "c", _ts("2024-01-05T00:00:00")),  # only null-ts dim -> null
            (6, "z", _ts("2024-01-05T00:00:00")),  # no dim key -> null
            (7, None, _ts("2024-01-05T00:00:00")),  # null fact key -> null
            (8, "a", None),  # null fact ts -> kept, null match
        ],
        "event_id int, k string, ts timestamp",
    )


def test_asof_backward_semantics(spark, dims, facts):
    out = asof_join(
        facts,
        dims,
        on="k",
        right_cols=["payload", "ver"],
        right_order=["ver"],
    )
    rows = {r["event_id"]: (r["payload"], r["ver"]) for r in out.collect()}
    assert out.count() == facts.count()  # LEFT OUTER row preservation
    assert rows[1] == ("v1", 1)
    assert rows[2] == ("v2b", 3)  # inclusive tie, deterministic max-ver winner
    assert rows[3] == ("v2b", 3)
    assert rows[4] == (None, None)
    assert rows[5] == (None, None)
    assert rows[6] == (None, None)
    assert rows[7] == (None, None)
    assert rows[8] == (None, None)
    # left columns pass through untouched
    assert set(out.columns) == {"event_id", "k", "ts", "payload", "ver"}


def test_asof_forward_and_tolerance(spark, dims, facts):
    fwd = asof_join(
        facts, dims, on="k", right_cols=["ver"], direction="forward",
        right_order=["ver"],
    )
    rows = {r["event_id"]: r["ver"] for r in fwd.collect()}
    # forward: oldest dim at-or-after the fact ts; at the 01-03 tie the
    # deterministic winner is still the max right_order among equals
    assert rows[1] == 3  # next dim at 01-03 (tie -> max ver)
    assert rows[2] == 3  # inclusive
    assert rows[3] is None  # nothing after 01-04
    assert rows[4] == 4  # b's dim at 01-02 is after 01-01

    tol = asof_join(
        facts, dims, on="k", right_cols=["ver"],
        tolerance_sec=24 * 3600.0, right_order=["ver"],
    )
    rows = {r["event_id"]: r["ver"] for r in tol.collect()}
    assert rows[1] == 1  # 1 day gap == tolerance, inclusive
    assert rows[3] == 3  # 1 day gap to v2b
    assert rows[2] == 3 and rows[4] is None


def test_asof_tolerance_on_date_typed_dimension(spark):
    """r4 advisory: tolerance_sec on a DateType right timestamp (the
    asof_join gate's o_orderdate shape) raised AnalysisException on
    the direct date→double cast — epoch seconds now go through an
    intermediate timestamp cast."""
    dims = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), "v1"), ("a", dt.date(2024, 1, 10), "v2")],
        "k string, d date, payload string",
    )
    facts = spark.createDataFrame(
        [(1, "a", _ts("2024-01-02T00:00:00")),  # 1 day after v1 -> within tol
         (2, "a", _ts("2024-01-08T00:00:00"))],  # 7 days after v1 -> voided
        "event_id int, k string, ts timestamp",
    )
    out = asof_join(
        facts, dims, on="k", left_ts="ts", right_ts="d",
        right_cols=["payload"], tolerance_sec=2 * 24 * 3600.0,
    )
    rows = {r["event_id"]: r["payload"] for r in out.collect()}
    assert rows[1] == "v1"
    assert rows[2] is None  # match exists but beyond tolerance
    assert out.count() == 2  # LEFT OUTER preserved


def test_asof_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 150
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_l).astype(str),
            "ts": pd.to_datetime(rng.integers(0, 10_000, n_l), unit="s"),
            "event_id": np.arange(n_l),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_r).astype(str),
            "ts": pd.to_datetime(rng.integers(0, 10_000, n_r), unit="s"),
            "val": rng.normal(size=n_r).round(6),
        }
    )
    # merge_asof demands uniqueness per (k, ts) for a deterministic
    # answer — dedup to the max-val row, mirroring right_order
    right = right.sort_values(["k", "ts", "val"]).groupby(["k", "ts"], as_index=False).last()
    expected = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
    ).set_index("event_id")["val"]

    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        right_cols=["val"],
        right_order=["val"],
    )
    got = {r["event_id"]: r["val"] for r in out.collect()}
    assert len(got) == n_l
    for eid, exp in expected.items():
        g = got[eid]
        assert (pd.isna(exp) and g is None) or g == exp, (eid, exp, g)


def test_asof_plan_is_single_window_no_range_join(spark, dims, facts):
    plan = asof_join(
        facts, dims, on="k", right_cols=["payload"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # union+window, not a join at all


def test_asof_rejects_colliding_and_bad_direction(spark, dims, facts):
    with pytest.raises(ValueError, match="collide"):
        asof_join(facts, dims.withColumnRenamed("payload", "event_id"),
                  on="k", right_cols=["event_id"])
    with pytest.raises(ValueError, match="direction"):
        asof_join(facts, dims, on="k", direction="nearest")
