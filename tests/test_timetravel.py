"""Snapshot time travel + CDC egress diff (lake/table.py):
``read(version=...)``, ``read_as_of``, ``vacuum(retain_last)``, and
``read_changes`` — the Iceberg VERSION/TIMESTAMP AS OF, expire_snapshots
and changelog-scan analogues."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_jdbc_flatten_spark.lake.table import SEQ_COL, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField(SEQ_COL, T.LongType(), True),
    ]
)


def mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def state(df):
    return sorted((r.k, r.v) for r in df.collect())


@pytest.fixture()
def table3(spark, tmp_path):
    """Three committed snapshots: v after each lww merge."""
    t = LakeTable.create(spark, str(tmp_path / "tt"), SCHEMA, ["k"], n_buckets=4)
    t.merge(mk(spark, [(1, "a", 1), (2, "b", 1)]), mode="lww", batch_id=0)
    v1 = t.manifest()["version"]
    t.merge(mk(spark, [(2, "b2", 2), (3, "c", 2)]), mode="lww", batch_id=1)
    v2 = t.manifest()["version"]
    t.merge(mk(spark, [(1, None, 3), (4, "d", 3)]).withColumn(
        "__del", F.col("v").isNull()
    ), mode="lww", delete_col="__del", batch_id=2)
    v3 = t.manifest()["version"]
    return t, (v1, v2, v3)


def test_read_version_pins_each_snapshot(spark, table3):
    t, (v1, v2, v3) = table3
    assert state(t.read(version=v1)) == [(1, "a"), (2, "b")]
    assert state(t.read(version=v2)) == [(1, "a"), (2, "b2"), (3, "c")]
    assert state(t.read(version=v3)) == [(2, "b2"), (3, "c"), (4, "d")]
    assert state(t.read()) == state(t.read(version=v3))
    # compaction rewrites files but history stays pinned
    t.compact()
    assert state(t.read(version=v2)) == [(1, "a"), (2, "b2"), (3, "c")]
    with pytest.raises(ValueError, match="no snapshot v99"):
        t.read(version=99)


def test_read_as_of_wall_clock(spark, table3):
    t, (v1, v2, v3) = table3
    snaps = t.snapshots()
    assert [s["version"] for s in snaps][-3:] == [v1, v2, v3]
    wall_v2 = next(s["wall_ms"] for s in snaps if s["version"] == v2)
    assert state(t.read_as_of(wall_v2)) == [(1, "a"), (2, "b2"), (3, "c")]
    # far future resolves to current; prehistory raises
    assert state(t.read_as_of(wall_v2 + 10**10)) == state(t.read())
    with pytest.raises(ValueError, match="no snapshot"):
        t.read_as_of(snaps[0]["wall_ms"] - 1)


def test_vacuum_retention_gates_time_travel(spark, table3):
    t, (v1, v2, v3) = table3
    t.compact()
    vc = t.manifest()["version"]
    # retain the compacted snapshot plus the two before it: v2 readable
    t.vacuum(retain_last=vc - v2 + 1)
    assert state(t.read(version=v2)) == [(1, "a"), (2, "b2"), (3, "c")]
    # v1's base files predate v2's merge - if shared they survive; the
    # contract is only that reads past retention raise CLEANLY when
    # their files are gone
    t.vacuum(retain_last=1)
    with pytest.raises(ValueError, match="vacuumed"):
        t.read(version=v2)
    assert state(t.read()) == [(2, "b2"), (3, "c"), (4, "d")]
    with pytest.raises(ValueError, match="retain_last"):
        t.vacuum(retain_last=0)


def test_read_changes_keyed_diff(spark, table3):
    t, (v1, v2, v3) = table3
    ch = t.read_changes(v1, v2, compare_cols=["v"])
    got = sorted((r["_op"], r.k, r.v) for r in ch.collect())
    assert got == [("c", 3, "c"), ("u", 2, "b2")]
    ch2 = t.read_changes(v2, v3, compare_cols=["v"])
    got2 = sorted((r["_op"], r.k, r.v) for r in ch2.collect())
    assert got2 == [("c", 4, "d"), ("d", 1, None)]
    # to_version defaults to current; v1 -> current net change
    net = sorted((r["_op"], r.k, r.v) for r in t.read_changes(v1, compare_cols=["v"]).collect())
    assert net == [("c", 3, "c"), ("c", 4, "d"), ("d", 1, None), ("u", 2, "b2")]
    # identical snapshots diff to nothing
    assert t.read_changes(v2, v2, compare_cols=["v"]).count() == 0
    # seq excluded from compare_cols: a rewrite with the same payload
    # is NOT a change
    assert t.read_changes(v1, v1, compare_cols=["v"]).count() == 0
    with pytest.raises(ValueError, match="compare_cols"):
        t.read_changes(v1, v2, compare_cols=["nope"])


def test_read_changes_across_schema_evolution(spark, tmp_path):
    """A column auto-evolved between the two snapshots reads as a
    typed null on the before side — the diff works across the
    evolution boundary instead of failing on the missing column."""
    t = LakeTable.create(spark, str(tmp_path / "ev"), SCHEMA, ["k"], n_buckets=2)
    t.merge(mk(spark, [(1, "a", 1), (2, "b", 1)]), mode="lww", batch_id=0)
    v1 = t.manifest()["version"]
    t.evolve_schema(
        T.StructType(list(SCHEMA.fields) + [T.StructField("extra", T.StringType(), True)])
    )
    t.merge(
        spark.createDataFrame(
            [(1, "a", 2, "x")],
            T.StructType(list(SCHEMA.fields) + [T.StructField("extra", T.StringType(), True)]),
        ),
        mode="lww",
        batch_id=1,
    )
    v2 = t.manifest()["version"]
    ch = sorted(
        (r["_op"], r.k, r.v, r.extra)
        for r in t.read_changes(v1, v2, compare_cols=["v", "extra"]).collect()
    )
    # k=1: unchanged v, extra null -> "x" = update; k=2: untouched
    assert ch == [("u", 1, "a", "x")]


def test_apply_changes_syncs_a_replica(spark, table3, tmp_path):
    """read_changes → apply_changes round-trip: a replica at the FROM
    snapshot lands exactly on the TO snapshot, and re-delivery of the
    same diff batch is a no-op (exactly-once per half)."""
    t, (v1, v2, v3) = table3
    r = LakeTable.create(spark, str(tmp_path / "replica"), SCHEMA, ["k"], n_buckets=4)
    r.merge(mk(spark, [(1, "a", 1), (2, "b", 1)]), mode="lww", batch_id=0)
    assert state(r.read()) == state(t.read(version=v1))

    before = r.manifest()
    r.apply_changes(t.read_changes(v1, v3), batch_id=1)
    assert state(r.read()) == state(t.read(version=v3))
    # atomic: upserts + tombstones land as ONE commit adding ONE lww
    # segment (no separate delete segment, no intermediate compaction)
    assert r.manifest()["version"] == before["version"] + 1
    added = r.manifest()["segments"][len(before.get("segments", [])):]
    assert [s["mode"] for s in added] == ["lww"]

    st = r.apply_changes(t.read_changes(v1, v3), batch_id=1)
    assert st.get("skipped")
    assert state(r.read()) == state(t.read(version=v3))


def test_apply_changes_evolves_the_replica(spark, tmp_path):
    """A diff carrying a column the source auto-evolved lands on a
    narrower replica by evolving it first — the apply path mirrors the
    ingest path's additive auto-evolve."""
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, ["k"], n_buckets=2)
    src.merge(mk(spark, [(1, "a", 1), (2, "b", 1)]), mode="lww", batch_id=0)
    v1 = src.manifest()["version"]
    wide = T.StructType(
        list(SCHEMA.fields) + [T.StructField("extra", T.StringType(), True)]
    )
    src.evolve_schema(wide)
    src.merge(
        spark.createDataFrame([(1, "a2", 2, "x")], wide), mode="lww", batch_id=1
    )
    v2 = src.manifest()["version"]

    rep = LakeTable.create(spark, str(tmp_path / "rep"), SCHEMA, ["k"], n_buckets=2)
    rep.merge(mk(spark, [(1, "a", 1), (2, "b", 1)]), mode="lww", batch_id=0)
    rep.apply_changes(src.read_changes(v1, v2), batch_id=1)
    assert "extra" in rep.read().columns
    got = sorted((r.k, r.v, r.extra) for r in rep.read().collect())
    want = sorted((r.k, r.v, r.extra) for r in src.read(version=v2).collect())
    assert got == want == [(1, "a2", "x"), (2, "b", None)]


def test_apply_changes_rejects_partial_column_diff(spark, table3, tmp_path):
    """A diff produced with a compare_cols subset would null the
    un-compared columns under whole-row LWW — refused with guidance."""
    t, (v1, _, _) = table3
    r = LakeTable.create(spark, str(tmp_path / "r2"), SCHEMA, ["k"], n_buckets=4)
    with pytest.raises(ValueError, match="lack columns"):
        r.apply_changes(t.read_changes(v1, compare_cols=["v"]))


def test_rejected_apply_leaves_replica_metadata_untouched(spark, tmp_path):
    """A malformed (partial-column) diff that ALSO carries new columns
    must not commit a schema evolution before raising — validation runs
    against the post-evolution column set without committing (r4
    advisory)."""
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, ["k"], n_buckets=2)
    src.merge(mk(spark, [(1, "a", 1)]), mode="lww", batch_id=0)
    v1 = src.manifest()["version"]
    wide = T.StructType(
        list(SCHEMA.fields) + [T.StructField("extra", T.StringType(), True)]
    )
    src.evolve_schema(wide)
    src.merge(
        spark.createDataFrame([(1, "a2", 2, "x")], wide), mode="lww", batch_id=1
    )
    v2 = src.manifest()["version"]

    rep = LakeTable.create(spark, str(tmp_path / "rep2"), SCHEMA, ["k"], n_buckets=2)
    before_version = rep.manifest()["version"]
    # compare_cols subset: carries the NEW column but not v → must be
    # rejected with zero side effects
    with pytest.raises(ValueError, match="lack columns"):
        rep.apply_changes(src.read_changes(v1, v2, compare_cols=["extra"]))
    assert "extra" not in [f.name for f in rep.schema.fields]
    assert rep.manifest()["version"] == before_version


def test_read_changes_plan_is_one_full_outer_join(spark, table3):
    t, (v1, v2, v3) = table3
    plan = (
        t.read_changes(v1, v2, compare_cols=["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
