"""e2e flatten executor tests — golden-row assertions mirroring the
reference's Postgres sink tests (JdbcSinkTaskTestPostgresArray/Map)."""

import datetime

from pyspark.sql import types as T

from kafka_connect_jdbc_flatten_spark.config import FlattenConfig
from kafka_connect_jdbc_flatten_spark.operators.explode import flatten_records
from kafka_connect_jdbc_flatten_spark.plans import compile_flatten_plan

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)

ADDRESS = T.StructType(
    [
        T.StructField("street", T.StringType(), False),
        T.StructField("number", T.IntegerType(), False),
    ]
)
PERSON = T.StructType(
    [
        T.StructField("firstname", T.StringType(), False),
        T.StructField("age", T.IntegerType(), True),
        T.StructField("address", T.ArrayType(ADDRESS, True), True),
    ]
)


def changelog_schema(key_type, value_type):
    return T.StructType(
        [
            T.StructField("topic", T.StringType(), False),
            T.StructField("partition", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("timestamp", T.TimestampType(), True),
            T.StructField("timestamp_type", T.StringType(), True),
            T.StructField("key", key_type, True),
            T.StructField("value", value_type, True),
        ]
    )


def test_array_of_struct_explode(spark):
    rows = [
        (
            "atopic", 1, 42, TS, "CreateTime", None,
            ("John", 30, [("Main st", 1), ("Side st", 2)]),
        ),
        ("atopic", 1, 43, TS, "CreateTime", None, ("Jane", 25, None)),
    ]
    df = spark.createDataFrame(rows, changelog_schema(T.StringType(), PERSON))
    cfg = FlattenConfig(topic="atopic", coordinates=True)
    plan = compile_flatten_plan(None, PERSON, cfg, value_record_name="Person")
    out = flatten_records(df, plan)
    parent = out["atopic_person"].orderBy("kafkaoffset").collect()
    assert [r.firstname for r in parent] == ["John", "Jane"]
    assert [r.kafkaoffset for r in parent] == [42, 43]
    child = out["atopic_person_address"].orderBy("kafkaoffset", "number").collect()
    # Jane's null address array yields NO child row (reference flatMap
    # semantics, FlattenTransformation.java:449-456)
    assert [(r.street, r.number) for r in child] == [("Main st", 1), ("Side st", 2)]


def test_map_of_struct_key_column(spark):
    value_type = T.StructType(
        [
            T.StructField("firstname", T.StringType(), False),
            T.StructField(
                "address", T.MapType(T.StringType(), ADDRESS, True), True
            ),
        ]
    )
    rows = [
        (
            "atopic", 0, 1, TS, "CreateTime", None,
            ("John", {"home": ("Main st", 1), "work": ("Biz ave", 9)}),
        )
    ]
    df = spark.createDataFrame(rows, changelog_schema(T.StringType(), value_type))
    cfg = FlattenConfig(topic="atopic")
    plan = compile_flatten_plan(None, value_type, cfg, value_record_name="Person")
    out = flatten_records(df, plan)
    child = {
        r.person_address_key: (r.street, r.number)
        for r in out["atopic_person_address"].collect()
    }
    assert child == {"home": ("Main st", 1), "work": ("Biz ave", 9)}


def test_key_pk_propagated_to_children(spark):
    key_type = T.StructType(
        [
            T.StructField("keyInt", T.IntegerType(), False),
            T.StructField("keyName", T.StringType(), False),
        ]
    )
    rows = [
        (
            "atopic", 0, 1, TS, "CreateTime",
            (7, "k7"), ("John", 30, [("Main st", 1)]),
        )
    ]
    df = spark.createDataFrame(rows, changelog_schema(key_type, PERSON))
    cfg = FlattenConfig(
        topic="atopic", pk_mode="flatten", pk_fields=("personkey.keyint",),
    )
    plan = compile_flatten_plan(
        key_type, PERSON, cfg,
        value_record_name="Person", key_record_name="PersonKey",
    )
    out = flatten_records(df, plan)
    child = out["atopic_person_address"].collect()
    assert child[0].personkey_keyint == 7
    parent = out["atopic_person"].collect()
    assert parent[0].personkey_keyint == 7


def test_array_of_primitive(spark):
    value_type = T.StructType(
        [
            T.StructField("companyNo", T.StringType(), False),
            T.StructField("codes", T.ArrayType(T.StringType(), True), True),
        ]
    )
    rows = [("t", 0, 1, TS, "CreateTime", None, ("NO-1", ["a", "b"]))]
    df = spark.createDataFrame(rows, changelog_schema(T.StringType(), value_type))
    plan = compile_flatten_plan(
        None, value_type, FlattenConfig(topic="t"), value_record_name="Rec"
    )
    out = flatten_records(df, plan)
    # primitive array items land under their own field name
    assert sorted(r.codes for r in out["t_rec_codes"].collect()) == ["a", "b"]


def test_deep_nesting_struct_under_array(spark):
    value_type = T.StructType(
        [
            T.StructField(
                "salesInfo",
                T.StructType(
                    [
                        T.StructField("id", T.StringType(), False),
                        T.StructField(
                            "staff",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("supportType", T.StringType(), False),
                                        T.StructField(
                                            "employee",
                                            T.StructType(
                                                [T.StructField("id", T.StringType(), False)]
                                            ),
                                            False,
                                        ),
                                    ]
                                ),
                                True,
                            ),
                            True,
                        ),
                    ]
                ),
                False,
            )
        ]
    )
    rows = [
        (
            "sales", 0, 1, TS, "CreateTime", None,
            (("1112", [("marketing", ("232323",)), ("sales", ("3442",))]),),
        )
    ]
    df = spark.createDataFrame(rows, changelog_schema(T.StringType(), value_type))
    plan = compile_flatten_plan(
        None, value_type, FlattenConfig(topic="sales"), value_record_name="salesEvent"
    )
    out = flatten_records(df, plan)
    staff = out["sales_salesevent_salesinfo_staff"].orderBy("supporttype").collect()
    assert [(r.supporttype, r.id) for r in staff] == [
        ("marketing", "232323"), ("sales", "3442"),
    ]


def test_has_rows_expr_matches_flatten_exactly(spark):
    """The shrunk-to-empty marker derivation (CdcApplier._batch_rows)
    replaces per-envelope marker rows with ``has_rows_expr`` — a pure
    column predicate that must agree EXACTLY with flatten_table's row
    production for every generator table, or stale children survive
    (false negative) / markers churn (false positive).  Exercises:
    null/empty/`[None]` arrays, nested array-in-array-element, maps
    with null values (with and without deeper generators), empty maps,
    and mixed elements where only one satisfies the residual chain."""
    from pyspark.sql import functions as F

    from kafka_connect_jdbc_flatten_spark.operators.explode import (
        flatten_table,
        has_rows_expr,
    )
    from kafka_connect_jdbc_flatten_spark.plans.flatten_plan import ARRAY, MAP

    inner = T.StructType(
        [T.StructField("b", T.ArrayType(T.IntegerType(), True), True)]
    )
    value_type = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("arr", T.ArrayType(inner, True), True),
            T.StructField("m", T.MapType(T.StringType(), inner, True), True),
            T.StructField("tags", T.ArrayType(T.StringType(), True), True),
            T.StructField(
                "m2", T.MapType(T.StringType(), T.StringType(), True), True
            ),
        ]
    )
    rows = [
        ("t", 0, 1, TS, "CreateTime", 1, (1, None, None, None, None)),
        ("t", 0, 2, TS, "CreateTime", 2, (2, [], {}, [], {})),
        ("t", 0, 3, TS, "CreateTime", 3, (3, [(None,)], None, None, None)),
        ("t", 0, 4, TS, "CreateTime", 4, (4, [([],)], None, None, None)),
        ("t", 0, 5, TS, "CreateTime", 5, (5, [([1, 2],)], None, None, None)),
        ("t", 0, 6, TS, "CreateTime", 6, (6, [None], None, None, None)),
        ("t", 0, 7, TS, "CreateTime", 7, (7, [([None],)], None, None, None)),
        ("t", 0, 8, TS, "CreateTime", 8, (8, None, {"k": ([3],)}, None, None)),
        ("t", 0, 9, TS, "CreateTime", 9, (9, None, {"k": None}, None, None)),
        ("t", 0, 10, TS, "CreateTime", 10, (10, None, None, ["a", None], None)),
        ("t", 0, 11, TS, "CreateTime", 11, (11, None, None, [None], None)),
        ("t", 0, 12, TS, "CreateTime", 12, (12, None, None, None, {"k": None})),
        ("t", 0, 13, TS, "CreateTime", 13, (13, None, None, None, {})),
        ("t", 0, 14, TS, "CreateTime", 14, (14, [([],), ([7],)], None, None, None)),
    ]
    df = spark.createDataFrame(rows, changelog_schema(T.LongType(), value_type))
    plan = compile_flatten_plan(
        None, value_type, FlattenConfig(topic="t"), value_record_name="rec"
    )
    from kafka_connect_jdbc_flatten_spark.operators.explode import flatten_table

    gen_tables = [
        s for s in plan.tables if any(c.kind in (ARRAY, MAP) for c in s.chain)
    ]
    assert len(gen_tables) >= 4  # arr/b, m/b, tags, m2 chains all present
    for spec in plan.tables:
        flat = flatten_table(df, spec, carry_cols=("offset",))
        produced = {r["offset"] for r in flat.select("offset").distinct().collect()}
        predicted = {
            r["offset"]
            for r in df.filter(has_rows_expr(spec)).select("offset").collect()
        }
        assert predicted == produced, (spec.table_name, predicted, produced)
