"""FIXTURES.md §8 — nested_avro evolution pair: decimal(4,2) inside an
exploded array, optional-ancestor ⇒ nullable-leaf propagation
(FlattenTransformation.java:246-251), and the additive schema-evolution
pair (value_wo_array.avsc → value.avsc)."""

import decimal

from pyspark.sql import types as T

from kafka_connect_jdbc_flatten_spark.config import FlattenConfig
from kafka_connect_jdbc_flatten_spark.operators.explode import flatten_table
from kafka_connect_jdbc_flatten_spark.plans import compile_flatten_plan

CHILD_ITEM = T.StructType(
    [
        T.StructField("CHILDLEVEL3STRING1", T.StringType(), True),
        T.StructField("CHILDLEVEL3STRING2", T.StringType(), True),
        T.StructField("CHILDLEVEL3DECIMAL", T.DecimalType(4, 2), True),
    ]
)

CHILDRECORD = T.StructType(
    [
        T.StructField("CHILDSTRING1", T.StringType(), False),
        T.StructField("CHILDSTRING2", T.StringType(), True),
        T.StructField("CHILDLIST", T.ArrayType(CHILD_ITEM, True), True),
    ]
)

ROOTRECORD = T.StructType(
    [
        T.StructField("ROOTSTRING1", T.StringType(), False),
        T.StructField("ROOTSTRING2", T.StringType(), True),
        # non-optional struct under an OPTIONAL ancestor
        T.StructField("CHILDRECORD", CHILDRECORD, False),
    ]
)

VALUE = T.StructType(
    [
        T.StructField("INT", T.IntegerType(), True),
        T.StructField("ROOTRECORD", ROOTRECORD, True),
    ]
)

VALUE_WO_ARRAY = T.StructType(
    [
        T.StructField("INT", T.IntegerType(), True),
        T.StructField(
            "ROOTRECORD",
            T.StructType(
                [
                    T.StructField("ROOTSTRING1", T.StringType(), True),
                    T.StructField("ROOTSTRING2", T.StringType(), True),
                    T.StructField(
                        "CHILDRECORD",
                        T.StructType(
                            [
                                T.StructField("CHILDSTRING1", T.StringType(), True),
                                T.StructField("CHILDSTRING2", T.StringType(), True),
                            ]
                        ),
                        False,
                    ),
                ]
            ),
            True,
        ),
    ]
)

CFG = FlattenConfig(topic="ntopic")


def _plan(value_schema):
    return compile_flatten_plan(
        None, value_schema, CFG, value_record_name="NestedTestValue"
    )


def test_decimal_survives_into_exploded_child():
    plan = _plan(VALUE)
    names = sorted(t.table_name for t in plan.tables)
    assert names == [
        "ntopic_nestedtestvalue",
        "ntopic_nestedtestvalue_rootrecord_childrecord_childlist",
    ]
    child = next(t for t in plan.tables if t.table_name.endswith("childlist"))
    dec = next(c for c in child.columns if c.out_name == "childlevel3decimal")
    assert dec.dtype == T.DecimalType(4, 2)


def test_optional_last_container_forces_nullable():
    """The reference checks the LAST container's own optionality
    (FlattenTransformation.java:246-251; Container optionality is the
    node schema's isOptional, :656)."""
    plan = _plan(VALUE)
    root = next(t for t in plan.tables if t.table_name == "ntopic_nestedtestvalue")
    nullable = {c.out_name: c.nullable for c in root.columns}
    # ROOTSTRING1 is NOT NULL but sits in optional ROOTRECORD → forced nullable
    assert nullable["rootstring1"] is True
    # CHILDSTRING1 is NOT NULL and its LAST container (CHILDRECORD) is
    # non-optional → stays non-nullable, even though grandparent
    # ROOTRECORD is optional (last-container rule, not any-ancestor)
    assert nullable["childstring1"] is False


def test_evolution_pair_is_additive():
    old = _plan(VALUE_WO_ARRAY)
    new = _plan(VALUE)
    old_root = next(t for t in old.tables if t.table_name == "ntopic_nestedtestvalue")
    new_root = next(t for t in new.tables if t.table_name == "ntopic_nestedtestvalue")
    # root table columns identical — the array only adds a child table
    assert [c.out_name for c in old_root.columns] == [
        c.out_name for c in new_root.columns
    ]
    assert len(old.tables) == 1 and len(new.tables) == 2


def test_decimal_explode_values(spark):
    plan = _plan(VALUE)
    child_spec = next(t for t in plan.tables if t.table_name.endswith("childlist"))
    rows = [
        (
            "ntopic", 0, 1, None, "CreateTime", None,
            (
                7,
                (
                    "r1", "r2",
                    ("c1", "c2", [("a", "b", decimal.Decimal("12.34")),
                                  ("c", "d", None)]),
                ),
            ),
        )
    ]
    schema = T.StructType(
        [
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType(), True),
            T.StructField("timestamp_type", T.StringType()),
            T.StructField("key", T.StringType(), True),
            T.StructField("value", VALUE),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = flatten_table(df, child_spec).orderBy("childlevel3string1").collect()
    assert [r.childlevel3decimal for r in out] == [decimal.Decimal("12.34"), None]
