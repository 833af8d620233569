"""Pure-Python unit tests of the flatten-plan compiler against the
reference's naming/PK/table-split rules (goldens from FIXTURES.md,
derived from JdbcSinkTaskTestPostgresArray/Map/Delete tests)."""

from pyspark.sql import types as T

from kafka_connect_jdbc_flatten_spark.config import FlattenConfig
from kafka_connect_jdbc_flatten_spark.plans import compile_flatten_plan

PERSON_SCALARS = [
    T.StructField("firstname", T.StringType(), False),
    T.StructField("lastname", T.StringType(), False),
    T.StructField("age", T.IntegerType(), True),
    T.StructField("bool", T.BooleanType(), True),
    T.StructField("short", T.ShortType(), True),
    T.StructField("byte", T.ByteType(), True),
    T.StructField("long", T.LongType(), True),
    T.StructField("float", T.FloatType(), True),
    T.StructField("double", T.DoubleType(), True),
    T.StructField("modified", T.TimestampType(), False),
]

ADDRESS = T.StructType(
    [
        T.StructField("street", T.StringType(), False),
        T.StructField("number", T.ByteType(), False),
    ]
)

# FIXTURES.md §3: Person with address array<struct>
PERSON_ADDRESS = T.StructType(
    PERSON_SCALARS + [T.StructField("address", T.ArrayType(ADDRESS, True), True)]
)


def table_names(plan):
    return sorted(t.table_name for t in plan.tables)


def spec(plan, name):
    return next(t for t in plan.tables if t.table_name == name)


def cols(plan, name):
    return [c.out_name for c in spec(plan, name).columns]


def test_array_of_struct_two_tables():
    cfg = FlattenConfig(topic="atopic")
    plan = compile_flatten_plan(None, PERSON_ADDRESS, cfg, value_record_name="Person")
    # JdbcSinkTaskTestPostgresArray.java:304-362
    assert table_names(plan) == ["atopic_person", "atopic_person_address"]
    assert cols(plan, "atopic_person") == [
        "firstname", "lastname", "age", "bool", "short", "byte", "long",
        "float", "double", "modified",
    ]
    assert cols(plan, "atopic_person_address") == ["street", "number"]


def test_coordinates_added_to_every_table():
    cfg = FlattenConfig(topic="atopic", coordinates=True)
    plan = compile_flatten_plan(None, PERSON_ADDRESS, cfg, value_record_name="Person")
    for t in plan.tables:
        assert [c.out_name for c in t.columns][-5:] == [
            "kafkatopic", "kafkapartition", "kafkaoffset",
            "kafkatimestamp", "kafkatimestamp_type",
        ]  # JdbcSinkConfig.java:272-273


def test_array_of_array_path_repeats_name():
    # FIXTURES.md §4: address array<array<struct>> → atopic_person_address_address
    schema = T.StructType(
        PERSON_SCALARS
        + [T.StructField("address", T.ArrayType(T.ArrayType(ADDRESS, True), True), True)]
    )
    cfg = FlattenConfig(topic="atopic")
    plan = compile_flatten_plan(None, schema, cfg, value_record_name="Person")
    assert table_names(plan) == ["atopic_person", "atopic_person_address_address"]


def test_pk_propagate_value_fields():
    # FIXTURES.md §4: propagate person.float / person.modified to both tables
    schema = T.StructType(
        PERSON_SCALARS
        + [T.StructField("address", T.ArrayType(T.ArrayType(ADDRESS, True), True), True)]
    )
    cfg = FlattenConfig(
        topic="atopic",
        pk_propagate_value_fields=("person.float", "person.modified"),
    )
    plan = compile_flatten_plan(None, schema, cfg, value_record_name="Person")
    child = spec(plan, "atopic_person_address_address")
    assert "person_float" in [c.out_name for c in child.columns]
    assert "person_modified" in [c.out_name for c in child.columns]
    assert child.merge_keys == ("person_float", "person_modified")
    parent = spec(plan, "atopic_person")
    # in the parent the leaf itself is the PK, full-path named
    assert "person_float" in [c.out_name for c in parent.columns]
    assert "float" not in [c.out_name for c in parent.columns]
    assert parent.merge_keys == ("person_float", "person_modified")


def test_map_of_primitive_key_column():
    # FIXTURES.md §5: map key lands in person_address_key, value in address
    schema = T.StructType(
        PERSON_SCALARS
        + [T.StructField("address", T.MapType(T.StringType(), T.StringType(), True), True)]
    )
    cfg = FlattenConfig(topic="atopic")
    plan = compile_flatten_plan(None, schema, cfg, value_record_name="Person")
    child = spec(plan, "atopic_person_address")
    assert [c.out_name for c in child.columns] == ["address", "person_address_key"]


def test_map_of_struct():
    schema = T.StructType(
        PERSON_SCALARS
        + [T.StructField("address", T.MapType(T.StringType(), ADDRESS, True), True)]
    )
    cfg = FlattenConfig(topic="atopic")
    plan = compile_flatten_plan(None, schema, cfg, value_record_name="Person")
    child = spec(plan, "atopic_person_address")
    assert [c.out_name for c in child.columns] == [
        "street", "number", "person_address_key",
    ]


def test_key_struct_pk_propagation():
    # FIXTURES.md §6: personkey_keyint appended to every table
    key = T.StructType(
        [
            T.StructField("keyInt", T.IntegerType(), False),
            T.StructField("keyName", T.StringType(), False),
        ]
    )
    cfg = FlattenConfig(
        topic="atopic", pk_mode="flatten", pk_fields=("personkey.keyint",),
        delete_enabled=True,
    )
    plan = compile_flatten_plan(
        key, PERSON_ADDRESS, cfg,
        value_record_name="Person", key_record_name="PersonKey",
    )
    for t in plan.tables:
        assert t.columns[0].out_name == "personkey_keyint"
        assert t.key_merge_keys == ("personkey_keyint",)


def test_tombstone_plan():
    key = T.StructType([T.StructField("keyInt", T.IntegerType(), False)])
    cfg = FlattenConfig(
        topic="atopic", pk_mode="flatten", pk_fields=("personkey.keyint",),
        delete_enabled=True,
    )
    plan = compile_flatten_plan(key, None, cfg, key_record_name="PersonKey")
    assert plan.is_tombstone
    assert plan.key_pk_columns[0].out_name == "personkey_keyint"


def test_sales_event_fixture():
    # FIXTURES.md §7: deep nesting, 3 tables, PKs from key + value paths
    key = T.StructType(
        [
            T.StructField("salesNo", T.StringType(), False),
            T.StructField("customerNo", T.StringType(), False),
        ]
    )
    value = T.StructType(
        [
            T.StructField(
                "payment",
                T.StructType(
                    [
                        T.StructField("sumPayed", T.StringType(), False),
                        T.StructField("id", T.StringType(), False),
                        T.StructField(
                            "productCodes", T.ArrayType(T.StringType(), True), True
                        ),
                    ]
                ),
                False,
            ),
            T.StructField("companyNo", T.StringType(), False),
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
                                                [
                                                    T.StructField("id", T.StringType(), False),
                                                    T.StructField("departmentNo", T.StringType(), False),
                                                    T.StructField("mobile", T.StringType(), False),
                                                ]
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
            ),
        ]
    )
    cfg = FlattenConfig(
        topic="sales",
        pk_mode="flatten",
        insert_mode="upsert",
        pk_fields=(
            "saleskey.salesno",
            "salesevent.payment.productcodes.productcodes",
            "salesevent.salesinfo.id",
            "salesevent.salesinfo.staff.staff.employee.id",
        ),
        pk_propagate_value_fields=("salesevent.payment.id",),
    )
    plan = compile_flatten_plan(
        key, value, cfg, value_record_name="salesEvent", key_record_name="salesKey"
    )
    assert table_names(plan) == [
        "sales_salesevent",
        "sales_salesevent_payment_productcodes",
        "sales_salesevent_salesinfo_staff",
    ]
    root = spec(plan, "sales_salesevent")
    # duplicate simple name "id" (payment.id, salesinfo.id) ⇒ full paths;
    # payment.id is also a propagated PK
    root_cols = [c.out_name for c in root.columns]
    assert "salesevent_payment_id" in root_cols
    assert "salesevent_salesinfo_id" in root_cols
    assert "id" not in root_cols
    assert root.columns[0].out_name == "saleskey_salesno"
    staff = spec(plan, "sales_salesevent_salesinfo_staff")
    staff_cols = [c.out_name for c in staff.columns]
    assert "salesevent_salesinfo_staff_staff_employee_id" in staff_cols
    # payment struct is NOT on staff's container chain ⇒ its propagated
    # PK does not reach this table (FlattenTransformation.java:276-281
    # filters on c.getKey().containsAll(f.getContainer()))
    assert "salesevent_payment_id" not in staff_cols
    codes = spec(plan, "sales_salesevent_payment_productcodes")
    codes_cols = [c.out_name for c in codes.columns]
    assert "salesevent_payment_productcodes_productcodes" in codes_cols
    assert "salesevent_payment_id" in codes_cols


def test_whitelist_prunes_tables():
    # whitelist values are FULL leaf container paths, including the
    # array-element struct (reference test JdbcSinkTaskTestPostgresArray
    # .java:902 whitelists struct paths: "person, person.record2.record2again")
    cfg = FlattenConfig(
        topic="atopic",
        containers_whitelist=frozenset({"person.address.address"}),
    )
    plan = compile_flatten_plan(None, PERSON_ADDRESS, cfg, value_record_name="Person")
    assert table_names(plan) == ["atopic_person_address"]
    assert cols(plan, "atopic_person_address") == ["street", "number"]


def test_rename_fields_and_tables():
    cfg = FlattenConfig(
        topic="atopic",
        rename_fields={"person.age": "years"},
        rename_tables={"atopic_person_address": "addr"},
    )
    plan = compile_flatten_plan(None, PERSON_ADDRESS, cfg, value_record_name="Person")
    assert "addr" in table_names(plan)
    assert "years" in cols(plan, "atopic_person")


def test_uppercase():
    cfg = FlattenConfig(topic="atopic", uppercase=True)
    plan = compile_flatten_plan(None, PERSON_ADDRESS, cfg, value_record_name="Person")
    assert "ATOPIC_PERSON" in table_names(plan)
    assert "FIRSTNAME" in cols(plan, "ATOPIC_PERSON")


def test_table_name_format_template():
    """table.name.format parity (JdbcSinkConfig.java:89,
    JdbcDbWriter.java:88,103,233-241): every destination table name —
    including flatten-produced and RENAMED ones — substitutes into the
    ${topic} template; rename precedes the template, case forcing
    applies to the name but not the template literal, and an empty
    result raises."""
    cfg = FlattenConfig(topic="atopic", table_name_format="dw_${topic}")
    plan = compile_flatten_plan(None, PERSON_ADDRESS, cfg, value_record_name="Person")
    assert "dw_atopic_person" in table_names(plan)
    assert all(t.startswith("dw_") for t in table_names(plan))

    # rename map wins first, THEN the template wraps the renamed name
    cfg2 = FlattenConfig(
        topic="atopic",
        rename_tables={"atopic_person_address": "addr"},
        table_name_format="dw_${topic}",
    )
    plan2 = compile_flatten_plan(None, PERSON_ADDRESS, cfg2, value_record_name="Person")
    assert "dw_addr" in table_names(plan2)

    # uppercase forces the NAME, not the template's literal prefix
    cfg3 = FlattenConfig(
        topic="atopic", uppercase=True, table_name_format="dw_${topic}"
    )
    plan3 = compile_flatten_plan(None, PERSON_ADDRESS, cfg3, value_record_name="Person")
    assert "dw_ATOPIC_PERSON" in table_names(plan3)

    # empty result raises like the reference's ConnectException
    import pytest

    with pytest.raises(ValueError, match="empty"):
        compile_flatten_plan(
            None,
            PERSON_ADDRESS,
            FlattenConfig(topic="atopic", table_name_format=""),
            value_record_name="Person",
        )


def test_fields_whitelist_prunes_non_pk_leaves():
    """fields.whitelist parity (FieldsMetadata.java:144-146,
    JdbcSinkConfig.java:188-196): only whitelisted simple names
    survive; PK fields always survive."""
    from pyspark.sql import types as T

    from kafka_connect_jdbc_flatten_spark.config import FlattenConfig
    from kafka_connect_jdbc_flatten_spark.plans import compile_flatten_plan

    schema = T.StructType(
        [
            T.StructField("keep_me", T.StringType(), True),
            T.StructField("drop_me", T.StringType(), True),
            T.StructField("pk_col", T.LongType(), False),
        ]
    )
    cfg = FlattenConfig(
        topic="t",
        fields_whitelist=frozenset(["keep_me"]),
        pk_fields=("rec.pk_col",),
    )
    plan = compile_flatten_plan(None, schema, cfg, value_record_name="Rec")
    cols = [c.out_name for c in plan.tables[0].columns]
    assert "keep_me" in cols and "drop_me" not in cols
    # PK survives the whitelist (the reference adds PKs back)
    assert any("pk_col" in c for c in cols)


def test_plan_cache_capacity_config_parity():
    """flatten.instruction_cache_size parity
    (JdbcSinkConfig.java:326-332): the LRU evicts past capacity."""
    from pyspark.sql import types as T

    from kafka_connect_jdbc_flatten_spark.config import FlattenConfig
    from kafka_connect_jdbc_flatten_spark.plans import PlanCache

    cfg = FlattenConfig(topic="t", instruction_cache_size=2)
    cache = PlanCache(capacity=cfg.instruction_cache_size)
    schemas = [
        T.StructType([T.StructField(f"f{i}", T.StringType(), True)])
        for i in range(3)
    ]
    plans = [cache.get(None, s, cfg, "R", None) for s in schemas]
    # schema 0 evicted (capacity 2): a re-get compiles a NEW object
    assert cache.get(None, schemas[0], cfg, "R", None) is not plans[0]
    # schema 2 still cached
    assert cache.get(None, schemas[2], cfg, "R", None) is plans[2]


# ---------------------------------------------------------------- pk modes
KEY2 = T.StructType(
    [
        T.StructField("keyInt", T.IntegerType(), False),
        T.StructField("keyName", T.StringType(), False),
    ]
)


def test_pk_mode_record_key_struct_all_fields():
    """record_key + struct key, no pk.fields → ALL key fields become
    PK columns of every table (FieldsMetadata.java:300-305)."""
    cfg = FlattenConfig(topic="atopic", pk_mode="record_key")
    plan = compile_flatten_plan(KEY2, PERSON_ADDRESS, cfg, value_record_name="Person")
    for t in plan.tables:
        assert [c.out_name for c in t.columns[:2]] == ["keyint", "keyname"]
        assert t.merge_keys[:2] == ("keyint", "keyname")
        assert t.key_merge_keys == ("keyint", "keyname")


def test_pk_mode_record_key_subset_and_missing_field():
    cfg = FlattenConfig(topic="atopic", pk_mode="record_key", pk_fields=("keyName",))
    plan = compile_flatten_plan(KEY2, PERSON_ADDRESS, cfg, value_record_name="Person")
    assert plan.tables[0].key_merge_keys == ("keyname",)
    import pytest as _pt

    bad = FlattenConfig(topic="atopic", pk_mode="record_key", pk_fields=("nope",))
    with _pt.raises(ValueError, match="not in key schema"):
        compile_flatten_plan(KEY2, PERSON_ADDRESS, bad, value_record_name="Person")


def test_pk_mode_record_key_primitive_needs_one_name():
    import pytest as _pt

    cfg = FlattenConfig(topic="atopic", pk_mode="record_key", pk_fields=("id",))
    plan = compile_flatten_plan(
        T.StringType(), PERSON_ADDRESS, cfg, value_record_name="Person"
    )
    assert plan.tables[0].columns[0].out_name == "id"
    assert plan.tables[0].columns[0].source == ("key", None)
    with _pt.raises(ValueError, match="exactly one"):
        compile_flatten_plan(
            T.StringType(),
            PERSON_ADDRESS,
            FlattenConfig(topic="atopic", pk_mode="record_key"),
            value_record_name="Person",
        )


def test_pk_mode_kafka_default_and_configured_names():
    """kafka mode: 3 coordinate-sourced PK columns, default
    __connect_* names or exactly 3 configured
    (FieldsMetadata.java:240-270)."""
    import pytest as _pt

    cfg = FlattenConfig(topic="atopic", pk_mode="kafka")
    plan = compile_flatten_plan(None, PERSON_ADDRESS, cfg, value_record_name="Person")
    for t in plan.tables:
        assert [c.out_name for c in t.columns[:3]] == [
            "__connect_topic", "__connect_partition", "__connect_offset",
        ]
        assert [c.source for c in t.columns[:3]] == [
            ("coord", 0), ("coord", 1), ("coord", 2),
        ]
        assert t.merge_keys[:3] == (
            "__connect_topic", "__connect_partition", "__connect_offset",
        )
    named = FlattenConfig(
        topic="atopic", pk_mode="kafka", pk_fields=("t", "p", "o")
    )
    plan2 = compile_flatten_plan(None, PERSON_ADDRESS, named, value_record_name="Person")
    assert [c.out_name for c in plan2.tables[0].columns[:3]] == ["t", "p", "o"]
    with _pt.raises(ValueError, match="exactly 3"):
        compile_flatten_plan(
            None,
            PERSON_ADDRESS,
            FlattenConfig(topic="atopic", pk_mode="kafka", pk_fields=("a", "b")),
            value_record_name="Person",
        )


def test_pk_mode_record_value_subset_and_default_all():
    """record_value: PKs from top-level primitive value fields —
    configured subset or all (FieldsMetadata.java:332-366); names
    follow the flatten rule (PK ⇒ full path)."""
    import pytest as _pt

    cfg = FlattenConfig(
        topic="atopic", pk_mode="record_value", pk_fields=("firstname",)
    )
    plan = compile_flatten_plan(None, PERSON_ADDRESS, cfg, value_record_name="Person")
    root = spec(plan, "atopic_person")
    assert root.merge_keys == ("person_firstname",)
    # child table does NOT inherit record_value PKs (they live on the
    # root struct, not the exploded chain)
    child = spec(plan, "atopic_person_address")
    assert child.merge_keys == ()
    all_cfg = FlattenConfig(topic="atopic", pk_mode="record_value")
    plan2 = compile_flatten_plan(None, PERSON_ADDRESS, all_cfg, value_record_name="Person")
    assert len(spec(plan2, "atopic_person").merge_keys) == len(PERSON_SCALARS)
    with _pt.raises(ValueError, match="top-level primitive"):
        compile_flatten_plan(
            None,
            PERSON_ADDRESS,
            FlattenConfig(topic="atopic", pk_mode="record_value", pk_fields=("address",)),
            value_record_name="Person",
        )


def test_delete_requires_keyed_pk_mode():
    import pytest as _pt

    for mode in ("none", "kafka", "record_value"):
        with _pt.raises(ValueError, match="delete.enabled requires"):
            compile_flatten_plan(
                KEY2,
                PERSON_ADDRESS,
                FlattenConfig(topic="atopic", pk_mode=mode, delete_enabled=True),
                value_record_name="Person",
            )
