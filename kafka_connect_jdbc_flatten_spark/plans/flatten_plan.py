"""Flatten plan compiler — the engine's only "planner".

Pure Python (no SparkSession needed): walks a Spark ``StructType``
value schema plus an optional key schema and compiles the reference's
flatten semantics into a list of per-table ``TableSpec`` pipelines
that ``operators.explode`` executes as declarative
``explode_outer``/``select`` chains.

Reference parity (all citations into ``/root/reference/``):

* leaf enumeration / container walk  — ``FlattenTransformation.java:647-713``
* main-container table split (group by prefix up to the LAST
  ARRAY/MAP on the leaf's path)      — ``FlattenTransformation.java:149-157``
* duplicate-name / PK full-path column naming
                                      — ``FlattenTransformation.java:232-243``
* optional-last-container ⇒ nullable leaf
                                      — ``FlattenTransformation.java:246-251``
* map-key ``<path>_key`` columns + propagation
                                      — ``FlattenTransformation.java:461-472, 215-220``
* value-PK propagation (``flatten.pk_propagate_value_fields``)
                                      — ``FlattenTransformation.java:659-671, 199-208``
* key-PK extraction + propagation to every table
                                      — ``FlattenTransformation.java:334-368``
* container whitelist pruning         — ``FlattenTransformation.java:696-703``
* rename maps                         — ``FlattenTransformation.java:727-736``
* coordinates columns                 — ``FlattenTransformation.java:715-721``
* table naming (topic ⊕ delim ⊕ container path, renames)
                                      — ``JdbcDbWriter.java:85-108``
* tombstone instruction               — ``FlattenTransformation.java:298-314``
* root container naming               — ``FlattenTransformation.java:744-757``

The compiled plan is memoized per (schema fingerprint, config) —
the Spark-side analogue of the reference's instruction LRU cache
(``FlattenTransformation.java:39-60``); unlike the reference we never
re-interpret per record: Catalyst compiles the emitted expressions to
JVM bytecode once per micro-batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from ..config import FlattenConfig

STRUCT, ARRAY, MAP = "struct", "array", "map"

_CONTAINER_TYPES = (T.StructType, T.ArrayType, T.MapType)


def _is_container(dtype: T.DataType) -> bool:
    return isinstance(dtype, _CONTAINER_TYPES)


@dataclass
class Container:
    """A STRUCT/ARRAY/MAP node on a leaf's path (``Container.java:10-27``)."""

    name: str
    path: str  # dotted lower-case path of ancestor containers
    depth: int
    kind: str  # STRUCT | ARRAY | MAP
    optional: bool
    is_element: bool = False  # created as array-element / map-value struct
    pk_fields: list["Entry"] = field(default_factory=list)
    map_keys: list["Entry"] = field(default_factory=list)

    @property
    def lname(self) -> str:
        return self.name.lower()


@dataclass
class Entry:
    """A primitive leaf + the containers entered to reach it
    (``Entry.java:11-26``)."""

    field_name: str
    depth: int
    dtype: T.DataType
    nullable: bool
    containers: tuple[Container, ...]
    is_pk: bool = False
    target_name: str = ""

    @property
    def path(self) -> str:
        return ".".join(c.lname for c in self.containers)


@dataclass(frozen=True)
class ColumnSpec:
    """One output column of a target table.

    ``source`` encodes how the executor materializes it:

    * ``("key", field_or_None)``      — from the record key (None ⇒ the
      primitive key itself)
    * ``("chain_field", i, fname)``   — value of field ``fname`` of the
      struct at main-chain index ``i`` (value-PK propagation)
    * ``("map_key", i)``              — the exploded key of the MAP
      container at chain index ``i``
    * ``("leaf", steps)``             — field access ``steps`` (tuple of
      names) below the main container; empty ⇒ the exploded item itself
    * ``("coord", j)``                — j-th Kafka coordinate column
    """

    out_name: str
    source: tuple
    dtype: T.DataType
    nullable: bool


@dataclass
class TableSpec:
    """Compiled pipeline for one target table."""

    table_name: str
    full_table_name: str  # pre-rename, pre-case id used for buffering/routing
    container_path: str  # dotted chain path (= reference's schema name)
    chain: tuple[Container, ...]
    columns: tuple[ColumnSpec, ...]
    merge_keys: tuple[str, ...]  # all PK columns (key + value + propagated)
    key_merge_keys: tuple[str, ...]  # PKs sourced from the record key only
    # (deletes/upsert-replace scope on these: BufferedRecords.java:399-415)

    @property
    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.out_name, c.dtype, c.nullable) for c in self.columns]
        )


@dataclass
class FlattenPlan:
    """Full compiled plan for one (key_schema, value_schema, config)."""

    tables: tuple[TableSpec, ...]
    key_pk_columns: tuple[ColumnSpec, ...]
    is_tombstone: bool  # value schema was null ⇒ delete-all-tables marker
    config: FlattenConfig


def _record_name(name: str | None, dtype: T.DataType | None) -> str:
    """Root container name (``FlattenTransformation.java:744-757``):
    suffix of the schema name after the last '.', lower-cased; 'root'
    when unnamed or non-struct."""
    if isinstance(dtype, T.StructType) and name:
        return name.rsplit(".", 1)[-1].lower()
    return "root"


def _walk(
    field_name: str,
    dtype: T.DataType,
    nullable: bool,
    depth: int,
    containers: tuple[Container, ...],
    cfg: FlattenConfig,
    out: list[Entry],
    is_element: bool = False,
) -> None:
    """Recursive schema reversal (``FlattenTransformation.java:647-713``)."""
    path = ".".join(c.lname for c in containers)
    if isinstance(dtype, T.StructType):
        cont = Container(field_name, path, depth, STRUCT, nullable, is_element)
        containers = containers + (cont,)
        # register configured propagate-PK primitive children on this
        # struct container (FlattenTransformation.java:659-671)
        for f in dtype.fields:
            if not _is_container(f.dataType):
                fq = (
                    f"{path}.{field_name.lower()}.{f.name.lower()}"
                    if path
                    else f"{field_name.lower()}.{f.name.lower()}"
                )
                if any(s.lower() == fq for s in cfg.pk_propagate_value_fields):
                    cont.pk_fields.append(
                        Entry(f.name, depth + 1, f.dataType, f.nullable, containers)
                    )
        for f in dtype.fields:
            _walk(f.name, f.dataType, f.nullable, depth + 1, containers, cfg, out)
        return
    if isinstance(dtype, T.ArrayType):
        cont = Container(field_name, path, depth, ARRAY, nullable, is_element)
        containers = containers + (cont,)
        _walk(
            field_name,
            dtype.elementType,
            dtype.containsNull,
            depth + 1,
            containers,
            cfg,
            out,
            is_element=True,
        )
        return
    if isinstance(dtype, T.MapType):
        cont = Container(field_name, path, depth, MAP, nullable, is_element)
        # propagate-PK match on the map key itself uses the quirky
        # concatenated form "<path>.<fieldname>key"
        # (FlattenTransformation.java:681-683)
        fq = f"{path}.{field_name.lower()}key" if path else f"{field_name.lower()}key"
        containers = containers + (cont,)
        map_key = Entry("key", depth + 1, T.StringType(), False, containers)
        cont.map_keys.append(map_key)
        if any(s.lower() == fq for s in cfg.pk_propagate_value_fields):
            cont.pk_fields.append(map_key)
        _walk(
            field_name,
            dtype.valueType,
            dtype.valueContainsNull,
            depth + 1,
            containers,
            cfg,
            out,
            is_element=True,
        )
        return

    # ---- primitive leaf -------------------------------------------------
    entry = Entry(field_name, depth, dtype, nullable, containers)
    if cfg.containers_whitelist:
        cpath = ".".join(c.lname for c in containers)
        if cpath not in {w.lower() for w in cfg.containers_whitelist}:
            return  # pruned (FlattenTransformation.java:696-703)
    last = containers[-1]
    fq_leaf = f"{entry.path}.{field_name.lower()}"
    if any(
        p.field_name.lower() == field_name.lower() for p in last.pk_fields
    ) or any(pk.lower() == fq_leaf for pk in cfg.pk_fields):
        entry.is_pk = True  # FlattenTransformation.java:705-712
    if (
        cfg.fields_whitelist
        and not entry.is_pk
        and field_name.lower() not in {w.lower() for w in cfg.fields_whitelist}
    ):
        # fields.whitelist prunes non-PK leaves by simple name
        # (FieldsMetadata.java:144-146; PKs are always added back)
        return
    out.append(entry)


DEFAULT_KAFKA_PK_NAMES = ("__connect_topic", "__connect_partition", "__connect_offset")
# JdbcSinkConfig.java:63-69 (DEFAULT_KAFKA_PK_NAMES)


def _extract_key_pks(
    key_schema: T.DataType | None,
    key_record_name: str | None,
    cfg: FlattenConfig,
) -> list[ColumnSpec]:
    """Key-PK extraction.

    * ``flatten`` — configured dotted ``pk.fields`` hits on the key
      (``FlattenTransformation.java:334-368``).
    * ``record_key`` — primitive key needs exactly one configured name;
      struct key takes all fields (or the configured subset, which must
      all exist) (``FieldsMetadata.java:272-330``).
    * ``kafka`` — three coordinate-sourced columns, default names or
      exactly three configured (``FieldsMetadata.java:240-270``).
    """
    if cfg.pk_mode == "kafka":
        if not cfg.pk_fields:
            names = DEFAULT_KAFKA_PK_NAMES
        elif len(cfg.pk_fields) == 3:
            names = cfg.pk_fields
        else:
            raise ValueError(
                "pk.mode=kafka needs no pk.fields (defaults "
                f"{DEFAULT_KAFKA_PK_NAMES}) or exactly 3; got {cfg.pk_fields!r} "
                "(FieldsMetadata.java:240-253)"
            )
        return [
            ColumnSpec(cfg.case(names[0]), ("coord", 0), T.StringType(), False),
            ColumnSpec(cfg.case(names[1]), ("coord", 1), T.IntegerType(), False),
            ColumnSpec(cfg.case(names[2]), ("coord", 2), T.LongType(), False),
        ]
    if cfg.pk_mode == "record_key":
        if key_schema is None:
            raise ValueError(
                "pk.mode=record_key but record key schema is missing "
                "(FieldsMetadata.java:280-286)"
            )
        if not _is_container(key_schema):
            if len(cfg.pk_fields) != 1:
                raise ValueError(
                    "pk.mode=record_key with a primitive key needs exactly one "
                    f"pk.fields name; got {cfg.pk_fields!r} "
                    "(FieldsMetadata.java:288-298)"
                )
            return [
                ColumnSpec(cfg.case(cfg.pk_fields[0]), ("key", None), key_schema, False)
            ]
        if isinstance(key_schema, T.StructType):
            by_name = {f.name: f for f in key_schema.fields}
            names = cfg.pk_fields or tuple(f.name for f in key_schema.fields)
            pks = []
            for n in names:
                f = by_name.get(n)
                if f is None:
                    raise ValueError(
                        f"pk.mode=record_key pk.fields entry {n!r} not in key "
                        "schema (FieldsMetadata.java:306-315)"
                    )
                pks.append(ColumnSpec(cfg.case(f.name), ("key", f.name), f.dataType, False))
            return pks
        raise ValueError(
            "pk.mode=record_key key schema must be primitive or struct "
            "(FieldsMetadata.java:324-328)"
        )
    if cfg.pk_mode != "flatten" or key_schema is None:
        return []
    pks: list[ColumnSpec] = []
    pk_set = {p.lower() for p in cfg.pk_fields}
    root = _record_name(key_record_name, key_schema)
    if not _is_container(key_schema):
        # primitive key matches "<root>.key" → column "<root>_key"
        if f"{root}.key" in pk_set:
            name = cfg.rename_or_path(root, "key", True)
            pks.append(ColumnSpec(name, ("key", None), key_schema, False))
    elif isinstance(key_schema, T.StructType):
        for f in key_schema.fields:
            if f"{root}.{f.name.lower()}" in pk_set:
                name = cfg.rename_or_path(root, f.name, True)
                pks.append(ColumnSpec(name, ("key", f.name), f.dataType, f.nullable))
    return pks


_COORD_TYPES = (
    T.StringType(),
    T.IntegerType(),
    T.LongType(),
    T.TimestampType(),
    T.StringType(),
)


def compile_flatten_plan(
    key_schema: T.DataType | None,
    value_schema: T.StructType | None,
    cfg: FlattenConfig,
    value_record_name: str | None = None,
    key_record_name: str | None = None,
) -> FlattenPlan:
    """Compile (key_schema, value_schema, config) → FlattenPlan.

    Equivalent of ``getMainProcessingInstructions``
    (``FlattenTransformation.java:135-330``) but emitting declarative
    TableSpecs instead of closure chains.
    """
    if cfg.pk_mode not in ("none", "flatten", "kafka", "record_key", "record_value"):
        raise ValueError(
            f"unknown pk.mode {cfg.pk_mode!r} (JdbcSinkConfig.PrimaryKeyMode)"
        )
    if cfg.delete_enabled and cfg.pk_mode not in ("flatten", "record_key"):
        raise ValueError(
            "delete.enabled requires pk.mode flatten or record_key — a "
            "tombstone carries only the key, so coordinate- or value-derived "
            "PKs cannot scope the delete (JdbcSinkConfig.java:116-131)"
        )
    key_pks = _extract_key_pks(key_schema, key_record_name, cfg)
    if cfg.pk_mode == "flatten" and cfg.delete_enabled and key_schema is not None and not key_pks:
        raise ValueError(
            "delete_enabled requires at least one pk.fields entry matching "
            "the key schema (FlattenTransformation.java:166-175)"
        )

    # Tombstone: null value schema ⇒ delete marker for all topic tables
    # (FlattenTransformation.java:298-314)
    if value_schema is None:
        if cfg.delete_enabled and key_pks:
            return FlattenPlan((), tuple(key_pks), True, cfg)
        return FlattenPlan((), (), False, cfg)

    if not isinstance(value_schema, T.StructType):
        raise TypeError("flatten requires a StructType value schema")

    root = _record_name(value_record_name, value_schema)
    walk_cfg = cfg
    if cfg.pk_mode == "record_value":
        # non-flatten RECORD_VALUE semantics adapted to the flatten
        # engine: PKs come from TOP-LEVEL primitive value fields — all
        # of them by default, else the configured subset, which must
        # exist (FieldsMetadata.java:332-366).  Marked leaves follow
        # the flatten naming rule (PK ⇒ full-path column name).
        import dataclasses as _dc

        top = {
            f.name.lower() for f in value_schema.fields if not _is_container(f.dataType)
        }
        if cfg.pk_fields:
            for n in cfg.pk_fields:
                if n.lower() not in top:
                    raise ValueError(
                        f"pk.mode=record_value pk.fields entry {n!r} is not a "
                        "top-level primitive value field "
                        "(FieldsMetadata.java:349-358)"
                    )
            chosen = tuple(n.lower() for n in cfg.pk_fields)
        else:
            chosen = tuple(sorted(top))
        walk_cfg = _dc.replace(
            cfg, pk_fields=tuple(f"{root}.{n}" for n in chosen)
        )
    entries: list[Entry] = []
    _walk(root, value_schema, False, 0, (), walk_cfg, entries)

    # ---- group by main container (FlattenTransformation.java:149-157) ---
    groups: dict[tuple[int, ...], tuple[tuple[Container, ...], list[Entry]]] = {}
    for e in entries:
        last_am = None
        for i, c in enumerate(e.containers):
            if c.kind in (ARRAY, MAP):
                last_am = i
        cut = (last_am + 1) if last_am is not None else 1
        chain = e.containers[:cut]
        gid = tuple(id(c) for c in chain)
        groups.setdefault(gid, (chain, []))[1].append(e)

    tables: list[TableSpec] = []
    topic_part = cfg.topic.replace(".", cfg.delimiter).lower()
    for chain, group in groups.values():
        cols: list[ColumnSpec] = []
        merge_keys: list[str] = []
        seen: set[str] = set()

        # 1. key PKs first (FlattenTransformation.java:199-201)
        for kp in key_pks:
            cols.append(kp)
            seen.add(kp.out_name.lower())
            merge_keys.append(kp.out_name)

        # 2. leaf entries in walk order, dup/PK disambiguation
        #    (FlattenTransformation.java:232-251)
        lower_counts: dict[str, int] = {}
        for e in group:
            lower_counts[e.field_name.lower()] = (
                lower_counts.get(e.field_name.lower(), 0) + 1
            )
        for e in group:
            full = lower_counts[e.field_name.lower()] > 1 or e.is_pk
            target = cfg.rename_or_path(e.path, e.field_name, full)
            e.target_name = target
            if target.lower() in seen:
                # the reference's SchemaBuilder.field throws on duplicate
                # field names — surface the same config error eagerly
                raise ValueError(
                    f"column name collision {target!r} in table for container "
                    f"path {'.'.join(c.lname for c in chain)!r}; use "
                    "rename_fields to disambiguate"
                )
            nullable = e.nullable or e.containers[-1].optional
            steps = _leaf_steps(chain, e)
            cols.append(ColumnSpec(target, ("leaf", steps), e.dtype, nullable))
            seen.add(target.lower())
            if e.is_pk:
                merge_keys.append(target)

        # 3. propagated map keys on the chain
        #    (FlattenTransformation.java:262-272)
        for i, c in enumerate(chain):
            for mk in c.map_keys:
                target = cfg.rename_or_path(mk.path, mk.field_name, True)
                if target.lower() in seen or not cols:
                    continue
                cols.append(ColumnSpec(target, ("map_key", i), T.StringType(), True))
                seen.add(target.lower())

        # 4. propagated value PKs on the chain — all become merge keys
        #    (FlattenTransformation.java:276-290)
        for i, c in enumerate(chain):
            for pf in c.pk_fields:
                target = cfg.rename_or_path(pf.path, pf.field_name, True)
                merge_keys.append(target)
                if target.lower() in seen or not cols:
                    continue
                if pf.field_name == "key" and c.kind == MAP:
                    src = ("map_key", i)
                else:
                    src = ("chain_field", i, pf.field_name)
                cols.append(ColumnSpec(target, src, pf.dtype, True))
                seen.add(target.lower())

        # 5. coordinates (FlattenTransformation.java:100-113, 715-721)
        if cfg.coordinates and cols:
            for j, cname in enumerate(cfg.coordinate_fields):
                cols.append(
                    ColumnSpec(
                        cfg.case(cname), ("coord", j), _COORD_TYPES[j], j == 3
                    )
                )

        container_path = ".".join(c.lname for c in chain)
        full_table_name = (
            topic_part
            + cfg.delimiter
            + container_path.replace(".", cfg.delimiter)
        )
        renamed = cfg.rename_tables.get(full_table_name, full_table_name)
        # dedup merge keys, preserve order
        mk_seen: set[str] = set()
        mks = tuple(
            m for m in merge_keys if not (m.lower() in mk_seen or mk_seen.add(m.lower()))
        )
        tables.append(
            TableSpec(
                # rename → case → table.name.format template, the
                # reference writer's destinationTable() order
                # (JdbcDbWriter.java:88,103,233-241)
                table_name=cfg.destination_table(cfg.case(renamed)),
                full_table_name=full_table_name,
                container_path=container_path,
                chain=chain,
                columns=tuple(cols),
                merge_keys=mks,
                key_merge_keys=tuple(k.out_name for k in key_pks),
            )
        )

    return FlattenPlan(tuple(tables), tuple(key_pks), False, cfg)


class PlanCache:
    """Schema-pair → compiled-plan LRU, the reference's instruction
    cache (``FlattenTransformation.java:39-60``; capacity default 100
    from ``flatten.instruction_cache_size``,
    ``JdbcSinkConfig.java:326-332``).

    On Spark the cached artifact is the ``FlattenPlan`` (TableSpecs);
    Catalyst separately caches the physical plan per micro-batch, so
    this only saves the pure-Python schema walk — but a multi-topic
    ingest sees many schema pairs per process, same as the reference.
    """

    def __init__(self, capacity: int = 100):
        self.capacity = capacity
        self._cache: dict[tuple, FlattenPlan] = {}

    @staticmethod
    def _key(key_schema, value_schema, cfg, value_record_name, key_record_name):
        return (
            key_schema.json() if key_schema is not None else None,
            value_schema.json() if value_schema is not None else None,
            repr(sorted(cfg.__dict__.items(), key=lambda kv: kv[0])),
            value_record_name,
            key_record_name,
        )

    def get(
        self,
        key_schema,
        value_schema,
        cfg,
        value_record_name: str | None = None,
        key_record_name: str | None = None,
    ) -> FlattenPlan:
        k = self._key(key_schema, value_schema, cfg, value_record_name, key_record_name)
        plan = self._cache.pop(k, None)
        if plan is None:
            plan = compile_flatten_plan(
                key_schema, value_schema, cfg, value_record_name, key_record_name
            )
            if len(self._cache) >= self.capacity:
                self._cache.pop(next(iter(self._cache)))  # evict oldest
        self._cache[k] = plan  # (re)insert as most recent
        return plan


def _leaf_steps(chain: tuple[Container, ...], e: Entry) -> tuple[str, ...]:
    """Field-access steps from the main-container value to the leaf.

    Residual containers below the main chain are all STRUCTs (the
    chain ends at the LAST array/map).  An ``is_element`` struct is
    the exploded item itself — no field access.  An empty tuple means
    the exploded item IS the leaf (array/map of primitives,
    ``FlattenTransformation.java:505-520, 545-555``).
    """
    residual = e.containers[len(chain) :]
    steps = [c.name for c in residual if not c.is_element]
    if e.containers == chain and chain[-1].kind in (ARRAY, MAP):
        return ()  # the item itself
    steps.append(e.field_name)
    return tuple(steps)
