"""Engine configuration.

Mirrors the flatten-relevant subset of the reference's sink config
(``JdbcSinkConfig.java``): key names, defaults and parsing semantics
are reproduced so a user of the reference can carry their config over.
Citations: flatten keys ``JdbcSinkConfig.java:253-332``, coordinates
defaults ``:261-279``, pk mode/fields ``:144-171``, insert mode
``:133-139``, delete ``:116-118``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_COORDINATE_FIELDS = (
    # JdbcSinkConfig.java:272-273 (FIELDS_COORDINATES_DEFAULT)
    "kafkatopic",
    "kafkapartition",
    "kafkaoffset",
    "kafkatimestamp",
    "kafkatimestamp_type",
)


@dataclass(frozen=True)
class FlattenConfig:
    """Flatten + apply configuration.

    Paths in ``pk_fields`` / ``pk_propagate_value_fields`` /
    ``containers_whitelist`` / ``rename_fields`` keys are dotted,
    lower-case container paths exactly as the reference expects them
    (``README.md:153-158``: array fields are referenced by repeating
    the containing field name per array level).
    """

    topic: str = "topic"
    delimiter: str = "_"  # flatten.delimiter, JdbcSinkConfig.java:304-309
    uppercase: bool = False  # flatten.uppercase, :296-301
    coordinates: bool = False  # flatten.coordinates, :261-267
    coordinate_fields: tuple[str, ...] = DEFAULT_COORDINATE_FIELDS
    containers_whitelist: frozenset[str] = frozenset()  # :319-325
    rename_fields: dict[str, str] = field(default_factory=dict)  # :280-287
    rename_tables: dict[str, str] = field(default_factory=dict)  # :288-295
    # "none" | "flatten" | "kafka" | "record_key" | "record_value"
    # (PrimaryKeyMode, JdbcSinkConfig.java:55-61, :144-171)
    pk_mode: str = "none"
    pk_fields: tuple[str, ...] = ()
    # table.name.format (JdbcSinkConfig.java:89, default "${topic}"):
    # every destination table name — the topic in non-flatten mode AND
    # each flatten-produced (possibly renamed) table name — passes
    # through destinationTable(), which substitutes it for "${topic}"
    # in this template (JdbcDbWriter.java:88,103,208,233-241).  The
    # template's literal parts are used verbatim (not case-forced);
    # an empty result raises, mirroring the ConnectException.
    table_name_format: str = "${topic}"
    pk_propagate_value_fields: tuple[str, ...] = ()  # :312-318
    delete_enabled: bool = False  # :116-118
    insert_mode: str = "upsert"  # "insert" | "update" | "upsert"  (:133-139)
    # non-flatten-mode value-field whitelist (fields.whitelist,
    # JdbcSinkConfig.java:188-196 / FieldsMetadata.java:144-146): when
    # set, only leaves whose SIMPLE field name is listed survive; PK
    # fields always survive (the reference adds them back)
    fields_whitelist: frozenset[str] = frozenset()
    # plan-cache capacity (flatten.instruction_cache_size,
    # JdbcSinkConfig.java:326-332)
    instruction_cache_size: int = 100
    # auto.create / auto.evolve (JdbcSinkConfig.java:124-131): when
    # disabled, a missing table / missing columns raise instead of
    # DDL-ing (DbStructure.java:105-110, 190-197)
    auto_create: bool = True
    auto_evolve: bool = True

    def case(self, name: str) -> str:
        """Case-force a name (``FlattenTransformation.java:723-725``)."""
        return name.upper() if self.uppercase else name.lower()

    def destination_table(self, name: str) -> str:
        """Apply the ``table.name.format`` template to a (renamed,
        case-forced) table name — ``JdbcDbWriter.java:233-241``.
        Precedence matches the reference writer: rename map first
        (``:103``), then case forcing, then the template substitution;
        an empty result raises like the ConnectException (``:235-240``)."""
        out = self.table_name_format.replace("${topic}", name)
        if not out:
            raise ValueError(
                f"Destination table name for topic {name!r} is empty using "
                f"the format string {self.table_name_format!r} "
                "(table.name.format, JdbcDbWriter.java:233-241)"
            )
        return out

    def rename_or_path(self, path: str, field_name: str, full_path: bool) -> str:
        """Target-name rule (``FlattenTransformation.java:727-736``).

        Rename map is keyed on ``path.fieldname`` (dotted, lower);
        a configured rename is returned verbatim.  Otherwise full-path
        names join the dotted path with the delimiter.
        """
        key = f"{path}.{field_name.lower()}" if path else f".{field_name.lower()}"
        if key in self.rename_fields:
            return self.rename_fields[key]
        if full_path:
            return self.case(
                path.replace(".", self.delimiter) + self.delimiter + field_name
            )
        return self.case(field_name)
