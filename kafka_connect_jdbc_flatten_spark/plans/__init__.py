from .flatten_plan import (  # noqa: F401
    ColumnSpec,
    Container,
    Entry,
    FlattenPlan,
    TableSpec,
    compile_flatten_plan,
)
