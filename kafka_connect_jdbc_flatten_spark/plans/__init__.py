from .flatten_plan import (  # noqa: F401
    ColumnSpec,
    Container,
    Entry,
    FlattenPlan,
    PlanCache,
    TableSpec,
    compile_flatten_plan,
)
