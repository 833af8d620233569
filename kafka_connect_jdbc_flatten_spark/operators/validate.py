"""Record validation — the reference's ``RecordValidator``
(``RecordValidator.java:45-132``):

* delete (null value) requires a non-null key, else the record is
  rejected;
* non-delete requires a (struct) value;
* when deletes are disabled, null-value records are rejected outright.

On Spark this is a declarative split of the micro-batch into
(valid, violations); ``expect_valid`` raises like the reference's
``ConnectException`` path for fail-fast pipelines, while
``split_valid`` supports dead-letter routing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VIOLATION_COL = "__violation"


def _violation_expr(delete_enabled: bool):
    is_delete = F.col("value").isNull()
    null_key = F.col("key").isNull()
    if delete_enabled:
        return F.when(
            is_delete & null_key,
            F.lit("tombstone with null key (RecordValidator.java:60-74)"),
        )
    return F.when(
        is_delete,
        F.lit("null value with delete.enabled=false (RecordValidator.java:83-97)"),
    ).when(null_key, F.lit("null key"))


def split_valid(
    changelog: DataFrame, delete_enabled: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Return (valid, violations); violations carry a reason column."""
    tagged = changelog.withColumn(
        VIOLATION_COL, _violation_expr(delete_enabled)
    )
    valid = tagged.filter(F.col(VIOLATION_COL).isNull()).drop(VIOLATION_COL)
    bad = tagged.filter(F.col(VIOLATION_COL).isNotNull())
    return valid, bad


def expect_valid(changelog: DataFrame, delete_enabled: bool = True) -> DataFrame:
    """Fail-fast validation: raises ValueError with a sample of the
    offending records, mirroring the reference's ConnectException."""
    valid, bad = split_valid(changelog, delete_enabled)
    sample = bad.select("topic", "partition", "offset", VIOLATION_COL).take(5)
    if sample:
        raise ValueError(
            f"invalid records in batch (first {len(sample)}): "
            + "; ".join(
                f"{r['topic']}[{r['partition']}]@{r['offset']}: {r[VIOLATION_COL]}"
                for r in sample
            )
        )
    return valid
