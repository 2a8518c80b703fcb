"""One-pass table profiling — the data-quality dashboard for pipeline ops.

Before a 100 TB corpus goes into dedup/filter/mix, operators want per-column
health: null fractions, cardinalities, value ranges. This computes ALL of it
in a single aggregation pass (one job, one scan), then unpivots the one-row
result to a tidy (column, stat) table driver-side — the unpivot runs on one
row, so it is free.

Scale note: ``exact=True`` uses ``countDistinct`` — Catalyst plans one
Expand over the scan (input × #distinct-aggs), which is exact but heavy at
petabyte scale. ``exact=False`` switches to ``approx_count_distinct`` (HLL,
single pass, no Expand) — the right default for 100 TB where cardinality is
a dashboard number, not a gate. Min/max are computed on the NATIVE type and
cast to string afterwards, so numeric columns range numerically ('9' < '10')
rather than lexicographically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: all) in one aggregation pass.

    Returns one row per column: ``col_name, n_rows, n_nulls, n_distinct,
    min_s, max_s`` (min/max rendered as strings after native-type
    comparison), ordered by column name.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    for c in cols:
        # names are spliced into a selectExpr stack() — reject the two
        # characters that would break out of the string/backtick quoting
        if "'" in c or "`" in c:
            raise ValueError(f"unsupported character in column name: {c!r}")
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__{c}__nulls"))
        aggs.append(distinct(col).cast("long").alias(f"__{c}__distinct"))
        aggs.append(F.min(col).cast("string").alias(f"__{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"__{c}__max"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__{c}__nulls`, `__{c}__distinct`, `__{c}__min`, `__{c}__max`"
        for c in cols
    )
    return (
        one.selectExpr(
            "__n_rows",
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_s, max_s)",
        )
        .select(
            "col_name",
            F.col("__n_rows").alias("n_rows"),
            "n_nulls",
            "n_distinct",
            "min_s",
            "max_s",
        )
        .orderBy("col_name")
    )
