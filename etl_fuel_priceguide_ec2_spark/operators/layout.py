"""Data-layout optimization: Z-order (Morton) curve clustering.

Not in the reference (a row-store ETL); extension-tier. At 100 TB the
single biggest scan-cost lever after partitioning is ROW-GROUP pruning:
parquet readers skip row groups whose min/max stats exclude the
predicate. A table sorted by one column prunes only that column;
sorting by the interleaved bits of TWO (or more) columns (the Z-order
curve — Morton 1966; the same layout Delta/Iceberg OPTIMIZE ZORDER
writes) gives every clustered column bounded per-row-group ranges, so
selective predicates on ANY of them skip most of the file.

Everything here is exact integer arithmetic (rank-normalize to b bits
via bounded-domain scaling, interleave with shift/mask sums), built as
one codegen expression — no UDFs, and the DuckDB oracle replays the
curve values bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_expr(col: str, vmin: str, vmax: str, bits: int) -> str:
    """SQL text: map col into [0, 2^bits) by bounded-domain scaling —
    ((v - min) * (2^bits - 1)) DIV (max - min), integer end-to-end
    (DIV truncates identically in Spark and DuckDB for non-negative
    operands). Degenerate domains (max == min) map to 0."""
    top = (1 << bits) - 1
    return (
        f"CASE WHEN {vmax} = {vmin} THEN 0 "
        f"ELSE (({col} - {vmin}) * {top}) DIV ({vmax} - {vmin}) END"
    )


def _interleave_expr(xs: list[str], bits: int) -> str:
    """SQL text: Morton-interleave the given b-bit non-negative
    integer expressions — bit i of input j lands at position
    i * n_inputs + j. A flat sum of shift/mask terms: codegen-native,
    no HOF fold (the sketch-tier lesson), identical in both engines."""
    n = len(xs)
    terms = []
    for j, x in enumerate(xs):
        for i in range(bits):
            terms.append(
                f"(shiftleft(CAST(shiftright({x}, {i}) AS BIGINT) & 1, {i * n + j}))"
            )
    return " + ".join(terms)


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
) -> Column:
    """Column: the Z-order curve value of ``cols`` (each rank-scaled
    to ``bits`` bits from its min/max over ``df``, then interleaved).
    ``len(cols) * bits`` must fit 63 bits. The min/max bounds are
    computed once (a tiny driver aggregate — the same pattern as
    tfidf's N) and inlined as literals so the expression is pure
    per-row codegen."""
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a BIGINT")
    row = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    ).collect()[0]
    normed = [
        _norm_expr(c, str(row[f"_min_{c}"]), str(row[f"_max_{c}"]), bits)
        for c in cols
    ]
    return F.expr(_interleave_expr([f"({n})" for n in normed], bits))


def zorder_sql(
    table: str,
    cols: list[str],
    bits: int = 16,
) -> str:
    """DuckDB SELECT producing ``table.* + z`` with the same curve
    value — value-identical to ``zorder_value`` because both scale
    from the identical integer bounds (computed in a cross-joined
    1-row CTE here, inlined as literals on the Spark side). DuckDB
    spells the shifts as << / >> — the operators Spark's
    shiftleft/shiftright compile to."""
    n = len(cols)
    bounds = ", ".join(f"MIN({c}) AS min_{c}, MAX({c}) AS max_{c}" for c in cols)
    top = (1 << bits) - 1
    normed = []
    for c in cols:
        normed.append(
            f"(CASE WHEN b.max_{c} = b.min_{c} THEN 0 "
            f"ELSE ((t.{c} - b.min_{c}) * {top}) // (b.max_{c} - b.min_{c}) END)"
        )
    terms = []
    for j, x in enumerate(normed):
        for i in range(bits):
            terms.append(f"((({x} >> {i}) & 1) << {i * n + j})")
    z = " + ".join(terms)
    return (
        f"SELECT t.*, CAST({z} AS BIGINT) AS z "
        f"FROM {table} t CROSS JOIN (SELECT {bounds} FROM {table}) b"
    )


def zorder_sort(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """``df`` globally sorted by its Z-order value — the write-side
    clustering step: ``zorder_sort(df, ["k1", "k2"]).write.parquet``
    yields row groups whose min/max stats are tight on BOTH columns.
    A range-partitioned sort (one shuffle), exactly what any other
    global write-order costs."""
    return df.orderBy(zorder_value(df, cols, bits))
