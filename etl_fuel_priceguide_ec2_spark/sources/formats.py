"""Multi-format IO: CSV / JSON-lines / ORC / parquet with codec control.

The reference speaks JSON over HTTP and writes to DynamoDB; an engine
replacing it must ingest and emit the common interchange formats. All
readers take explicit schemas (schema inference is a full extra pass at
100 TB — never in production paths) and run through the same DataFrame
surface, so every operator works on every format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

WRITERS = {
    "parquet": lambda df, p, o: df.write.options(**o).mode("overwrite").parquet(p),
    "orc": lambda df, p, o: df.write.options(**o).mode("overwrite").orc(p),
    "json": lambda df, p, o: df.write.options(**o).mode("overwrite").json(p),
    "csv": lambda df, p, o: df.write.options(**o).option("header", "true").mode("overwrite").csv(p),
}


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options: str) -> None:
    """Write with explicit format/codec (e.g. compression='zstd')."""
    WRITERS[fmt](df, path, options)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: StructType | str
) -> DataFrame:
    """Schema-explicit read — no inference pass. CSV/JSON parse in
    PERMISSIVE mode: malformed rows null out instead of failing (P6).
    Unknown formats raise (code-review r16): the old silent parquet
    fallback turned a typo'd fmt into a corrupt-footer error — or a
    wrong-but-successful read — far from the call site, asymmetric
    with write_table's KeyError."""
    if fmt not in WRITERS:
        raise KeyError(
            f"read_table: unknown format {fmt!r}; known: {sorted(WRITERS)}"
        )
    r = spark.read.schema(schema)
    if fmt == "csv":
        return r.option("header", "true").option("mode", "PERMISSIVE").csv(path)
    if fmt == "json":
        return r.option("mode", "PERMISSIVE").json(path)
    if fmt == "orc":
        return r.orc(path)
    return r.parquet(path)
