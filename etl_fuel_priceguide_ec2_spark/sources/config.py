"""S1 — parameter/config source.

Reference semantics (``index.js:385-410``): recursive fetch of config
keys under a path prefix (``/fuelpriceguide/``) from a parameter store,
positionally destructured into table names + endpoints
(``index.js:29-38``).

Spark equivalent: job configuration travels in ``spark.conf`` (set by
``spark-submit --conf`` or the session builder); a prefix scan replaces
the recursive SSM lookup. A config TABLE (key/value parquet read at
startup) is also supported for deployments where config is data.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def load_config(
    spark: SparkSession,
    prefix: str,
    defaults: dict[str, str] | None = None,
    required: list[str] | None = None,
) -> dict[str, str]:
    """Collect all ``spark.conf`` keys under ``prefix`` (dot-separated),
    returned with the prefix stripped. Missing ``required`` keys raise —
    the reference fails the run when a parameter is absent."""
    out = dict(defaults or {})
    prefix = prefix.rstrip(".") + "."
    # spark-submit --conf values live on the SparkConf...
    for k, v in spark.sparkContext.getConf().getAll():
        if k.startswith(prefix):
            out[k[len(prefix) :]] = v
    # ...runtime values (spark.conf.set) on the per-session SQLConf.
    # Enumerate them via SET (the one public listing of explicitly-set
    # session confs) so a runtime key OUTSIDE defaults/required is
    # collected too — previously only already-known keys were probed
    # and novel spark.conf.set values were silently missed
    # (code-review r16)
    for row in spark.sql("SET").collect():
        if row[0].startswith(prefix):
            out[row[0][len(prefix) :]] = row[1]
    # ...and probe known keys directly, runtime wins
    for k in set(out) | set(required or []):
        try:
            out[k] = spark.conf.get(prefix + k)
        except Exception:
            pass
    missing = [k for k in required or [] if k not in out]
    if missing:
        raise KeyError(f"missing required config keys under {prefix!r}: {missing}")
    return out


def load_config_table(spark: SparkSession, path: str, key_col: str = "key", value_col: str = "value") -> dict[str, str]:
    """Config-as-data: read a small key/value table (one driver-side
    collect of a tiny relation — the Spark analogue of the SSM scan)."""
    rows = spark.read.parquet(path).select(key_col, value_col).collect()
    return {r[0]: r[1] for r in rows}
