"""F1–F7 — the scalar-function battery the reference exercises.

  F1 now()                  -> current_timestamp() (or a fixed literal
                               for deterministic runs)
  F2 ts -> 'YYYY-MM-DD HH:mm:ss'  -> date_format (index.js:311,336,364-365)
  F3 diff minutes           -> floor(epoch-second delta / 60) (index.js:56)
  F4 string concat (URL)    -> concat (index.js:114)
  F5 JSON serialize/extract -> to_json / get_json_object (index.js:31,65)
  F6 null test              -> isNotNull (index.js:118-120)
  F7 equality dispatch      -> when/otherwise (index.js:269)

All are built-in Catalyst expressions — no UDFs anywhere in the battery.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def format_ts(col: Column | str) -> Column:
    """F2: format a timestamp as the reference's string form."""
    return F.date_format(col, TS_FMT)


def minutes_between(start: Column | str, end: Column | str) -> Column:
    """F3: whole minutes between two timestamps — floor of the
    epoch-second delta / 60 (portable: identical in DuckDB, unlike
    boundary-counting date_diff semantics)."""
    return F.floor((F.unix_timestamp(end) - F.unix_timestamp(start)) / 60)


def url_for_id(endpoint: str, id_col: Column | str) -> Column:
    """F4: detail-endpoint URL building, ``ENDPOINT_02 + id``
    (index.js:114)."""
    return F.concat(F.lit(endpoint), F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string"))


def json_field(col: Column | str, path: str) -> Column:
    """F5 (read side): extract a JSON field as string; cast at call
    site. ``get_json_object`` stays JVM-side."""
    return F.get_json_object(col, path)
