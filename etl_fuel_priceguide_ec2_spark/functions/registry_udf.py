"""§2.8 — the user-extensible function surface.

The reference has no function registry (all logic is inline JS); the
engine exposes Spark's three extension points, each wired for SQL use:

  * scalar pandas UDF  — vectorized, Arrow-batched
  * grouped UDAF       — applyInPandas over groups (custom aggregates)
  * UDTF (Spark 4)     — table function usable in FROM clauses

Hot paths stay on built-ins (see functions/scalar.py); these exist for
the cases where user logic genuinely can't be expressed in Catalyst.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def norm_price(v: pd.Series) -> pd.Series:
    """Vectorized scalar UDF example: price normalized to [0, 1] by a
    fixed domain cap (deterministic, Arrow-batched)."""
    return (v.clip(lower=0.0, upper=200000.0) / 200000.0).astype("float64")


def register_all(spark: SparkSession) -> None:
    """Make the functions callable from SQL."""
    spark.udf.register("norm_price", norm_price)
    spark.udtf.register("explode_ngrams", ExplodeNgrams)


@udtf(returnType="ngram: string, pos: int")
class ExplodeNgrams:
    """UDTF: emit word n-grams of a string with positions — usable as
    ``SELECT t.* FROM explode_ngrams('a b c', 2) t`` or via LATERAL
    join. (Python UDTFs run row-at-a-time; the JVM-side equivalent for
    hot paths is the transform/slice pattern in operators/dedup.py.)"""

    def eval(self, text: str, n: int):
        toks = [t for t in (text or "").split() if t]
        for i in range(max(len(toks) - n + 1, 0)):
            yield (" ".join(toks[i : i + n]), i)


def trend_slope_per_group(
    df: DataFrame, key_cols: list[str], x_col: str, y_col: str
) -> DataFrame:
    """Grouped custom aggregate (UDAF via applyInPandas): least-squares
    slope of y over x per group — e.g. each station's price trend.
    Deterministic: rows are sorted inside the group before the fit, and
    each group is computed by exactly one task."""
    out_schema = ", ".join(f"{k} bigint" for k in key_cols) + ", slope double, n_points bigint"

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values([x_col])
        x = pdf[x_col].astype("int64").to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        if len(x) < 2 or np.all(x == x[0]):
            slope = float("nan")
        else:
            xm, ym = x.mean(), y.mean()
            slope = float(((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum())
        keys = {k: pdf[k].iloc[0] for k in key_cols}
        return pd.DataFrame([{**keys, "slope": slope, "n_points": len(x)}])

    return df.groupBy(*key_cols).applyInPandas(_fit, out_schema)
