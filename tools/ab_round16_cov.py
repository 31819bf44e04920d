"""Round-16 A/B: embedding_covariance_from_state — r15 form (three
filter-per-slice state passes, lazy union consumed by every downstream
reference) vs the one-pass slice_col form (+ pinned 3d-row si state).
Same session, interleaved, noop-timed."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import embeddings as _emb
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def old_cov(spark, emb):
    sij_slices = None
    si_slices = None
    for k in range(3):
        s = emb.filter(F.col("vec_id") % 3 == k)
        sij = _emb.embedding_second_moment_state(s, "vec_id", "embedding")
        si = _emb.embedding_first_moment_state(s, "vec_id", "embedding")
        sij_slices = sij if sij_slices is None else sij_slices.unionByName(sij)
        si_slices = si if si_slices is None else si_slices.unionByName(si)
    return _emb.embedding_covariance_from_state(sij_slices, si_slices)


def new_cov(spark, emb):
    e = emb.withColumn("_slice", (F.col("vec_id") % 3).cast("long"))
    sij = _emb.embedding_second_moment_state(
        e, "vec_id", "embedding", slice_col="_slice"
    )
    si = _emb.embedding_first_moment_state(
        e, "vec_id", "embedding", slice_col="_slice"
    )
    si = si.localCheckpoint(eager=True)
    return _emb.embedding_covariance_from_state(sij, si)


def main() -> None:
    spark = get_session("ab-r16-cov")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")

    a = sorted(map(tuple, old_cov(spark, emb).collect()))
    b = sorted(map(tuple, new_cov(spark, emb).collect()))
    assert a == b, "outputs differ!"
    print(f"outputs identical ({len(a)} rows)")

    # also pin the intermediate STATES' equality (the stronger claim)
    sa = sorted(
        map(
            tuple,
            _emb.embedding_second_moment_state(
                emb.filter(F.col("vec_id") % 3 == 1), "vec_id", "embedding"
            ).collect(),
        )
    )
    sb = sorted(
        map(
            tuple,
            _emb.embedding_second_moment_state(
                emb.withColumn("_slice", (F.col("vec_id") % 3).cast("long")),
                "vec_id",
                "embedding",
                slice_col="_slice",
            )
            .filter(F.col("_slice") == 1)
            .drop("_slice")
            .collect(),
        )
    )
    assert sa == sb, "slice-1 second-moment state differs!"
    print(f"slice-1 sij state identical ({len(sa)} rows)")

    def run(fn):
        t0 = time.perf_counter()
        fn(spark, emb).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    olds, news = [], []
    for _ in range(4):
        olds.append(run(old_cov))
        news.append(run(new_cov))
    print("old:", [round(x, 3) for x in olds], "min", round(min(olds), 3))
    print("new:", [round(x, 3) for x in news], "min", round(min(news), 3))


if __name__ == "__main__":
    main()
