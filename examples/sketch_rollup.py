"""Sketch lifecycle at pipeline scale: persist register/bin state at
ingest, answer later questions by merging partials — never re-reading
raw history.

Run: python examples/sketch_rollup.py [sf_dir]

The pattern (works unchanged on a 1000-executor cluster):
1. each ingest slice (a day here) writes its SKETCH STATE — an HLL
   register table (2^b rows), CMS registers (d x w rows), DDSketch
   bin counts — next to the data it summarizes;
2. any later question over any slice union is a merge of those
   partials: per-bucket MAX (HLL), sums (CMS / DDSketch), bit_or
   (Bloom) — associative and idempotent, so re-runs and replays
   cannot change answers;
3. estimates are deterministic integers/doubles that an external
   DuckDB oracle reproduces bit-for-bit (the registry queries
   hll_*, cms_*, dd_*, bloom_* are the verified forms).
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_fuel_priceguide_ec2_spark.operators import sketches  # noqa: E402
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("sketch-rollup", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf_dir, "events")
    store = Path(tempfile.mkdtemp(prefix="hll_store_")) / "daily_registers"

    # --- ingest time: one register table per day, appended to a store
    days = events.select(F.to_date("ts").alias("day"), "user_id")
    sketches.hll_registers(days, "user_id", ["day"], b=8).write.mode(
        "overwrite"
    ).parquet(str(store))
    n_parts = spark.read.parquet(str(store)).count()
    print(f"persisted {n_parts} (day, register) rows to {store}")

    # --- query time: any rollup is a merge of partials
    regs = spark.read.parquet(str(store))
    total = sketches.hll_estimate(sketches.hll_merge(regs.drop("day")), b=8)
    print("all-time distinct users:", total.collect()[0].asDict())

    weekly = sketches.hll_estimate(
        sketches.hll_merge(
            regs.withColumn("week", F.date_trunc("week", "day").cast("date")).drop(
                "day"
            ),
            ["week"],
        ),
        ["week"],
        b=8,
    )
    print("per-week distinct users:")
    for r in weekly.orderBy("week").collect():
        print("  ", r.asDict())

    # sanity: the merged all-time estimate is bit-identical to
    # sketching the raw history directly (associativity)
    direct = sketches.hll_cardinality(events, "user_id", b=8).collect()[0]
    merged = total.collect()[0]
    assert merged.n_distinct_est == direct.n_distinct_est
    print("merged == direct:", merged.n_distinct_est)

    # --- round 6: per-SEGMENT KMV stores answer overlap questions ---
    # each audience segment persists its k smallest user hashes; any
    # pairwise intersection / jaccard / difference later is sketch
    # algebra (kmv_intersection_report joins <= k-row relations).
    kmv_store = Path(tempfile.mkdtemp(prefix="kmv_store_"))
    for seg, flt in [
        ("clickers", F.col("event_type") == "click"),
        ("viewers", F.col("event_type") == "view"),
    ]:
        sketches.kmv_sketch(events.filter(flt), "user_id", k=256).write.mode(
            "overwrite"
        ).parquet(str(kmv_store / seg))
    rep = sketches.kmv_intersection_report(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "view"),
        "user_id",
        "user_id",
        k=256,
    ).collect()[0]
    print("segment overlap (clickers vs viewers):", rep.asDict())

    # --- round 6: daily DDSketch bins roll up to a monthly median ---
    daily_bins = sketches.dd_registers(
        events.select(F.to_date("ts").alias("day"), "value"), "value", ["day"]
    )
    monthly = sketches.dd_estimate(
        sketches.dd_merge(
            daily_bins.withColumn(
                "month", F.date_trunc("month", "day").cast("date")
            ).drop("day"),
            ["month"],
        ),
        (0.5, 0.9),
        ["month"],
    )
    print("per-month value quantiles from merged daily bins:")
    for r in monthly.orderBy("month", "q").collect():
        print("  ", r.asDict())


if __name__ == "__main__":
    main()
