"""Local scaling study for the TPC-H tier: time the heavy round-4
shapes at sf0.001 / sf0.01 / sf0.1 (1x / 10x / 100x lineitem) in ONE
session and fit the per-decade scaling exponent alpha
(t ~ input^alpha). alpha <= 1 means the plan scales at-or-below linear
in input; fixed driver/JVM overhead dominates the small SFs, so the
meaningful slope is the last decade (0.01 -> 0.1).

Run: python tools/scale_study_tpch.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_fuel_priceguide_ec2_spark import registry  # noqa: E402
from etl_fuel_priceguide_ec2_spark.session import get_session  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
QUERIES = [
    "q6_forecast_revenue",
    "q9_product_type_profit",
    "q16_part_supplier_variety",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
]
REPS = 3


def main() -> None:
    spark = get_session("scale-study-tpch")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    qs["projection_rename"](spark, SFS[0]).write.format("noop").mode("overwrite").save()

    results: dict[str, list[float]] = {}
    for name in QUERIES:
        times = []
        for sf_dir in SFS:
            reps = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                reps.append(time.perf_counter() - t0)
            times.append(round(min(reps), 3))
        results[name] = times
        # last-decade slope: the one fixed overhead doesn't drown
        alpha = math.log(times[2] / times[1]) / math.log(10)
        print(
            json.dumps(
                {
                    "query": name,
                    "sec_at_1x_10x_100x": times,
                    "alpha_last_decade": round(alpha, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
