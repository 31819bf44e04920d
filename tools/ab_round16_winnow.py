"""Round-16 A/B: winnow_candidate_pairs — fingerprint relation left
lazy (r15 form: the md5-gram + window + distinct chain recomputes under
the freq-cap aggregate AND both self-join sides) vs pinned once before
fingerprint_candidates. Same session, interleaved, noop-timed, on the
registry query's planted corpus at sf0.1."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import dedup
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def corpus(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 40)
        ).alias("_borrow"),
    )
    twins = docs.join(nxt, "doc_id").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.col("_borrow")).alias("text"),
    )
    return docs.unionAll(twins)


def lazy_q(c):
    state = dedup.positional_gram_state(c, "doc_id", "text", k=8, hash="md5")
    fps = dedup.winnow_fingerprints(state, w=4)
    return dedup.fingerprint_candidates(fps, min_shared=2, max_fp_freq=64)


def pinned_q(c):
    state = dedup.positional_gram_state(c, "doc_id", "text", k=8, hash="md5")
    fps = dedup.winnow_fingerprints(state, w=4).localCheckpoint(eager=True)
    return dedup.fingerprint_candidates(fps, min_shared=2, max_fp_freq=64)


def main() -> None:
    spark = get_session("ab-r16-winnow")
    spark.sparkContext.setLogLevel("ERROR")
    c = corpus(spark)

    a = sorted(map(tuple, lazy_q(c).collect()))
    b = sorted(map(tuple, pinned_q(c).collect()))
    assert a == b, "outputs differ!"
    print(f"outputs identical ({len(a)} rows)")

    def run(fn):
        t0 = time.perf_counter()
        fn(c).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    lazies, pins = [], []
    for _ in range(4):
        lazies.append(run(lazy_q))
        pins.append(run(pinned_q))
    print("lazy:", [round(x, 3) for x in lazies], "min", round(min(lazies), 3))
    print("pin: ", [round(x, 3) for x in pins], "min", round(min(pins), 3))


if __name__ == "__main__":
    main()
