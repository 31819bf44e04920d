"""Round-16 A/B: domain_classifier_labels — the corpus featurization
(tokenize + unigram/bigram explode) left lazy (r15 form: it recomputes
under BOTH the per-doc count aggregate and the matched-weight
aggregate, 2 corpus featurization passes) vs pinned once. Same session,
interleaved, noop-timed, on the registry query's lexicon at sf0.1."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import textops
from etl_fuel_priceguide_ec2_spark.registry.curation import _DOMAIN_LEXICON, _QC_BUCKETS
from etl_fuel_priceguide_ec2_spark.session import get_session
from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def build(spark):
    docs = load_table(spark, SF_DIR, "documents")
    lex = spark.createDataFrame(
        [(c, t, str(w)) for c, t, w in _DOMAIN_LEXICON],
        "class string, term string, weight string",
    ).selectExpr("class", "term", "CAST(weight AS DECIMAL(12,6)) AS weight")
    w = textops.domain_classifier_weights(lex, n_buckets=_QC_BUCKETS)
    return docs, w


def q(docs, w, pin: bool):
    feats = textops.classifier_features(docs, "doc_id", "text", _QC_BUCKETS)
    if pin:
        feats = feats.localCheckpoint(eager=True)
    return textops.domain_classifier_labels(
        docs, "doc_id", "text", w, n_buckets=_QC_BUCKETS, features=feats
    )


def main() -> None:
    spark = get_session("ab-r16-domcls")
    spark.sparkContext.setLogLevel("ERROR")
    docs, w = build(spark)

    base = sorted(
        map(
            tuple,
            textops.domain_classifier_labels(
                docs, "doc_id", "text", w, n_buckets=_QC_BUCKETS
            ).collect(),
        )
    )
    a = sorted(map(tuple, q(docs, w, False).collect()))
    b = sorted(map(tuple, q(docs, w, True).collect()))
    assert a == base and b == base, "outputs differ!"
    print(f"outputs identical ({len(base)} rows)")

    def run(p):
        t0 = time.perf_counter()
        q(docs, w, p).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    lazies, pins = [], []
    for _ in range(4):
        lazies.append(run(False))
        pins.append(run(True))
    print("lazy:", [round(x, 3) for x in lazies], "min", round(min(lazies), 3))
    print("pin: ", [round(x, 3) for x in pins], "min", round(min(pins), 3))


if __name__ == "__main__":
    main()
