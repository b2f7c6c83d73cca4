"""Fixed-benchmark decontamination scaling measurement (VERDICT r10 #3).

``dedup_decontaminate``'s registered form draws the eval slice from the
SAME corpus it scans (source = src0 ≈ 5% of rows), so the scratch
generator grows the eval side with the corpus and the measured exponent
(1.00 at round 10) conflates two growths. Production decontamination
has the opposite shape: the benchmark set is FIXED (a few hundred eval
suites) while the train corpus grows without bound — the claimed
sublinear exponent has only ever been inferred from that argument.

This harness measures it: the eval shingle relation is pinned to ONE
corpus (the sf0.1 scratch src0 slice, ~constant rows regardless of the
scanned scale) while the train side comes from the scaled sf_dir. Same
plan as the registered query otherwise (distinct word-trigram shingles,
equi-join on the shingle, >= DECONTAM_MIN_SHARED distinct shared,
per-train-doc rollup). Timing protocol matches bench.py: one untimed
warm pass, then min of three timed passes through the noop sink.

Usage: python tools/decontam_fixed_eval.py SCALED_SF_DIR [EVAL_SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from content_analytics_etl_spark.operators.dedup import shingle_rows  # noqa: E402
from content_analytics_etl_spark.plans.dedup_queries import (  # noqa: E402
    DECONTAM_EVAL_SOURCE,
    DECONTAM_MIN_SHARED,
)
from content_analytics_etl_spark.plans._util import t  # noqa: E402
from content_analytics_etl_spark.session import get_spark  # noqa: E402


def build(spark, train_dir: str, eval_dir: str):
    tr_docs = t(spark, train_dir, "documents")
    ev_docs = t(spark, eval_dir, "documents")
    ev = (
        shingle_rows(
            ev_docs.filter(F.col("source") == DECONTAM_EVAL_SOURCE),
            ["doc_id"],
        )
        .select("shingle", F.col("doc_id").alias("eval_id"))
    )
    tr = (
        shingle_rows(
            tr_docs.filter(F.col("source") != DECONTAM_EVAL_SOURCE),
            ["doc_id"],
        )
        .select("shingle", F.col("doc_id").alias("train_id"))
    )
    ov = tr.join(ev, "shingle").groupBy("train_id", "eval_id").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    return (
        ov.filter(F.col("n_shared") >= DECONTAM_MIN_SHARED)
        .groupBy(F.col("train_id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_eval_hits"),
            F.max("n_shared").alias("max_shared"),
        )
    )


def main() -> None:
    train_dir = sys.argv[1]
    eval_dir = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf0.1"
    spark = get_spark("decontam-fixed-eval")
    spark.sparkContext.setLogLevel("ERROR")
    df = build(spark, train_dir, eval_dir)
    df.write.format("noop").mode("overwrite").save()  # warm pass
    best = None
    for _ in range(3):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    n_train = (
        t(spark, train_dir, "documents")
        .filter(F.col("source") != DECONTAM_EVAL_SOURCE)
        .count()
    )
    n_eval = (
        t(spark, eval_dir, "documents")
        .filter(F.col("source") == DECONTAM_EVAL_SOURCE)
        .count()
    )
    print(
        json.dumps(
            {
                "train_dir": train_dir,
                "eval_dir": eval_dir,
                "n_train_docs": n_train,
                "n_eval_docs": n_eval,
                "flagged_rows": df.count(),
                "warm_min3_sec": round(best, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
