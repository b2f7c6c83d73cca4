"""Skew fixtures the synthetic testdata doesn't contain (VERDICT r3 #7):
a boilerplate trigram present in 90% of documents and a join key at
~100× the median frequency. SCALE.md argues these shapes are safe by
plan construction; this file pins the claims with fixtures:

- ``doc_ngram_scrub`` must stay oracle-exact when one trigram's posting
  list covers 90% of the corpus (the hot-trigram join is 1:1 per start
  occurrence — linear, and the scrub masks exactly the hot span);
- ``dedup_ngram_jaccard_prefix`` must stay row-identical to the plain
  inverted-index form when a stop-shingle's posting list would be
  quadratic — the prefix filter drops the hot shingle from every
  prefix, so parity under THIS fixture is the theorem actually earning
  its keep;
- ``salted_join`` must spread the hot key's rows over multiple shuffle
  partitions (the no-single-giant-task property a plain hash join
  loses), while staying row-identical to the plain join.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from content_analytics_etl_spark.plans.dedup_queries import (
    dedup_ngram_jaccard,
    dedup_ngram_jaccard_prefix,
)
from content_analytics_etl_spark.plans.registry import all_oracles, all_queries
from content_analytics_etl_spark.plans.text_queries import SCRUB_MIN_DF

BOILERPLATE = "foo bar baz"  # one trigram, hot by construction
N_DOCS = 200
CLONES = (1, 11, 21)  # identical bodies → guaranteed jaccard pairs


def _doc_text(i: int) -> str:
    if i in CLONES:
        body = "alpha beta gamma delta epsilon zeta eta theta"
    else:
        body = " ".join(f"u{i}w{k}" for k in range(8))
    # 90% of docs lead with the boilerplate span (doc_id % 10 != 0)
    return f"{BOILERPLATE} {body}" if i % 10 else body


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory) -> str:
    """A sf_dir-shaped directory holding the skewed corpus."""
    out = tmp_path_factory.mktemp("skew_sf")
    docs = spark.createDataFrame(
        [
            (i, _doc_text(i), "en", f"src{i % 5}", len(_doc_text(i)))
            for i in range(N_DOCS)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(str(out / "documents.parquet"))

    # events: one type at ~100× the median of the other four
    hot = spark.range(2000).selectExpr(
        "id AS event_id",
        "timestamp_micros(CAST(1700000000000000 + id * 1000000 AS LONG)) AS ts",
        "id % 97 AS user_id",
        "'view' AS event_type",
        "CAST(id % 13 AS DOUBLE) AS value",
        "'{}' AS props",
    )
    cold = spark.range(80).selectExpr(
        "id + 2000 AS event_id",
        "timestamp_micros(CAST(1700000000000000 + id * 1000000 AS LONG)) AS ts",
        "id % 97 AS user_id",
        "element_at(array('click','buy','scroll','share'), CAST(id % 4 AS INT) + 1) AS event_type",
        "CAST(id % 13 AS DOUBLE) AS value",
        "'{}' AS props",
    )
    hot.unionByName(cold).coalesce(1).write.parquet(str(out / "events.parquet"))
    return str(out)


def test_ngram_scrub_oracle_exact_under_hot_trigram(spark, skew_dir):
    got = {
        tuple(
            round(v, 9) if isinstance(v, float) else v for v in r
        )
        for r in all_queries()["doc_ngram_scrub"](spark, skew_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{skew_dir}/documents.parquet/*.parquet')"
    )
    oracle = con.execute(all_oracles()["doc_ngram_scrub"]).fetchall()
    want = {
        tuple(round(v, 9) if isinstance(v, float) else v for v in r)
        for r in oracle
    }
    assert got == want

    # and the hot span was really scrubbed: every boilerplate doc lost
    # exactly its 3-token lead-in (clone bodies stay below SCRUB_MIN_DF)
    by_doc = {
        r["doc_id"]: r["n_masked"]
        for r in all_queries()["doc_ngram_scrub"](spark, skew_dir).collect()
    }
    assert sum(1 for i in range(N_DOCS) if i % 10) > SCRUB_MIN_DF
    for i in range(N_DOCS):
        assert by_doc[i] == (3 if i % 10 else 0), f"doc {i}"


def test_prefix_filter_parity_under_hot_shingle(spark, skew_dir):
    plain = {tuple(r) for r in dedup_ngram_jaccard(spark, skew_dir).collect()}
    prefix = {
        tuple(r) for r in dedup_ngram_jaccard_prefix(spark, skew_dir).collect()
    }
    assert plain == prefix
    # the clone group must surface (J = 1 pairs) — parity on an empty
    # result would prove nothing
    pairs = {(a, b) for a, b, *_ in plain}
    assert {(1, 11), (1, 21), (11, 21)} <= pairs
    # and the hot shingle must NOT have produced pairs on its own:
    # boilerplate-only overlap is J = 1/(sz_a + sz_b − 1) « 0.5
    assert all(j >= 0.5 for *_, j in plain)


def test_salted_join_spreads_hot_key(spark, skew_dir):
    # Force the shuffled-join path: at test size AQE would broadcast the
    # dim (no shuffle at all — which is also why salting is harmless
    # here), but the property under test is the REDUCER spread when the
    # join does shuffle, the regime salting exists for at 100 TB.
    overrides = {
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        salted = all_queries()["join_salted"](spark, skew_dir)
        e = spark.read.parquet(f"{skew_dir}/events.parquet").select(
            "event_id", "event_type", "value"
        )
        dim = (
            spark.read.parquet(f"{skew_dir}/events.parquet")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("type_total"))
        )
        plain = e.join(dim, "event_type")
        assert {tuple(r) for r in salted.collect()} == {
            tuple(r) for r in plain.collect()
        }

        # the no-giant-task property: the hot key's rows must occupy
        # several shuffle partitions after salting (a plain hash join
        # funnels all 2000 through one task)
        hot_parts = (
            salted.filter(F.col("event_type") == "view")
            .select(F.spark_partition_id().alias("pid"))
            .distinct()
            .count()
        )
        assert hot_parts >= 3, f"hot key landed in only {hot_parts} partition(s)"

        # contrast: the unsalted shuffled join funnels every hot row
        # through exactly one reducer — the giant task salting removes
        plain_parts = (
            plain.filter(F.col("event_type") == "view")
            .select(F.spark_partition_id().alias("pid"))
            .distinct()
            .count()
        )
        assert plain_parts == 1
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
