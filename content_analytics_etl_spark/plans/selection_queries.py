"""Model-light data-selection operators (BASELINE extension, training-
data curation family): the two standard "score every document against a
target distribution" shapes a pre-training pipeline runs between raw
crawl and the token-budget sampler.

``doc_dsir_importance`` — Data Selection via Importance Resampling
(Xie et al. 2023, public): per-document log importance weight of a
hashed-bigram unigram model of the TARGET distribution (here: the
corpus's English slice) against the RAW distribution (the whole
corpus), with add-one smoothing over B=256 feature buckets.  Plan
shape: one bigram explode → (doc, bucket) counts → join with the
256-row bucket-statistics table (broadcast) → per-doc fixed-point sum
→ one 1-row totals broadcast for the normalizer.  Everything after the
explode is keyed aggregation on doc_id — linear shuffle, no corpus
window, survives 100×.

``doc_quality_classifier`` — fastText-style linear quality classifier
over hashed token features (the "model-based quality filter" stage of
GPT-3/LLaMA-class pipelines), with the weight vector derived
deterministically from the bucket hash so both engines share it without
a side channel.  Deliberately SHUFFLE-FREE: the margin is computed with
``F.aggregate`` over the token array inside the scan projection (no
explode, no groupBy) — per-doc scoring is embarrassingly parallel and
the plan is a single WholeStageCodegen scan at any scale.

Float determinism: log2 only over SHARED integers, snapped to the 9 dp
grid, products summed in fixed-point BIGINT (the doc_char_entropy
pattern, plans/_util.py policy); the classifier is pure integer
arithmetic until one final int/int double division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import DUCKDB_HASH64
from ..functions.text_metrics import tokens
from ._util import t
from .text_queries import _TOKS_SQL, _lm_bigram_counts, _lm_token_counts

# Feature-hash width for both operators. 256 buckets is the sf-scaled
# stand-in for DSIR's 10k-bucket hashed bigram space; the bucket table
# stays a broadcast at ANY corpus size because its cardinality is this
# constant, not the vocabulary.
N_BUCKETS = 256
# Classifier weights live on a milli grid: w_b ∈ {-1000..1000}/1000.
W_SPAN = 2001
TARGET_LANG = "en"


def _h64(prefix: str, col: Column) -> Column:
    """portable_hash64 with a literal prefix (engine-portable md5 path)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), col)), 1, 15), 16, 10
    ).cast("bigint")


def _l2(col: Column) -> Column:
    """Grid-snapped log2 of a shared integer (9 dp policy)."""
    return F.round(F.log2(col.cast("double")), 9)


def doc_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log importance weight per document.

    logw(d) = Σ_b x_b·(log2(ct_b+1) − log2(cr_b+1))
              − n_d·(log2(Tt+B) − log2(Tr+B))

    where x_b is doc d's count in hashed-bigram bucket b, ct/cr the
    target/raw bucket totals, Tt/Tr the corpus totals, B the add-one
    mass. ``selected`` = logw > 0 (more target-like than raw-like).
    Docs with no bigrams carry logw = 0 and are not selected.
    """
    d = t(spark, sf_dir, "documents")
    # r9: project the shared session-materialized bigram count table
    # (text_queries._lm_bigram_counts — one corpus explode per
    # snapshot) into the hashed-bucket space instead of re-exploding
    # the corpus; inputs shrink to |distinct (doc, bigram)| rows and
    # occurrence weights ride in the x column.
    db = _lm_bigram_counts(spark, sf_dir).select(
        "doc_id",
        "lang",
        "x",
        F.pmod(
            _h64("dsir|", F.concat_ws(" ", "w1", "w2")), F.lit(N_BUCKETS)
        ).alias("b"),
    )

    x = db.groupBy("doc_id", "b").agg(F.sum("x").alias("x"))
    stats = db.groupBy("b").agg(
        F.sum("x").alias("cr"),
        F.sum(
            F.when(F.col("lang") == TARGET_LANG, F.col("x")).otherwise(F.lit(0))
        ).alias("ct"),
    )
    totals = stats.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )  # 1-row normalizer frame (allowlisted broadcast)

    # Per-(doc, bucket) fixed-point contribution: x·Δlog2 on the 1e-9
    # grid as a BIGINT, so the per-doc reduction is order-independent.
    diff = _l2(F.col("ct") + 1) - _l2(F.col("cr") + 1)
    contrib = F.floor(
        F.col("x").cast("double") * diff * 1e9 + F.lit(0.5)
    ).cast("bigint")

    per_doc = (
        x.join(F.broadcast(stats), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("x").alias("n_bigrams"),
            F.sum(contrib).alias("_s"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            (
                F.col("_s").cast("double") / F.lit(1e9)
                - F.col("n_bigrams").cast("double")
                * (
                    _l2(F.col("tt") + N_BUCKETS)
                    - _l2(F.col("tr") + N_BUCKETS)
                )
            ).alias("logw"),
        )
    )
    return (
        d.select("doc_id", "lang")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
            (F.coalesce("logw", F.lit(0.0)) > 0).alias("selected"),
        )
    )


def corpus_token_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level distribution-shift table: per source, the KL
    divergence (bits/token) of its unigram distribution from the whole
    corpus — the one-number-per-source rollup a mix review reads next
    to ``doc_domain_surprisal``'s per-document gap and
    ``doc_source_distinctive_terms``'s per-term lift. A source whose
    KL spikes after an ingest is the text twin of
    ``embedding_drift_monitor``'s centroid drift.

    No smoothing needed: support(p_source) ⊆ support(p_corpus) by
    construction, so every term's log ratio is finite. Exactness: the
    per-(source, term) contribution c_st·(log2(c_st·N) − log2(n_s·c_t))
    uses grid-snapped log2 of SHARED integer products (all < 2⁶³ here;
    at larger scales the products become decimal before the cast) and
    sums as fixed-point BIGINT; one division per source at read-out.

    Scale shape: two keyed re-aggregations of the shared
    session-materialized ``_lm_token_counts`` table (corpus exploded
    once per snapshot) + a 1-row totals broadcast — nothing wider than
    the (source, term) relation shuffles."""
    x = _lm_token_counts(spark, sf_dir)
    cs = x.groupBy("source", "tok").agg(F.sum("x").alias("cst"))
    ct = cs.groupBy("tok").agg(F.sum("cst").alias("ct"))
    ns = cs.groupBy("source").agg(
        F.sum("cst").alias("ns"), F.count(F.lit(1)).alias("n_types")
    )
    tot = ct.agg(F.sum("ct").alias("nn"))
    j = (
        cs.join(ct, "tok")
        .join(ns, "source")
        .crossJoin(F.broadcast(tot))
    )
    delta = _l2(F.col("cst") * F.col("nn")) - _l2(F.col("ns") * F.col("ct"))
    contrib = F.floor(
        F.col("cst").cast("double") * delta * 1e9 + F.lit(0.5)
    ).cast("bigint")
    return (
        j.groupBy("source")
        .agg(
            F.min("ns").alias("n_tokens"),
            F.min("n_types").alias("n_types"),
            F.sum(contrib).alias("_s"),
        )
        .select(
            "source",
            "n_tokens",
            F.col("n_types").cast("bigint").alias("n_types"),
            (
                F.col("_s").cast("double")
                / F.lit(1e9)
                / F.col("n_tokens").cast("double")
            ).alias("kl_bits_per_token"),
        )
    )


def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over hashed token features, shuffle-free.

    Each token hashes to one of ``N_BUCKETS`` feature buckets; bucket b
    carries a fixed milli-weight w_b = hash(b) % 2001 − 1000 (derived
    from the hash itself, so no weight table ships anywhere). The doc
    margin Σ w is folded JVM-side over the token array with
    ``F.aggregate`` — no explode, no groupBy, no exchange; score =
    margin / (1000·n_tokens) is one exact int/int double division.
    """
    d = t(spark, sf_dir, "documents")
    toks = tokens("text")

    def w(tok: Column) -> Column:
        bucket = F.pmod(_h64("qcls|", tok), F.lit(N_BUCKETS))
        return F.pmod(
            _h64("qclsw|", bucket.cast("string")), F.lit(W_SPAN)
        ) - F.lit(1000)

    margin = F.aggregate(
        F.transform(toks, w),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    n = F.size(toks).cast("bigint")
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        margin.alias("margin_milli"),
        (
            margin.cast("double") / (n * 1000).cast("double")
        ).alias("score"),
        (margin > 0).alias("keep"),
    )


def doc_domain_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dual-LM domain-surprisal selection signal (the RHO-1 /
    reference-model idea applied at unigram order): score every
    document under TWO add-one unigram LMs — the global corpus model
    and its own source's model — and report the cross-entropy gap.
    A positive gap (cheaper in-domain than globally) marks the
    documents that carry the source's distinctive distribution; near
    zero marks generic/boilerplate text that any model predicts
    equally well — the doc-level model-based twin of
    ``doc_source_distinctive_terms``'s term-level lift.

    Scale shape: the shared session-materialized unigram count table
    (``text_queries._lm_token_counts``, one corpus explode for the
    whole LM family — VERDICT r8 #2) feeds (doc, token) counts, global
    token counts, and per-source token counts — all keyed hash
    aggregations over |distinct (doc, source, token)| rows; model
    denominators ride in as a 1-row global frame (allowlisted) and a
    #sources-row frame joined by key. Both cross-entropies are
    fixed-point BIGINT reductions over 9 dp-grid log2 of shared
    integers (the house pattern), so the gap is bit-identical
    cross-engine."""
    d = t(spark, sf_dir, "documents")
    x = _lm_token_counts(spark, sf_dir)
    cs = x.groupBy("source", "tok").agg(F.sum("x").alias("cs"))
    cg = cs.groupBy("tok").agg(F.sum("cs").alias("cg"))
    gtot = cg.agg(
        F.sum("cg").alias("ng"), F.count(F.lit(1)).alias("vg")
    )  # 1-row global model size
    stot = cs.groupBy("source").agg(
        F.sum("cs").alias("ns"), F.count(F.lit(1)).alias("vs")
    )

    def _fp(cnt, n, v):
        diff = F.round(F.log2((cnt + 1).cast("double")), 9) - F.round(
            F.log2((n + v).cast("double")), 9
        )
        return F.floor(
            F.col("x").cast("double") * diff * F.lit(1e9) + F.lit(0.5)
        ).cast("bigint")

    per = (
        x.join(cg, "tok")
        .join(cs, ["source", "tok"])
        .join(stot, "source")
        .crossJoin(F.broadcast(gtot))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("x").alias("n_tokens"),
            F.sum(_fp(F.col("cg"), F.col("ng"), F.col("vg"))).alias("_sg"),
            F.sum(_fp(F.col("cs"), F.col("ns"), F.col("vs"))).alias("_ss"),
        )
    )
    ce_g = (-F.col("_sg")).cast("double") / F.lit(1e9) / F.col(
        "n_tokens"
    ).cast("double")
    ce_s = (-F.col("_ss")).cast("double") / F.lit(1e9) / F.col(
        "n_tokens"
    ).cast("double")
    scored = per.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        ce_g.alias("ce_global_bits"),
        ce_s.alias("ce_source_bits"),
        (ce_g - ce_s).alias("domain_surprisal_gap"),
    )
    return (
        d.select("doc_id", F.col("source").alias("src0"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.col("src0").alias("source"),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("ce_global_bits", F.lit(0.0)).alias("ce_global_bits"),
            F.coalesce("ce_source_bits", F.lit(0.0)).alias("ce_source_bits"),
            F.coalesce("domain_surprisal_gap", F.lit(0.0)).alias(
                "domain_surprisal_gap"
            ),
        )
    )


QUERIES = {
    "corpus_token_kl_drift": corpus_token_kl_drift,
    "doc_dsir_importance": doc_dsir_importance,
    "doc_quality_classifier": doc_quality_classifier,
    "doc_domain_surprisal": doc_domain_surprisal,
}

_H64_SQL = DUCKDB_HASH64  # format with {expr}

# tk must be bound once (see dedup_queries._SHINGLES_CTE): inlining the
# split into the lambda re-evaluates the full-text regex PER ELEMENT.
_BG_SQL = (
    "unnest(list_transform(range(1, len(tk)),"
    " i -> tk[i] || ' ' || tk[i+1]))"
)

_BUCKET_SQL = _H64_SQL.format(expr="'dsir|' || bg") + f" % {N_BUCKETS}"

_QW_SQL = (
    _H64_SQL.format(
        expr="'qclsw|' || CAST("
        + _H64_SQL.format(expr="'qcls|' || x")
        + f" % {N_BUCKETS} AS VARCHAR)"
    )
    + f" % {W_SPAN} - 1000"
)

ORACLES = {
    "doc_dsir_importance": f"""
        WITH db AS (
          SELECT doc_id, lang, {_BUCKET_SQL} AS b
          FROM (SELECT doc_id, lang, {_BG_SQL} AS bg
                FROM (SELECT doc_id, lang, {_TOKS_SQL} AS tk FROM documents))
        ),
        x AS (SELECT doc_id, b, count(1) AS x FROM db GROUP BY 1, 2),
        stats AS (
          SELECT b, count(1) AS cr,
                 CAST(sum(CASE WHEN lang = '{TARGET_LANG}' THEN 1 ELSE 0 END)
                      AS BIGINT) AS ct
          FROM db GROUP BY 1
        ),
        totals AS (
          SELECT CAST(sum(cr) AS BIGINT) AS tr,
                 CAST(sum(ct) AS BIGINT) AS tt
          FROM stats
        ),
        per AS (
          SELECT x.doc_id,
                 CAST(sum(x.x) AS BIGINT) AS n_bigrams,
                 CAST(sum(CAST(floor(
                     CAST(x.x AS DOUBLE)
                     * (round(log2(CAST(s.ct + 1 AS DOUBLE)), 9)
                        - round(log2(CAST(s.cr + 1 AS DOUBLE)), 9))
                     * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS _s
          FROM x JOIN stats s USING (b)
          GROUP BY 1
        )
        SELECT d.doc_id, d.lang,
               COALESCE(p.n_bigrams, 0) AS n_bigrams,
               COALESCE(
                 CAST(p._s AS DOUBLE) / 1000000000.0
                 - CAST(p.n_bigrams AS DOUBLE)
                 * (round(log2(CAST(t.tt + {N_BUCKETS} AS DOUBLE)), 9)
                    - round(log2(CAST(t.tr + {N_BUCKETS} AS DOUBLE)), 9)),
                 0.0) AS logw,
               COALESCE(
                 CAST(p._s AS DOUBLE) / 1000000000.0
                 - CAST(p.n_bigrams AS DOUBLE)
                 * (round(log2(CAST(t.tt + {N_BUCKETS} AS DOUBLE)), 9)
                    - round(log2(CAST(t.tr + {N_BUCKETS} AS DOUBLE)), 9)),
                 0.0) > 0 AS selected
        FROM documents d
        LEFT JOIN per p ON d.doc_id = p.doc_id
        CROSS JOIN totals t
    """,
    "doc_quality_classifier": f"""
        WITH base AS (
          SELECT doc_id,
                 CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
                 CAST(list_sum(list_transform({_TOKS_SQL},
                      x -> {_QW_SQL})) AS BIGINT) AS margin_milli
          FROM documents
        )
        SELECT doc_id, n_tokens, margin_milli,
               CAST(margin_milli AS DOUBLE)
                 / CAST(n_tokens * 1000 AS DOUBLE) AS score,
               margin_milli > 0 AS keep
        FROM base
    """,
}

ORACLES["doc_domain_surprisal"] = f"""
    WITH tok AS (
      SELECT doc_id, source, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    x AS (
      SELECT doc_id, source, tok, count(1) AS x FROM tok GROUP BY 1, 2, 3
    ),
    cg AS (SELECT tok, count(1) AS cg FROM tok GROUP BY 1),
    gtot AS (
      SELECT count(1) AS ng, count(DISTINCT tok) AS vg FROM tok
    ),
    cs AS (SELECT source, tok, count(1) AS cs FROM tok GROUP BY 1, 2),
    stot AS (
      SELECT source, count(1) AS ns, count(DISTINCT tok) AS vs
      FROM tok GROUP BY 1
    ),
    per AS (
      SELECT x.doc_id, x.source,
             CAST(sum(x.x) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(floor(CAST(x.x AS DOUBLE)
               * (round(log2(CAST(cg.cg + 1 AS DOUBLE)), 9)
                  - round(log2(CAST(gtot.ng + gtot.vg AS DOUBLE)), 9))
               * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS _sg,
             CAST(sum(CAST(floor(CAST(x.x AS DOUBLE)
               * (round(log2(CAST(cs.cs + 1 AS DOUBLE)), 9)
                  - round(log2(CAST(stot.ns + stot.vs AS DOUBLE)), 9))
               * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS _ss
      FROM x
      JOIN cg ON cg.tok = x.tok
      JOIN cs ON cs.source = x.source AND cs.tok = x.tok
      JOIN stot ON stot.source = x.source
      CROSS JOIN gtot
      GROUP BY 1, 2
    )
    SELECT d.doc_id, d.source,
           COALESCE(p.n_tokens, 0) AS n_tokens,
           COALESCE(CAST(-p._sg AS DOUBLE) / 1000000000.0
                      / CAST(p.n_tokens AS DOUBLE), 0.0) AS ce_global_bits,
           COALESCE(CAST(-p._ss AS DOUBLE) / 1000000000.0
                      / CAST(p.n_tokens AS DOUBLE), 0.0) AS ce_source_bits,
           COALESCE(CAST(-p._sg AS DOUBLE) / 1000000000.0
                      / CAST(p.n_tokens AS DOUBLE)
                    - CAST(-p._ss AS DOUBLE) / 1000000000.0
                      / CAST(p.n_tokens AS DOUBLE), 0.0)
             AS domain_surprisal_gap
    FROM documents d
    LEFT JOIN per p ON p.doc_id = d.doc_id
"""


# Mirror of corpus_token_kl_drift: same (source, term) counts off the
# token stream, grid log2 of shared integer products, fixed-point sum.
ORACLES["corpus_token_kl_drift"] = f"""
    WITH tok AS MATERIALIZED (
      SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    cs AS MATERIALIZED (
      SELECT source, tok, CAST(count(1) AS BIGINT) AS cst
      FROM tok GROUP BY 1, 2
    ),
    ct AS (SELECT tok, CAST(sum(cst) AS BIGINT) AS ct FROM cs GROUP BY 1),
    ns AS (
      SELECT source, CAST(sum(cst) AS BIGINT) AS ns,
             count(1) AS n_types
      FROM cs GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nn FROM ct)
    SELECT cs.source,
           MIN(ns.ns) AS n_tokens,
           CAST(MIN(ns.n_types) AS BIGINT) AS n_types,
           CAST(sum(CAST(floor(CAST(cs.cst AS DOUBLE)
             * (round(log2(CAST(cs.cst * tot.nn AS DOUBLE)), 9)
                - round(log2(CAST(ns.ns * ct.ct AS DOUBLE)), 9))
             * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000.0
             / CAST(MIN(ns.ns) AS DOUBLE) AS kl_bits_per_token
    FROM cs
    JOIN ct ON ct.tok = cs.tok
    JOIN ns ON ns.source = cs.source
    CROSS JOIN tot
    GROUP BY 1
"""
