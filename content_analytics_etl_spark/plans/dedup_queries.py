"""Deduplication queries over ``documents`` (BASELINE extension).

Each dedup family is a ``queries()`` entry with a full DuckDB oracle —
including MinHash-LSH and SimHash, which are reproducible cross-engine
because every hash is the portable md5-derived 64-bit hash
(functions/hashing.py, verified bit-identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import md5_fingerprint, portable_hash64
from ..functions.text_metrics import norm_text
from ..operators.graph import connected_components
from ..operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    jaccard,
    lsh_band_keys,
    minhash_signature_agg,
    shingle_hashes,
    shingle_rows,
    shingled,
    simhash60_agg,
)
from ..cache import session_materialized
from ..operators.prefix_sum import distributed_prefix_sum
from ._util import materialize_and_release, source_fingerprint, t

JACCARD_THRESHOLD = 0.5
SIMHASH_MAX_HAMMING = 6

# ---------------------------------------------------------------------------
# DuckDB SQL building blocks mirroring the Spark constructions
# ---------------------------------------------------------------------------
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"
_DH64 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

# tk is bound ONCE in the inner select: inlining the split into the
# lambda re-evaluates the full-text regex+split PER ELEMENT (measured
# 28 s vs 0.08 s per pass on the 50k-vocab sf0.1 corpus).
_SHINGLES_CTE = f"""
  SELECT doc_id, lang,
         list_distinct(
           CASE WHEN len(tk) < 3 THEN []
                ELSE list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
           END) AS shingles
  FROM (SELECT doc_id, lang, {_TOKS} AS tk FROM documents)
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one row per distinct normalized content, canonical =
    min doc_id. One shuffle on the md5 fingerprint."""
    d = t(spark, sf_dir, "documents")
    return (
        d.withColumn("fp", md5_fingerprint(norm_text("text")))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_exact_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document verdict: is this row a duplicate of an earlier doc
    with identical normalized content? (window-min, no self-join)."""
    d = t(spark, sf_dir, "documents")
    w = W.partitionBy("fp")
    return (
        d.withColumn("fp", md5_fingerprint(norm_text("text")))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .select(
            "doc_id",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
        )
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-trigram Jaccard ≥ 0.5, same-lang blocked,
    via an inverted-index join: explode shingles, equi-join on
    (shingle, lang), count shared shingles per pair, then
    J = c / (|A| + |B| − c).

    No quadratic pair scan and no per-pair array intersection — pairs
    materialize only when they share ≥ 1 shingle (J ≥ t ⇒ they do), and
    every step is a codegen'd shuffle join/agg. One pathological hot
    shingle still creates a quadratic posting list here;
    ``dedup_ngram_jaccard_prefix`` is the same result set with posting
    lists bounded by exact prefix filtering — the 100 TB form."""
    d = t(spark, sf_dir, "documents")
    rows = shingle_rows(d, ["doc_id", "lang"])
    sizes = rows.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    # merge hint: with both sides as identical shuffle exchanges Spark
    # reuses the shuffle instead of recomputing the posting list twice
    # (a broadcast side would be a *different* exchange kind — no reuse)
    a, b = rows.alias("a"), rows.alias("b").hint("merge")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    j = F.col("c").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("c")
    ).cast("double")
    # sizes join: one row per doc — NOT hinted broadcast (unbounded at
    # scale); AQE picks broadcast-hash when the runtime size allows
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", j.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _prefix_jaccard_pairs(
    spark: SparkSession, sf_dir: str, keys: list[str], thr: float
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for every pair with J ≥ ``thr`` via EXACT
    prefix filtering (AllPairs/PPJoin), optionally blocked on ``keys``
    (e.g. same-lang). Shared by ``dedup_ngram_jaccard_prefix`` (lang
    block) and the band-tuning truth set (no block — MinHash bands
    don't see lang either). See ``dedup_ngram_jaccard_prefix`` for the
    prefix theorem and the r9 fused-aggregate construction."""
    d = t(spark, sf_dir, "documents")
    rows = shingle_rows(d, ["doc_id", *keys])  # distinct shingles/doc
    df_tab = rows.groupBy(*keys, "shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        rows.join(df_tab, [*keys, "shingle"])
        .groupBy("doc_id", *keys)
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "shingle"))).alias("a")
        )
        # two non-reuse-identical consumers (prefix rows + verify
        # arrays) — persisted for the query, released on materialize
        .persist()
    )
    sz = F.size("a")
    plen = (sz - F.ceil(F.lit(thr) * sz) + 1).cast("int")
    prefix = ranked.select(
        "doc_id",
        *keys,
        sz.alias("sz"),
        F.explode(F.slice("a", 1, plen)).alias("s"),
    ).select("doc_id", *keys, "sz", F.col("s.shingle").alias("shingle"))

    # merge hint ⇒ shuffle reuse across the self-join; the size
    # predicate is PPJoin's length filter (see the public docstring)
    a, b = prefix.alias("a"), prefix.alias("b").hint("merge")
    cond = (
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.col("b.sz").cast("double") >= F.lit(thr) * F.col("a.sz"))
        & (F.col("a.sz").cast("double") >= F.lit(thr) * F.col("b.sz"))
    )
    for k in keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    cand = (
        a.join(b, cond)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify against the SAME persisted per-doc arrays (no re-tokenize)
    arrs = ranked.select(
        "doc_id",
        F.transform("a", lambda s: s.getField("shingle")).alias("shingles"),
    )
    sa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = arrs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    out = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jaccard("sh_a", "sh_b").alias("jaccard"))
        .filter(F.col("jaccard") >= thr)
    )
    return materialize_and_release(out, ranked)


def dedup_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result set as ``dedup_ngram_jaccard`` (identical oracle) via
    EXACT prefix filtering (AllPairs/PPJoin): order shingles globally by
    (document frequency asc, shingle asc); a doc of |A| distinct
    shingles indexes only its first |A| − ⌈t·|A|⌉ + 1 in that order.
    For any pair with J ≥ t the overlap is c ≥ t·|A| (and ≥ t·|B|), so
    the globally-smallest shared shingle has rank ≤ |X| − c + 1 ≤
    prefix length in BOTH docs — every qualifying pair still collides,
    result parity is a theorem, not a tuning choice
    (tests/test_prefix_filter.py asserts it row-for-row).

    This is the principled form of a hot-shingle DF cutoff: high-DF
    shingles sort last and drop out of every prefix, so a pathological
    stop-shingle contributes no posting list at all instead of a
    quadratic one. Costs one extra linear shuffle (the DF aggregate) —
    the right trade at 100 TB where the worst posting list, not the
    average, sets the job's critical path.

    r9 constant-floor work (VERDICT r8 #3, PERF 57): the former
    size+rank window pair over the DF-joined rows is fused into ONE
    per-doc object-hash aggregate — ``sort_array(collect_list(struct(
    df, shingle)))`` IS the global (df asc, shingle asc) ranking, its
    size IS |A|, and ``slice`` of it IS the prefix — eliminating the
    window exchange + two window sorts. The same persisted per-doc
    array then feeds exact verification via ``transform(.shingle)``,
    so the corpus is tokenized ONCE (the old plan re-tokenized
    documents through ``shingled`` for the verify arrays). Per-doc
    arrays are bounded by document length — the same boundedness
    ``shingled`` already relied on.

    The size predicate inside the shared helper is PPJoin's LENGTH
    FILTER: J ≥ t forces t·|A| ≤ |B| ≤ |A|/t (c ≤ min(|A|,|B|) and
    c ≥ t·max(|A|,|B|)), so pairs failing it are provably below
    threshold — result parity is preserved while the verify fan-out
    shrinks (74k → 56k candidate pairs at sf0.1, measured; the win
    grows with size variance)."""
    return _prefix_jaccard_pairs(spark, sf_dir, ["lang"], JACCARD_THRESHOLD)


def _minhash_sig16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, mh0..mh15) — the k=16 MinHash signature table,
    session-materialized once per corpus snapshot. Four registered
    queries consume it verbatim (``dedup_minhash_lsh``,
    ``dedup_minhash_band_tuning``, ``dedup_minhash_estimate_audit``,
    ``dedup_lsh_incremental``) and each used to re-run the shingle
    explode + 1 md5/shingle + 16 min-aggs per invocation. At 100 TB
    this IS the signature index written once per corpus build; the
    session cache is the local stand-in and the build cost reports via
    ``producer_build_seconds`` (the ANN index-producer pattern,
    PERF 51)."""
    key = f"minhash_sig16:{source_fingerprint(sf_dir, 'documents')}"

    def build() -> DataFrame:
        d = t(spark, sf_dir, "documents")
        # distinct=False: min over the shingle multiset equals min over
        # its set, so MinHash skips the distinct shuffle entirely
        rows = shingle_rows(d, ["doc_id"], distinct=False)
        return minhash_signature_agg(
            shingle_hashes(rows, ["doc_id"]), ["doc_id"], k=16
        )

    return session_materialized(spark, key, build)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=16) + LSH(4 bands × 4 rows) candidate generation →
    exact-Jaccard verification. The candidate join is an equi-join on the
    band key — linear shuffle, no blocking key needed, the 100 TB path.

    Physical shape: explode→(1 md5/shingle)→16 codegen'd min-aggs (one
    partial+final hash agg, one bigint×16 row per doc on the wire) →
    band explode → equi self-join → verify. No interpreted lambdas, no
    expression re-inlining (see operators/dedup.py module docstring)."""
    d = t(spark, sf_dir, "documents")
    sig = _minhash_sig16(spark, sf_dir)  # shared session-materialized index
    bands = lsh_band_keys(sig, ["doc_id"], bands=4, rows=4)

    # merge hint ⇒ shuffle reuse across the self-join (see ngram above)
    ba, bb = bands.alias("ba"), bands.alias("bb").hint("merge")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band_idx") == F.col("bb.band_idx"))
            & (F.col("ba.band_key") == F.col("bb.band_key"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
        .distinct()
    )

    arrs = shingled(d, ["doc_id"])
    sa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = arrs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            jaccard("sh_a", "sh_b").alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


LSH_TUNE_CONFIGS = [(2, 8), (4, 4), (8, 2)]  # (bands, rows) over 16 perms


def dedup_minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH operating-curve audit — the bands×rows tuning table you
    publish before fixing the production configuration: the SAME
    16-permutation MinHash signature grouped as 2×8 / 4×4 / 8×2
    bands, each config's candidate set measured for volume, precision
    (share of candidates with true Jaccard ≥ t) and recall against the
    exact inverted-index truth set. More bands of fewer rows = the
    S-curve shifts left (recall ↑, precision ↓); this query measures
    where, on this corpus, instead of trusting the formula
    1−(1−s^r)^b.

    Scale shape: ONE signature aggregation feeds all three configs
    (band keys are projections of the same 16 columns); per config one
    band-key equi self-join (linear, the LSH property); the truth set
    is the inverted-index exact join (never all-pairs); the final
    report is a 3-row aggregate with the 1-row truth count broadcast."""
    d = t(spark, sf_dir, "documents")
    sig = _minhash_sig16(spark, sf_dir)  # shared session-materialized index

    # exact truth: J >= t pairs via the prefix-filtered construction
    # (no lang block — MinHash bands don't see lang either). r9: the
    # former raw shared-shingle self-join was QUADRATIC on this corpus
    # profile (fixed trigram space ⇒ posting lists grow linearly with
    # rows ⇒ sf1→sf3 exponent 2.7); _prefix_jaccard_pairs produces the
    # identical pair set — the prefix theorem — with bounded posting
    # lists, and its result is persisted (two consumers below).
    truth = _prefix_jaccard_pairs(spark, sf_dir, [], JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.lit(1).alias("is_true")
    )
    tn = truth.agg(F.count(F.lit(1)).alias("n_truth"))

    cands = None
    for b, r in LSH_TUNE_CONFIGS:
        bands = lsh_band_keys(sig, ["doc_id"], bands=b, rows=r)
        ba, bb = bands.alias("ba"), bands.alias("bb").hint("merge")
        c = (
            ba.join(
                bb,
                (F.col("ba.band_idx") == F.col("bb.band_idx"))
                & (F.col("ba.band_key") == F.col("bb.band_key"))
                & (F.col("ba.doc_id") < F.col("bb.doc_id")),
            )
            .select(
                F.col("ba.doc_id").alias("doc_a"),
                F.col("bb.doc_id").alias("doc_b"),
            )
            .distinct()
            .select(
                F.lit(b).cast("int").alias("bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                "doc_a",
                "doc_b",
            )
        )
        cands = c if cands is None else cands.unionAll(c)
    agg = (
        cands.join(truth, ["doc_a", "doc_b"], "left")
        .groupBy("bands", "rows_per_band")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.coalesce(F.col("is_true"), F.lit(0))).alias("n_hits"),
        )
    )
    # Every config always appears, even when its band join yields zero
    # candidate pairs on a degenerate corpus (groupBy drops empty
    # groups — ADVICE r8): left-join the 3-row config literal frame,
    # coalesce counts to 0, and NULL-guard the ratios so a vacuous
    # config reports n_candidates=0 / precision NULL / recall 0 instead
    # of vanishing from the report. Oracle mirrors.
    cfg = spark.createDataFrame(
        [(int(b), int(r)) for b, r in LSH_TUNE_CONFIGS],
        "bands int, rows_per_band int",
    )
    report = cfg.join(agg, ["bands", "rows_per_band"], "left").crossJoin(
        F.broadcast(tn)
    )
    nc = F.coalesce(F.col("n_candidates"), F.lit(0).cast("bigint"))
    nh = F.coalesce(F.col("n_hits").cast("bigint"), F.lit(0).cast("bigint"))
    return report.select(
        "bands",
        "rows_per_band",
        nc.alias("n_candidates"),
        nh.alias("n_hits"),
        "n_truth",
        F.when(nc > 0, nh.cast("double") / nc.cast("double")).alias("precision"),
        F.when(
            F.col("n_truth") > 0,
            nh.cast("double") / F.col("n_truth").cast("double"),
        ).alias("recall"),
    )


def dedup_minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit for MinHash (completing the audit trio
    next to token_cms_heavy_hitters and sim_ann_recall_audit): for
    every LSH candidate pair, the k=16 signature-agreement fraction
    (the MinHash Jaccard ESTIMATE) against the exact shingle Jaccard,
    with the signed error — the number you check before trusting the
    estimate as a dedup threshold at a scale where exact verification
    stops being affordable.

    Same linear shapes as dedup_minhash_lsh (band equi-join candidates,
    signature rows carry 16 bigints); the estimate is per-row integer
    arithmetic over the two joined signatures, division done once as
    doubles (IEEE-exact both engines)."""
    d = t(spark, sf_dir, "documents")
    sig = _minhash_sig16(spark, sf_dir)  # shared session-materialized index
    bands = lsh_band_keys(sig, ["doc_id"], bands=4, rows=4)
    ba, bb = bands.alias("ba"), bands.alias("bb").hint("merge")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band_idx") == F.col("bb.band_idx"))
            & (F.col("ba.band_key") == F.col("bb.band_key"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
        .distinct()
    )
    siga = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh{s}").alias(f"a{s}") for s in range(16)]
    )
    sigb = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh{s}").alias(f"b{s}") for s in range(16)]
    )
    n_agree = sum(
        F.when(F.col(f"a{s}") == F.col(f"b{s}"), 1).otherwise(0) for s in range(16)
    )
    arrs = shingled(d, ["doc_id"])
    sa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = arrs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (n_agree.cast("double") / F.lit(16.0)).alias("mh_estimate"),
            jaccard("sh_a", "sh_b").alias("jaccard"),
            (
                n_agree.cast("double") / F.lit(16.0)
                - jaccard("sh_a", "sh_b")
            ).alias("est_error"),
        )
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-60 over trigram shingles + near-dup pairs within
    hamming ≤ 6, same-lang. Shingle features (not raw tokens): this
    corpus has a ~31-word vocabulary, so token-level signatures would
    collapse into one majority pattern.

    Pair generation is Hamming-LSH banding, not a quadratic blocked
    scan: the 60 signature bits split into HAMMING+1 = 7 bands, and by
    pigeonhole any pair differing in ≤ 6 bits matches exactly on ≥ 1
    band — so the equi-join on (lang, band_idx, band_bits) finds every
    qualifying pair (identical result set, linear shuffle), and the
    bit_count verify + distinct dedups multi-band collisions."""
    d = t(spark, sf_dir, "documents")
    rows = shingle_rows(d, ["doc_id", "lang"])
    # r14 optimization (guide §5): the signature aggregation feeds both
    # sides of the band self-join — persisted for the invocation so the
    # shingle explode + 60-bit aggregation run once, released on return.
    sg = simhash60_agg(
        shingle_hashes(rows, ["doc_id", "lang"]), ["doc_id", "lang"]
    ).persist()

    n_bands = SIMHASH_MAX_HAMMING + 1
    widths = [60 // n_bands + (1 if i < 60 % n_bands else 0) for i in range(n_bands)]
    offs = [sum(widths[:i]) for i in range(n_bands)]
    bands = sg.select(
        "doc_id",
        "lang",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(
                            f"(simhash >> {offs[i]}) & {(1 << widths[i]) - 1}"
                        ).alias("band_bits"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "lang", "simhash", "band.band_idx", "band.band_bits")

    # merge hint ⇒ shuffle reuse across the self-join (see ngram above)
    a, b = bands.alias("a"), bands.alias("b").hint("merge")
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    return materialize_and_release(
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct(),
        sg,
    )


def neardup_pair_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified near-dup pair list as a session-materialized
    producer (r14 optimization). Five registered consumers re-derived
    the full MinHash→LSH→verify chain per invocation (``dedup_clusters``
    plus the four near-dup-graph analytics: pagerank, triangles,
    common-neighbors ×2) — at 100 TB the pair graph is written once per
    corpus snapshot next to the signature index and every graph job
    reads it; this is the local stand-in, same posture as
    ``dedup_clusters`` itself.

    The build re-applies the (idempotent) Jaccard threshold ON TOP of
    the query plan, so the persisted entry's analyzed plan is
    Filter(Filter(...)) — structurally different from the registered
    ``dedup_minhash_lsh`` plan.  Without that node, Spark's
    CacheManager plan-matches the registered query onto this producer's
    InMemoryRelation and a timed ``dedup_minhash_lsh`` becomes a cache
    read (VERDICT r14 #3: the "6.7×" was this artifact, not a speedup).
    The registered query must always compute its chain fresh — it IS
    the measured pipeline query."""

    def build() -> DataFrame:
        return dedup_minhash_lsh(spark, sf_dir).filter(
            F.col("jaccard") >= JACCARD_THRESHOLD
        )

    key = f"neardup_pairs:{source_fingerprint(sf_dir, 'documents')}"
    return session_materialized(spark, key, build)


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate clusters: connected components over
    the MinHash-LSH pair graph (operators/graph.py, iterative min-label
    propagation), cluster_id = min doc_id of the component — the final
    step that turns pairwise similarity into keep/drop groups.

    Materialized once per (session, corpus snapshot): three other
    registered queries (keep-best, dup-aware sampling, the curation
    manifest via keep-best) consume the assignment — at 100 TB it is an
    incremental table written once per snapshot, not a per-consumer
    recompute."""

    def build() -> DataFrame:
        pairs = neardup_pair_graph(spark, sf_dir)
        # r15: the verified pair list is distinct canonical (a < b) by
        # construction — declare it so the symmetrization skips its
        # dedup exchange (operators/graph.py)
        cc = connected_components(pairs, "doc_a", "doc_b", distinct_pairs=True)
        return cc.select(F.col("node").alias("doc_id"), "cluster_id")

    key = f"dedup_clusters:{source_fingerprint(sf_dir, 'documents')}"
    return session_materialized(spark, key, build)


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection — the step after clustering that a
    training-data pipeline actually ships: per duplicate cluster keep
    exactly one document, the longest (``n_chars``; ties → lowest
    doc_id). One extra key-join plus a per-cluster window on top of
    ``dedup_clusters``; cluster sizes are small by construction so the
    window partition never skews."""
    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cc = dedup_clusters(spark, sf_dir)
    w = W.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        cc.join(d, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", "cluster_id", (F.col("rn") == 1).alias("keep"))
    )


DECONTAM_EVAL_SOURCE = "src0"
DECONTAM_MIN_SHARED = 3


def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination scan: flag training documents (source ≠
    eval slice) sharing ≥ 3 distinct word-trigram shingles with any
    document of the held-out slice (``source = 'src0'``).

    Same inverted-index shape as ``dedup_ngram_jaccard`` — shingles
    explode once, the train↔eval match is an equi-join on the shingle
    (linear shuffle; the eval side is a small fraction of the corpus, so
    AQE broadcasts it at runtime). At 100 TB add a document-frequency
    cutoff on stop-shingles (prefix filtering) to bound hot posting
    lists; parity here needs none."""
    d = t(spark, sf_dir, "documents")
    rows = shingle_rows(d, ["doc_id", "source"])  # distinct shingles/doc
    ev = rows.filter(F.col("source") == DECONTAM_EVAL_SOURCE).select(
        "shingle", F.col("doc_id").alias("eval_id")
    )
    tr = rows.filter(F.col("source") != DECONTAM_EVAL_SOURCE).select(
        "shingle", F.col("doc_id").alias("train_id")
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


# The FIXED benchmark set for the production-shaped decontamination
# twin: held-out docs are src0 rows with doc_id below this absolute
# cap. Doc ids are assigned uniformly at generation, so the set is
# ~constant (~250 docs) at every scale ≥ sf0.1 while the train side
# grows with the corpus — the shape whose exponent VERDICT r10 #3 asks
# to measure instead of infer (the unsuffixed query's eval slice grows
# WITH the corpus, which pins its exponent at 1.0 by construction).
DECONTAM_FIXED_EVAL_CAP = 5000


def dedup_decontaminate_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-shaped decontamination: same inverted-index scan as
    ``dedup_decontaminate`` but against a FIXED benchmark set (source =
    src0 AND doc_id < ``DECONTAM_FIXED_EVAL_CAP`` — ~250 docs at any
    corpus scale), so the eval side is a constant-size relation the
    runtime broadcasts while ONLY the train side grows with the corpus.
    This is the shape benchmark decontamination actually runs in
    production — the eval suites are enumerable, the crawl is not —
    and registering it makes the sublinear-scaling claim a measured
    per-round exponent (the fixed-eval row in SCALE.md) instead of an
    inference. src0 docs past the cap are neither train nor eval:
    they model future benchmark releases, exactly as the unsuffixed
    query treats the whole slice."""
    d = t(spark, sf_dir, "documents")
    rows = shingle_rows(d, ["doc_id", "source"])  # distinct shingles/doc
    ev = rows.filter(
        (F.col("source") == DECONTAM_EVAL_SOURCE)
        & (F.col("doc_id") < DECONTAM_FIXED_EVAL_CAP)
    ).select("shingle", F.col("doc_id").alias("eval_id"))
    tr = rows.filter(F.col("source") != DECONTAM_EVAL_SOURCE).select(
        "shingle", F.col("doc_id").alias("train_id")
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


CONTAIN_THRESHOLD = 0.7


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup — catches the quote/sub-document
    case symmetric Jaccard misses: a short doc wholly embedded in a
    long one has tiny J (the union is dominated by the long doc) but
    containment C(A→B) = |A∩B| / |A| ≈ 1. Reports every same-lang pair
    whose larger-direction containment reaches ``CONTAIN_THRESHOLD``,
    with both directions' values (the asymmetry tells curation WHICH
    side is the fragment).

    r9 scale form (sf1→sf3 exponent was 2.36 on the raw inverted
    index — this corpus's fixed trigram space makes every posting list
    grow linearly with rows): ASYMMETRIC prefix probing. The pair
    qualifies iff c ≥ t·min(|A|,|B|), so the SMALLER doc's
    (df asc, shingle asc) prefix of length |S| − ⌈t·|S|⌉ + 1 provably
    contains a shared shingle — probing every doc's prefix against the
    FULL posting rows finds every qualifying pair (the Jaccard
    two-sided prefix does NOT apply: c can be ≪ t·|L|). Prefix shingles
    are low-DF by construction, so their posting lists are short —
    the hot stop-shingle contributes no probe at all. Exact containment
    re-verified on the persisted per-doc arrays (one tokenize pass,
    the r9 jaccard-prefix construction)."""
    d = t(spark, sf_dir, "documents")
    rows = shingle_rows(d, ["doc_id", "lang"])
    df_tab = rows.groupBy("lang", "shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        rows.join(df_tab, ["lang", "shingle"])
        .groupBy("doc_id", "lang")
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "shingle"))).alias("a")
        )
        .persist()  # prefix probe + full index + verify arrays
    )
    sz = F.size("a")
    plen = (sz - F.ceil(F.lit(CONTAIN_THRESHOLD) * sz) + 1).cast("int")
    prefix = ranked.select(
        "doc_id",
        "lang",
        F.explode(F.slice("a", 1, plen)).alias("s"),
    ).select("doc_id", "lang", F.col("s.shingle").alias("shingle"))
    full = ranked.select(
        F.col("doc_id").alias("f_doc"),
        "lang",
        F.explode(F.transform("a", lambda s: s.getField("shingle"))).alias(
            "shingle"
        ),
    )
    cand = (
        prefix.join(full.hint("merge"), ["lang", "shingle"])
        .filter(F.col("doc_id") != F.col("f_doc"))
        .select(
            F.least("doc_id", "f_doc").alias("doc_a"),
            F.greatest("doc_id", "f_doc").alias("doc_b"),
        )
        .distinct()
    )
    arrs = ranked.select(
        "doc_id",
        F.transform("a", lambda s: s.getField("shingle")).alias("shingles"),
    )
    sa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = arrs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    out = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("n_shared"),
            (inter.cast("double") / F.size("sh_a").cast("double")).alias(
                "containment_a"
            ),
            (inter.cast("double") / F.size("sh_b").cast("double")).alias(
                "containment_b"
            ),
        )
        .filter(
            F.greatest("containment_a", "containment_b") >= CONTAIN_THRESHOLD
        )
    )
    return materialize_and_release(out, ranked)


EDIT_PREFIX = 16  # blocking key: normalized-text prefix length
EDIT_LEN_BUCKET = 16  # …plus a length bucket (floor(len/16))
EDIT_MAX_DIST = 10


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup by bounded edit distance — the record-linkage
    workhorse for OCR noise / minor-revision duplicates that token-set
    measures (Jaccard, MinHash) treat as identical sets but byte-exact
    dedup misses. Classic blocking: candidates must share the 16-char
    normalized prefix AND a 16-char length bucket (an edit ≤ 10 can
    move length by at most 10, so near-misses at bucket boundaries are
    the declared blocking trade, same as any sorted-neighborhood
    scheme); candidates are verified with full Levenshtein and kept at
    distance ≤ ``EDIT_MAX_DIST``. Reports the normalized similarity
    ``1 - dist/max(len)`` alongside the raw distance.

    Scale shape: the blocking key is an equi-join key, so the pair scan
    is linear in corpus size times the square of BLOCK size — blocks
    are bounded by construction (measured max 4 docs on this corpus;
    at 100 TB a hot-block cap or a second prefix character bounds the
    worst case). Levenshtein itself is JVM codegen
    (``F.levenshtein``), O(len²) per PAIR but pairs are few after
    blocking; DuckDB's ``levenshtein`` implements the same classic
    Wagner-Fischer distance, so the oracle matches exactly."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", norm_text("text").alias("nt")
    )
    b = d.select(
        "doc_id",
        "nt",
        F.substring("nt", 1, EDIT_PREFIX).alias("pfx"),
        F.floor(F.length("nt") / EDIT_LEN_BUCKET).cast("bigint").alias("lb"),
    )
    left = b.select(
        F.col("doc_id").alias("doc_a"), F.col("nt").alias("na"), "pfx", "lb"
    )
    right = b.select(
        F.col("doc_id").alias("doc_b"), F.col("nt").alias("nb"), "pfx", "lb"
    ).hint("merge")
    dist = F.levenshtein(F.col("na"), F.col("nb"))
    return (
        left.join(right, ["pfx", "lb"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            dist.cast("bigint").alias("dist"),
            F.length("na").cast("bigint").alias("len_a"),
            F.length("nb").cast("bigint").alias("len_b"),
        )
        .filter(F.col("dist") <= EDIT_MAX_DIST)
        .withColumn(
            "sim",
            F.lit(1.0)
            - F.col("dist").cast("double")
            / F.greatest("len_a", "len_b").cast("double"),
        )
    )


def doc_dup_aware_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware sampling weights — the cluster-level softening of
    hard dedup used when outright dropping near-dups is too aggressive:
    every document in a near-dup family of size k samples with weight
    1/k, so each FAMILY (not each copy) contributes one unit of
    probability mass and boilerplate-heavy sources stop dominating the
    mix. Documents outside any cluster are their own singleton (weight
    1). Composition: connected components over the MinHash-LSH pair
    graph -> left join onto the corpus -> one cluster-keyed count
    window -> per-row reciprocal; everything keyed by cluster_id."""
    cl = dedup_clusters(spark, sf_dir)
    d = t(spark, sf_dir, "documents").select("doc_id")
    j = d.join(cl, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    size = F.count(F.lit(1)).over(W.partitionBy("cluster_id"))
    return j.withColumn("cluster_size", size).withColumn(
        "sample_weight",
        F.lit(1.0) / F.col("cluster_size").cast("double"),
    )


BLOCK_N = 10  # tokens per exact-dedup block (full blocks only)
# owner key packs (doc_id, block_idx) into one orderable bigint;
# block_idx < 2^20 (docs are far shorter), doc_id << 2^43 → exact
_BLOCK_SHIFT = 1 << 20


def dedup_block_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup at fixed token-block granularity — the
    C4 / "Deduplicating Training Data Makes LMs Better" posture where
    the dedup unit is a span, not the whole document: every full
    ``BLOCK_N``-token block is fingerprinted, the corpus-wide first
    occurrence (min packed (doc_id, block_idx)) is canonical, and each
    document reports how much of it is removable as repeated spans.

    Shape: per-row block explode (no shuffle), one groupBy on the block
    fingerprint (map-side combine), an equi-join back on the
    fingerprint, and a per-doc agg — all linear, AQE handles the skew of
    stop-blocks. At 100 TB this is exactly the span-dedup pass that runs
    after document-level dedup."""
    d = t(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split(norm_text("text"), " ").alias("toks"))
    n_blocks = F.floor(F.size("toks") / F.lit(BLOCK_N)).cast("int")
    blocks = (
        base.withColumn("n_blocks", n_blocks)
        .filter(F.col("n_blocks") > 0)
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), F.col("n_blocks") - 1)).alias(
                "block_idx"
            ),
        )
        .select(
            "doc_id",
            "block_idx",
            F.md5(
                F.array_join(
                    F.slice(
                        F.col("toks"),
                        F.col("block_idx") * BLOCK_N + 1,
                        BLOCK_N,
                    ),
                    " ",
                )
            ).alias("fp"),
            (F.col("doc_id") * _BLOCK_SHIFT + F.col("block_idx")).alias(
                "pos_key"
            ),
        )
    )
    owners = blocks.groupBy("fp").agg(F.min("pos_key").alias("owner_key"))
    return (
        blocks.join(owners, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(
                (F.col("pos_key") > F.col("owner_key")).cast("bigint")
            ).alias("n_dup_blocks"),
        )
    )


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-incremental exact dedup — the steady-state production
    shape: a newly ingested batch (here the deterministic slice
    ``doc_id % 4 = 3``) is deduplicated against the existing corpus
    snapshot AND within itself, without ever re-fingerprinting the
    snapshot's survivors. Per (source, status) rollup with
    status ∈ {dup_of_base, dup_in_batch, new}.

    Shape: base side reduces to distinct fingerprints (one groupBy);
    batch classifies via one LEFT equi-join on the fingerprint plus a
    batch-local min-doc_id agg — at 100 TB the base fingerprint set is
    the incremental dedup index (bucketed by fp), and each batch joins
    against it instead of the full corpus."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        md5_fingerprint(norm_text("text")).alias("fp"),
    )
    is_batch = F.pmod(F.col("doc_id"), F.lit(4)) == 3
    batch = d.filter(is_batch)
    base_fps = (
        d.filter(~is_batch)
        .select("fp")
        .distinct()
        .withColumn("in_base", F.lit(True))
    )
    first_in_batch = batch.groupBy("fp").agg(
        F.min("doc_id").alias("first_batch_id")
    )
    status = (
        F.when(F.col("in_base"), F.lit("dup_of_base"))
        .when(F.col("doc_id") > F.col("first_batch_id"), F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
    )
    return (
        batch.join(base_fps, "fp", "left")
        .join(first_in_batch, "fp")
        .select("source", status.alias("status"))
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def dedup_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-incremental NEAR-dup dedup — the MinHash-LSH twin of
    ``dedup_incremental``: a newly ingested batch (the deterministic
    slice ``doc_id % 4 = 3``) probes the base snapshot's band index and
    itself, never re-pairing base docs against each other. Per
    (source, status) rollup with status ∈ {neardup_of_base,
    neardup_in_batch, new}; a batch doc is ``neardup_in_batch`` only if
    a SMALLER-id batch partner verifies (the first copy stays new, the
    same first-occurrence rule as the exact twin).

    Scale shape: at 100 TB the base band table IS the persistent LSH
    index (bucketed by band key); each ingest batch computes signatures
    for its own docs only and equi-joins the index — candidate fan-out
    is per-batch, verification joins pull only the candidate shingle
    arrays, and base×base pairs are never re-examined."""
    d = t(spark, sf_dir, "documents")
    is_batch = F.pmod(F.col("doc_id"), F.lit(4)) == 3
    # shared session-materialized signature index: at 100 TB the batch
    # would sign only its own docs; locally the full-corpus index is the
    # same table the base side needs anyway (see docstring)
    sig = _minhash_sig16(spark, sf_dir)
    bands = lsh_band_keys(sig, ["doc_id"], bands=4, rows=4)
    base_bands = bands.filter(~is_batch)
    batch_bands = bands.filter(is_batch)

    arrs = shingled(d, ["doc_id"])
    sa = arrs.select(F.col("doc_id").alias("doc"), F.col("shingles").alias("sh_a"))
    sb = arrs.select(
        F.col("doc_id").alias("other"), F.col("shingles").alias("sh_b")
    )

    def verified(cand: DataFrame) -> DataFrame:
        return (
            cand.join(sa, "doc")
            .join(sb, "other")
            .filter(jaccard("sh_a", "sh_b") >= JACCARD_THRESHOLD)
            .select("doc")
            .distinct()
        )

    cand_base = (
        batch_bands.alias("nb")
        .join(
            base_bands.alias("ob").hint("merge"),
            (F.col("nb.band_idx") == F.col("ob.band_idx"))
            & (F.col("nb.band_key") == F.col("ob.band_key")),
        )
        .select(
            F.col("nb.doc_id").alias("doc"), F.col("ob.doc_id").alias("other")
        )
        .distinct()
    )
    cand_batch = (
        batch_bands.alias("ba")
        .join(
            batch_bands.alias("bb").hint("merge"),
            (F.col("ba.band_idx") == F.col("bb.band_idx"))
            & (F.col("ba.band_key") == F.col("bb.band_key"))
            & (F.col("bb.doc_id") < F.col("ba.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("doc"), F.col("bb.doc_id").alias("other")
        )
        .distinct()
    )
    of_base = verified(cand_base).withColumn("of_base", F.lit(True))
    in_batch = verified(cand_batch).withColumn("in_batch", F.lit(True))
    status = (
        F.when(F.col("of_base"), F.lit("neardup_of_base"))
        .when(F.col("in_batch"), F.lit("neardup_in_batch"))
        .otherwise(F.lit("new"))
    )
    return (
        d.filter(is_batch)
        .select(F.col("doc_id").alias("doc"), "source")
        .join(of_base, "doc", "left")
        .join(in_batch, "doc", "left")
        .select("source", status.alias("status"))
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SNM_KEY_LEN = 32
SNM_WINDOW = 3

SPAN_LEN = 64
SPAN_STRIDE = 16


def doc_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage (the exact-substring dedup
    measurement of Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better"): hash every ``SPAN_LEN``-char window of
    normalized text on a ``SPAN_STRIDE`` grid; a window whose hash
    occurs in ≥ 2 DISTINCT documents is shared verbatim; per document,
    overlapping/adjacent shared windows merge into maximal spans
    (gaps-and-islands) and the covered-char fraction is the signal a
    span-level scrub would act on. Within-doc self-repetition is
    ``doc_repetition``'s job and deliberately does NOT count here.

    Scale shape: window generation is a per-row sequence explode
    (≤ n/stride rows per doc); the duplicate test is ONE hash-keyed
    aggregation (count distinct doc_id) + a semi join back; the island
    merge is a window PARTITIONED BY doc_id (per-doc row count bounded
    by doc length / stride — never corpus-wide). The shuffle key is the
    portable 60-bit md5 window hash, so postings stay compact and the
    DuckDB oracle reproduces them bit-for-bit."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", norm_text("text").alias("nt")
    )
    base = d.select(
        "doc_id",
        "nt",
        F.length("nt").cast("long").alias("n_chars_norm"),
    ).withColumn(
        "starts",
        F.when(
            F.col("n_chars_norm") >= SPAN_LEN,
            F.sequence(
                F.lit(1),
                (F.col("n_chars_norm") - SPAN_LEN + 1).cast("int"),
                F.lit(SPAN_STRIDE),
            ),
        ).otherwise(F.array().cast("array<int>")),
    )
    win = base.select(
        "doc_id", F.explode("starts").alias("start"), "nt"
    ).select(
        "doc_id",
        "start",
        portable_hash64(
            F.substring(F.col("nt"), F.col("start"), F.lit(SPAN_LEN))
        ).alias("h"),
    )
    dup = (
        win.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    shared = win.join(dup, "h", "semi")
    w1 = W.partitionBy("doc_id").orderBy("start")
    prev_end = F.max(F.col("start") + F.lit(SPAN_LEN)).over(
        w1.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = shared.withColumn(
        "is_new",
        (F.col("start") > F.coalesce(prev_end, F.lit(-1))).cast("int"),
    ).withColumn(
        "island",
        F.sum("is_new").over(w1.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    spans = flagged.groupBy("doc_id", "island").agg(
        F.min("start").alias("s"),
        (F.max("start") + F.lit(SPAN_LEN)).alias("e"),
    )
    cov = spans.groupBy("doc_id").agg(
        F.sum((F.col("e") - F.col("s")).cast("long")).alias("covered_chars"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    shc = shared.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shared_windows")
    )
    stats = base.select(
        "doc_id", "n_chars_norm", F.size("starts").cast("long").alias("n_windows")
    )
    return (
        stats.join(shc, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars_norm",
            "n_windows",
            F.coalesce("n_shared_windows", F.lit(0).cast("long")).alias(
                "n_shared_windows"
            ),
            F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
            F.coalesce("covered_chars", F.lit(0).cast("long")).alias(
                "covered_chars"
            ),
            F.when(
                F.col("n_chars_norm") > 0,
                F.coalesce("covered_chars", F.lit(0).cast("long")).cast(
                    "double"
                )
                / F.col("n_chars_norm").cast("double"),
            ).alias("dup_char_fraction"),
        )
    )



def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995): sort the
    corpus by a normalized blocking key (first ``SNM_KEY_LEN`` chars of
    whitespace-normalized text), slide a ``SNM_WINDOW``-row window down
    the sort order, and verify only rank-adjacent candidates with
    word-trigram Jaccard — the classic entity-resolution alternative to
    LSH when near-dups share prefixes (boilerplate headers, template
    pages). Output: every candidate pair with its rank gap, Jaccard
    (NULL when either side has < 3 tokens), and the ≥ 0.5 verdict.

    Scale shape: the global sort rank comes from the two-pass
    distributed prefix sum (pid = clamped two-leading-char code, an
    O(#prefixes) control-plane collect — never a corpus window); the
    window expansion is an explode to ``SNM_WINDOW`` probe ranks + one
    equi-join on rank (fan-out W, linear); verification joins the
    bounded candidate list against per-doc shingle arrays. No quadratic
    pair scan anywhere — candidates are n·W by construction."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    keyed = d.select(
        "doc_id",
        F.substring(norm_text("text"), 1, SNM_KEY_LEN).alias("bkey"),
    ).withColumn("one", F.lit(1).cast("long"))
    # pid monotone in bkey: leading char code * 128 + clamped 2nd char
    # code (clamp keeps pids ordered even for multi-byte 2nd chars)
    pid = (
        F.ascii(F.substring("bkey", 1, 1)) * F.lit(128)
        + F.least(F.ascii(F.substring("bkey", 2, 1)), F.lit(127))
    ).cast("int")
    ranked, _ = distributed_prefix_sum(
        spark,
        keyed,
        pid=pid,
        order=[F.col("bkey"), F.col("doc_id")],
        value_col="one",
        cum_col="__cum",
        rank_col="rn",
    )
    ranked = ranked.select("doc_id", "rn")
    probes = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("rn").alias("rn_a"),
        F.explode(
            F.array(*[F.col("rn") + F.lit(i) for i in range(1, SNM_WINDOW + 1)])
        ).alias("rn_b"),
    )
    pairs = probes.join(
        ranked.select(F.col("doc_id").alias("doc_b"), F.col("rn").alias("rn_b")),
        "rn_b",
    )
    sh = shingled(d, ["doc_id"])
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.when(
        F.col("sh_a").isNotNull() & F.col("sh_b").isNotNull(),
        jaccard("sh_a", "sh_b"),
    )
    return (
        pairs.join(sa, "doc_a", "left")
        .join(sb, "doc_b", "left")
        .select(
            "doc_a",
            "doc_b",
            (F.col("rn_b") - F.col("rn_a")).alias("rank_gap"),
            jac.alias("jaccard"),
            F.coalesce(
                jac >= F.lit(JACCARD_THRESHOLD), F.lit(False)
            ).alias("is_near_dup"),
        )
    )


def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication report: how much of each source is exact
    duplicate content, and how much of that duplication crosses source
    boundaries — the scorecard a curation pipeline uses to decide which
    feeds to down-weight (within-source boilerplate vs cross-source
    syndication need different treatment).

    Scale shape: one fingerprint shuffle to the (source, fp) grain
    (map-side combined), a second agg over the ALREADY-GROUPED table to
    the fp grain (rows ≤ distinct contents, counts + distinct-source
    counts), then a join back on fp and a ≤|sources|-row final agg.
    Nothing rescans the corpus and no agg carries per-doc state."""
    d = t(spark, sf_dir, "documents")
    per_sf = (
        d.withColumn("fp", md5_fingerprint(norm_text("text")))
        .groupBy("source", "fp")
        .agg(F.count(F.lit(1)).alias("n_sf"))
    )
    per_fp = per_sf.groupBy("fp").agg(
        F.sum("n_sf").alias("n_copies"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    j = per_sf.join(per_fp, "fp")
    dup = F.when(F.col("n_copies") > 1, F.col("n_sf")).otherwise(F.lit(0))
    cross = F.when(F.col("n_sources") > 1, F.col("n_sf")).otherwise(F.lit(0))
    return j.groupBy("source").agg(
        F.sum("n_sf").alias("n_docs"),
        F.count(F.lit(1)).alias("n_unique_fps"),
        F.sum(dup).alias("n_dup_docs"),
        F.sum(cross).alias("n_cross_source_dup_docs"),
        (F.sum(dup).cast("double") / F.sum("n_sf").cast("double")).alias(
            "dup_rate"
        ),
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_lsh_incremental": dedup_lsh_incremental,
    "dedup_exact_flags": dedup_exact_flags,
    "dedup_block_exact": dedup_block_exact,
    "dedup_incremental": dedup_incremental,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_ngram_jaccard_prefix": dedup_ngram_jaccard_prefix,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_minhash_estimate_audit": dedup_minhash_estimate_audit,
    "dedup_minhash_band_tuning": dedup_minhash_band_tuning,
    "dedup_simhash": dedup_simhash,
    "dedup_clusters": dedup_clusters,
    "dedup_keep_best": dedup_keep_best,
    "dedup_decontaminate": dedup_decontaminate,
    "dedup_decontaminate_fixed": dedup_decontaminate_fixed,
    "dedup_edit_distance": dedup_edit_distance,
    "dedup_containment": dedup_containment,
    "doc_dup_aware_sampling": doc_dup_aware_sampling,
    "corpus_dedup_rate_by_source": corpus_dedup_rate_by_source,
    "dedup_sorted_neighborhood": dedup_sorted_neighborhood,
    "doc_duplicated_spans": doc_duplicated_spans,
}

_TOK_HASH = _DH64.format(expr="x")

# DuckDB mirror of minhash_signature_agg: same base hash, same
# (a·h + b) mod p constants ⇒ bit-identical signatures.
_MH_COLS = ",\n                 ".join(
    f"min(({MINHASH_A[s]} * (h & 2147483647) + {MINHASH_B[s]}) % {MINHASH_P}) AS mh{s}"
    for s in range(16)
)
_BAND_SELECTS = "\n          UNION ALL ".join(
    "SELECT doc_id, {b} AS band_idx, ".format(b=b)
    + " || ',' || ".join(f"CAST(mh{4 * b + r} AS VARCHAR)" for r in range(4))
    + " AS band_key FROM sig"
    for b in range(4)
)

ORACLES = {
    "dedup_exact": f"""
        SELECT md5({_NORM}) AS fp, min(doc_id) AS canonical_id, count(1) AS n_copies
        FROM documents GROUP BY 1
    """,
    "dedup_exact_flags": f"""
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY md5({_NORM})) AS canonical_id,
               doc_id <> min(doc_id) OVER (PARTITION BY md5({_NORM})) AS is_duplicate
        FROM documents
    """,
    "dedup_ngram_jaccard": f"""
        WITH sh AS MATERIALIZED ({_SHINGLES_CTE})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
                 AS jaccard
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
          AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
              >= {JACCARD_THRESHOLD}
    """,
    "dedup_minhash_lsh": f"""
        WITH sh AS MATERIALIZED ({_SHINGLES_CTE}),
        shnz AS (SELECT doc_id, shingles FROM sh WHERE len(shingles) > 0),
        hb AS (
          SELECT doc_id, {_TOK_HASH} AS h
          FROM (SELECT doc_id, unnest(shingles) AS x FROM shnz)
        ),
        sig AS (
          SELECT doc_id,
                 {_MH_COLS}
          FROM hb GROUP BY doc_id
        ),
        bands AS (
          {_BAND_SELECTS}
        ),
        cand AS (
          SELECT DISTINCT ba.doc_id AS doc_a, bb.doc_id AS doc_b
          FROM bands ba JOIN bands bb
            ON ba.band_idx = bb.band_idx AND ba.band_key = bb.band_key
           AND ba.doc_id < bb.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE)
                 AS jaccard
        FROM cand c
        JOIN shnz sa ON sa.doc_id = c.doc_a
        JOIN shnz sb ON sb.doc_id = c.doc_b
        WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE)
              >= {JACCARD_THRESHOLD}
    """,
    "dedup_minhash_estimate_audit": f"""
        WITH sh AS MATERIALIZED ({_SHINGLES_CTE}),
        shnz AS (SELECT doc_id, shingles FROM sh WHERE len(shingles) > 0),
        hb AS (
          SELECT doc_id, {_TOK_HASH} AS h
          FROM (SELECT doc_id, unnest(shingles) AS x FROM shnz)
        ),
        sig AS MATERIALIZED (
          SELECT doc_id,
                 {_MH_COLS}
          FROM hb GROUP BY doc_id
        ),
        bands AS (
          {_BAND_SELECTS}
        ),
        cand AS (
          SELECT DISTINCT ba.doc_id AS doc_a, bb.doc_id AS doc_b
          FROM bands ba JOIN bands bb
            ON ba.band_idx = bb.band_idx AND ba.band_key = bb.band_key
           AND ba.doc_id < bb.doc_id
        ),
        est AS (
          SELECT c.doc_a, c.doc_b,
                 CAST(({" + ".join(f"CASE WHEN sa.mh{s} = sb.mh{s} THEN 1 ELSE 0 END" for s in range(16))})
                      AS DOUBLE) / 16.0 AS mh_estimate
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.doc_a
          JOIN sig sb ON sb.doc_id = c.doc_b
        )
        SELECT e.doc_a, e.doc_b, e.mh_estimate,
               CAST(len(list_intersect(xa.shingles, xb.shingles)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(xa.shingles, xb.shingles))) AS DOUBLE)
                 AS jaccard,
               e.mh_estimate
                 - CAST(len(list_intersect(xa.shingles, xb.shingles)) AS DOUBLE)
                   / CAST(len(list_distinct(list_concat(xa.shingles, xb.shingles))) AS DOUBLE)
                 AS est_error
        FROM est e
        JOIN shnz xa ON xa.doc_id = e.doc_a
        JOIN shnz xb ON xb.doc_id = e.doc_b
    """,
    "dedup_simhash": f"""
        WITH sh AS MATERIALIZED ({_SHINGLES_CTE}),
        hs AS (
          SELECT doc_id, lang,
                 list_transform(shingles, x -> {_TOK_HASH}) AS hashes
          FROM sh WHERE len(shingles) > 0
        ),
        sg AS (
          SELECT doc_id, lang,
                 CAST(list_sum(list_transform(range(0, 60),
                   b -> CASE WHEN list_sum(list_transform(hashes,
                                hv -> ((hv >> b) & 1) * 2 - 1)) > 0
                             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
          FROM hs
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM sg a JOIN sg b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """,
}

# Connected components as a recursive CTE over the minhash pair graph:
# reach enumerates (node, reachable label); min per node = the same
# canonical representative the iterative Spark propagation converges to.
# Exact prefix filtering returns the identical result set, so the
# prefix variant shares the exhaustive-form oracle verbatim.
ORACLES["dedup_ngram_jaccard_prefix"] = ORACLES["dedup_ngram_jaccard"]

ORACLES["dedup_clusters"] = f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({ORACLES["dedup_minhash_lsh"]}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u FROM edges),
    reach AS (
      SELECT u AS node, u AS lbl FROM nodes
      UNION
      SELECT e.v AS node, r.lbl AS lbl
      FROM reach r JOIN edges e ON e.u = r.node
    )
    SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY 1
"""

ORACLES["dedup_keep_best"] = f"""
    WITH cl AS MATERIALIZED ({ORACLES["dedup_clusters"]})
    SELECT c.doc_id, c.cluster_id,
           row_number() OVER (
             PARTITION BY c.cluster_id
             ORDER BY d.n_chars DESC, c.doc_id ASC) = 1 AS keep
    FROM cl c JOIN documents d USING (doc_id)
"""

ORACLES["dedup_decontaminate"] = f"""
    WITH sh AS MATERIALIZED ({_SHINGLES_CTE}),
    shs AS (
      SELECT s.doc_id, d.source, s.shingles
      FROM sh s JOIN documents d USING (doc_id)
    ),
    ev AS (SELECT doc_id AS eval_id, unnest(shingles) AS shingle
           FROM shs WHERE source = '{DECONTAM_EVAL_SOURCE}'),
    tr AS (SELECT doc_id AS train_id, unnest(shingles) AS shingle
           FROM shs WHERE source <> '{DECONTAM_EVAL_SOURCE}'),
    ov AS (
      SELECT train_id, eval_id, count(1) AS n_shared
      FROM tr JOIN ev USING (shingle) GROUP BY 1, 2
    )
    SELECT train_id AS doc_id, count(1) AS n_eval_hits, max(n_shared) AS max_shared
    FROM ov WHERE n_shared >= {DECONTAM_MIN_SHARED} GROUP BY 1
"""

ORACLES["dedup_decontaminate_fixed"] = f"""
    WITH sh AS MATERIALIZED ({_SHINGLES_CTE}),
    shs AS (
      SELECT s.doc_id, d.source, s.shingles
      FROM sh s JOIN documents d USING (doc_id)
    ),
    ev AS (SELECT doc_id AS eval_id, unnest(shingles) AS shingle
           FROM shs WHERE source = '{DECONTAM_EVAL_SOURCE}'
             AND doc_id < {DECONTAM_FIXED_EVAL_CAP}),
    tr AS (SELECT doc_id AS train_id, unnest(shingles) AS shingle
           FROM shs WHERE source <> '{DECONTAM_EVAL_SOURCE}'),
    ov AS (
      SELECT train_id, eval_id, count(1) AS n_shared
      FROM tr JOIN ev USING (shingle) GROUP BY 1, 2
    )
    SELECT train_id AS doc_id, count(1) AS n_eval_hits, max(n_shared) AS max_shared
    FROM ov WHERE n_shared >= {DECONTAM_MIN_SHARED} GROUP BY 1
"""

# Mirror of dedup_edit_distance: same normalization, same
# (prefix, floor(len/16)) blocking key, and DuckDB's levenshtein is the
# same classic Wagner-Fischer distance Spark's levenshtein computes.
ORACLES["dedup_edit_distance"] = f"""
    WITH d AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    b AS (
      SELECT doc_id, nt, substr(nt, 1, {EDIT_PREFIX}) AS pfx,
             CAST(floor(len(nt) / {EDIT_LEN_BUCKET}.0) AS BIGINT) AS lb
      FROM d
    )
    SELECT doc_a, doc_b, dist, len_a, len_b,
           1.0 - CAST(dist AS DOUBLE)
               / CAST(greatest(len_a, len_b) AS DOUBLE) AS sim
    FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             levenshtein(a.nt, b.nt) AS dist,
             len(a.nt) AS len_a, len(b.nt) AS len_b
      FROM b a JOIN b b ON a.pfx = b.pfx AND a.lb = b.lb
                       AND a.doc_id < b.doc_id
    )
    WHERE dist <= {EDIT_MAX_DIST}
"""

# Mirror of dedup_containment: same distinct-shingle lists, pairwise
# intersection count via list_intersect, both containment directions.
ORACLES["dedup_containment"] = f"""
    WITH sh AS MATERIALIZED ({_SHINGLES_CTE})
    SELECT doc_a, doc_b, n_shared, containment_a, containment_b
    FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT)
               AS n_shared,
             CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / CAST(len(a.shingles) AS DOUBLE) AS containment_a,
             CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / CAST(len(b.shingles) AS DOUBLE) AS containment_b
      FROM sh a JOIN sh b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.shingles, b.shingles)) > 0
    )
    WHERE greatest(containment_a, containment_b) >= {CONTAIN_THRESHOLD}
"""

# Mirror of doc_dup_aware_sampling: the clusters CTE is dedup_clusters'
# oracle, singletons coalesce to their own id, one cluster-count window.
ORACLES["doc_dup_aware_sampling"] = f"""
    WITH cl AS MATERIALIZED ({ORACLES["dedup_clusters"]}),
    j AS (
      SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
    ),
    s AS (
      SELECT *, count(1) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM j
    )
    SELECT doc_id, cluster_id, cluster_size,
           CAST(1.0 AS DOUBLE) / CAST(cluster_size AS DOUBLE)
             AS sample_weight
    FROM s
"""

# Mirror of dedup_block_exact: full BLOCK_N-token blocks, md5 over the
# space-joined slice, min packed (doc_id, block_idx) owner per fp.
ORACLES["dedup_block_exact"] = f"""
    WITH blocks AS (
      SELECT doc_id,
             CAST(unnest(range(0, n_blocks)) AS INT) AS block_idx,
             unnest(list_transform(range(0, n_blocks),
               b -> md5(array_to_string(
                      list_slice(toks, b * {BLOCK_N} + 1,
                                 b * {BLOCK_N} + {BLOCK_N}), ' '))))
               AS fp
      FROM (
        SELECT doc_id, {_TOKS} AS toks,
               CAST(floor(len({_TOKS}) / {BLOCK_N}.0) AS INT) AS n_blocks
        FROM documents
      )
      WHERE n_blocks > 0
    ),
    keyed AS (
      SELECT doc_id, fp,
             doc_id * {_BLOCK_SHIFT} + block_idx AS pos_key
      FROM blocks
    ),
    owners AS (
      SELECT fp, min(pos_key) AS owner_key FROM keyed GROUP BY fp
    )
    SELECT doc_id, count(1) AS n_blocks,
           CAST(sum(CASE WHEN pos_key > owner_key THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_blocks
    FROM keyed JOIN owners USING (fp)
    GROUP BY doc_id
"""

# Mirror of dedup_incremental: batch slice doc_id % 4 = 3, base fps
# distinct, LEFT join + batch-local first occurrence.
ORACLES["dedup_incremental"] = f"""
    WITH d AS (
      SELECT doc_id, source, md5({_NORM}) AS fp FROM documents
    ),
    base_fps AS (
      SELECT DISTINCT fp FROM d WHERE doc_id % 4 <> 3
    ),
    batch AS (
      SELECT * FROM d WHERE doc_id % 4 = 3
    ),
    first_in_batch AS (
      SELECT fp, min(doc_id) AS first_batch_id FROM batch GROUP BY fp
    )
    SELECT source,
           CASE WHEN b.fp IN (SELECT fp FROM base_fps) THEN 'dup_of_base'
                WHEN b.doc_id > f.first_batch_id THEN 'dup_in_batch'
                ELSE 'new' END AS status,
           count(1) AS n_docs
    FROM batch b JOIN first_in_batch f ON b.fp = f.fp
    GROUP BY 1, 2
"""

# Mirror of dedup_lsh_incremental: same signatures/bands CTEs as the
# minhash oracle, batch/base split on doc_id % 4, first-occurrence rule
# via the smaller-id in-batch partner.
_J_SQL = (
    "CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)"
    " / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles)))"
    " AS DOUBLE)"
)
ORACLES["dedup_lsh_incremental"] = f"""
    WITH sh AS MATERIALIZED ({_SHINGLES_CTE}),
    shnz AS (SELECT doc_id, shingles FROM sh WHERE len(shingles) > 0),
    hb AS (
      SELECT doc_id, {_TOK_HASH} AS h
      FROM (SELECT doc_id, unnest(shingles) AS x FROM shnz)
    ),
    sig AS (
      SELECT doc_id,
             {_MH_COLS}
      FROM hb GROUP BY doc_id
    ),
    bands AS MATERIALIZED (
      {_BAND_SELECTS}
    ),
    vb AS (
      SELECT DISTINCT nb.doc_id AS doc
      FROM bands nb
      JOIN bands ob
        ON nb.band_idx = ob.band_idx AND nb.band_key = ob.band_key
       AND nb.doc_id % 4 = 3 AND ob.doc_id % 4 <> 3
      JOIN shnz sa ON sa.doc_id = nb.doc_id
      JOIN shnz sb ON sb.doc_id = ob.doc_id
      WHERE {_J_SQL} >= {JACCARD_THRESHOLD}
    ),
    vbatch AS (
      SELECT DISTINCT ba.doc_id AS doc
      FROM bands ba
      JOIN bands bb
        ON ba.band_idx = bb.band_idx AND ba.band_key = bb.band_key
       AND ba.doc_id % 4 = 3 AND bb.doc_id % 4 = 3
       AND bb.doc_id < ba.doc_id
      JOIN shnz sa ON sa.doc_id = ba.doc_id
      JOIN shnz sb ON sb.doc_id = bb.doc_id
      WHERE {_J_SQL} >= {JACCARD_THRESHOLD}
    )
    SELECT source, status, count(1) AS n_docs FROM (
      SELECT d.source,
             CASE WHEN vb.doc IS NOT NULL THEN 'neardup_of_base'
                  WHEN v2.doc IS NOT NULL THEN 'neardup_in_batch'
                  ELSE 'new' END AS status
      FROM documents d
      LEFT JOIN vb ON d.doc_id = vb.doc
      LEFT JOIN vbatch v2 ON d.doc_id = v2.doc
      WHERE d.doc_id % 4 = 3
    ) GROUP BY 1, 2
"""

ORACLES["corpus_dedup_rate_by_source"] = f"""
    WITH per_sf AS (
      SELECT source, md5({_NORM}) AS fp, count(1) AS n_sf
      FROM documents GROUP BY 1, 2
    ),
    per_fp AS (
      SELECT fp, CAST(sum(n_sf) AS BIGINT) AS n_copies,
             count(1) AS n_sources
      FROM per_sf GROUP BY 1
    )
    SELECT source,
           CAST(sum(n_sf) AS BIGINT) AS n_docs,
           count(1) AS n_unique_fps,
           CAST(sum(CASE WHEN n_copies > 1 THEN n_sf ELSE 0 END)
                AS BIGINT) AS n_dup_docs,
           CAST(sum(CASE WHEN n_sources > 1 THEN n_sf ELSE 0 END)
                AS BIGINT) AS n_cross_source_dup_docs,
           CAST(sum(CASE WHEN n_copies > 1 THEN n_sf ELSE 0 END) AS DOUBLE)
             / CAST(sum(n_sf) AS BIGINT) AS dup_rate
    FROM per_sf JOIN per_fp USING (fp)
    GROUP BY 1
"""

ORACLES["dedup_sorted_neighborhood"] = f"""
    WITH ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY substr({_NORM}, 1, {SNM_KEY_LEN}),
                                doc_id) AS rn
      FROM documents
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, b.rn - a.rn AS rank_gap
      FROM ranked a JOIN ranked b
        ON b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW}
    ),
    sh AS MATERIALIZED ({_SHINGLES_CTE}),
    scored AS (
      SELECT c.doc_a, c.doc_b, c.rank_gap,
             CASE WHEN len(sa.shingles) > 0 AND len(sb.shingles) > 0 THEN
               CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles)))
                        AS DOUBLE)
             END AS jaccard
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, rank_gap, jaccard,
           coalesce(jaccard >= {JACCARD_THRESHOLD}, false) AS is_near_dup
    FROM scored
"""

_SPAN_H = _DH64.format(expr=f"substr(nt, start, {SPAN_LEN})")
ORACLES["doc_duplicated_spans"] = f"""
    WITH nd AS (
      SELECT doc_id, {_NORM} AS nt, len({_NORM}) AS n FROM documents
    ),
    win0 AS (
      SELECT doc_id, nt,
             CAST(unnest(generate_series(1, CAST(n AS INT) - {SPAN_LEN - 1},
                                         {SPAN_STRIDE})) AS INT) AS start
      FROM nd WHERE n >= {SPAN_LEN}
    ),
    win AS (
      SELECT doc_id, start, {_SPAN_H} AS h FROM win0
    ),
    dup AS (
      SELECT h FROM win GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ),
    shared AS (SELECT w.* FROM win w WHERE w.h IN (SELECT h FROM dup)),
    flagged AS (
      SELECT doc_id, start,
             CASE WHEN start > coalesce(max(start + {SPAN_LEN}) OVER (
                    PARTITION BY doc_id ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS is_new
      FROM shared
    ),
    isl AS (
      SELECT doc_id, start,
             sum(is_new) OVER (PARTITION BY doc_id ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, island, min(start) AS s, max(start) + {SPAN_LEN} AS e
      FROM isl GROUP BY 1, 2
    ),
    cov AS (
      SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS covered_chars,
             count(1) AS n_spans
      FROM spans GROUP BY 1
    ),
    shc AS (
      SELECT doc_id, count(1) AS n_shared_windows FROM shared GROUP BY 1
    )
    SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_chars_norm,
           CAST(CASE WHEN d.n >= {SPAN_LEN}
                THEN (d.n - {SPAN_LEN}) // {SPAN_STRIDE} + 1
                ELSE 0 END AS BIGINT) AS n_windows,
           coalesce(s.n_shared_windows, 0) AS n_shared_windows,
           coalesce(c.n_spans, 0) AS n_spans,
           coalesce(c.covered_chars, 0) AS covered_chars,
           CASE WHEN d.n > 0 THEN
             CAST(coalesce(c.covered_chars, 0) AS DOUBLE)
               / CAST(d.n AS DOUBLE)
           END AS dup_char_fraction
    FROM nd d
    LEFT JOIN shc s ON s.doc_id = d.doc_id
    LEFT JOIN cov c ON c.doc_id = d.doc_id
"""


def _tune_band_selects(bands: int, rows: int) -> str:
    """Parameterized mirror of operators/dedup.lsh_band_keys for the
    tuning oracle: comma-joined mh{b*rows+r} per band."""
    return "\n          UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        + " || ',' || ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        + " AS band_key FROM sig"
        for b in range(bands)
    )


_TUNE_CONFIG_CTES = ",\n        ".join(
    f"""bands_{b}_{r} AS ({_tune_band_selects(b, r)}),
        cand_{b}_{r} AS (
          SELECT DISTINCT {b} AS bands, {r} AS rows_per_band,
                 ba.doc_id AS doc_a, bb.doc_id AS doc_b
          FROM bands_{b}_{r} ba JOIN bands_{b}_{r} bb
            ON ba.band_idx = bb.band_idx AND ba.band_key = bb.band_key
           AND ba.doc_id < bb.doc_id
        )"""
    for b, r in LSH_TUNE_CONFIGS
)

ORACLES["dedup_minhash_band_tuning"] = f"""
    WITH sh AS MATERIALIZED ({_SHINGLES_CTE}),
    shnz AS (SELECT doc_id, shingles FROM sh WHERE len(shingles) > 0),
    hb AS (
      SELECT doc_id, {_TOK_HASH} AS h
      FROM (SELECT doc_id, unnest(shingles) AS x FROM shnz)
    ),
    sig AS MATERIALIZED (
      SELECT doc_id,
             {_MH_COLS}
      FROM hb GROUP BY doc_id
    ),
    -- truth: J >= t > 0 requires >= 1 shared shingle, so the
    -- shared-shingle candidate join is EXHAUSTIVELY equivalent to the
    -- old all-pairs scan (which took >12 min at sf0.1 on the 50k-vocab
    -- corpus) while staying posting-list-shaped.
    shx AS MATERIALIZED (
      SELECT doc_id, unnest(shingles) AS s FROM shnz
    ),
    tcand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM shx a JOIN shx b ON a.s = b.s AND a.doc_id < b.doc_id
    ),
    truth AS MATERIALIZED (
      SELECT c.doc_a, c.doc_b
      FROM tcand c
      JOIN shnz a ON a.doc_id = c.doc_a
      JOIN shnz b ON b.doc_id = c.doc_b
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(a.shingles, b.shingles)))
                     AS DOUBLE)
            >= {JACCARD_THRESHOLD}
    ),
    tn AS (SELECT count(1) AS n_truth FROM truth),
    {_TUNE_CONFIG_CTES},
    allc AS (
      {" UNION ALL ".join(f"SELECT * FROM cand_{b}_{r}" for b, r in LSH_TUNE_CONFIGS)}
    ),
    rep AS (
      SELECT c.bands, c.rows_per_band,
             count(1) AS n_candidates,
             CAST(sum(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits
      FROM allc c
      LEFT JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
      GROUP BY 1, 2
    ),
    cfg AS (
      SELECT * FROM (VALUES {", ".join(f"({b}, {r})" for b, r in LSH_TUNE_CONFIGS)})
        v(bands, rows_per_band)
    )
    SELECT CAST(cfg.bands AS INTEGER) AS bands,
           CAST(cfg.rows_per_band AS INTEGER) AS rows_per_band,
           CAST(COALESCE(rep.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(rep.n_hits, 0) AS BIGINT) AS n_hits,
           tn.n_truth,
           CASE WHEN COALESCE(rep.n_candidates, 0) > 0
                THEN CAST(COALESCE(rep.n_hits, 0) AS DOUBLE)
                       / CAST(rep.n_candidates AS DOUBLE)
           END AS precision,
           CASE WHEN tn.n_truth > 0
                THEN CAST(COALESCE(rep.n_hits, 0) AS DOUBLE)
                       / CAST(tn.n_truth AS DOUBLE)
           END AS recall
    FROM cfg
    LEFT JOIN rep ON rep.bands = cfg.bands
                 AND rep.rows_per_band = cfg.rows_per_band
    CROSS JOIN tn
"""
