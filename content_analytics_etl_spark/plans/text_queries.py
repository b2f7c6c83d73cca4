"""Text analysis over the ``documents`` table (BASELINE extension:
language-ID heuristic, quality scoring, token counting, fingerprinting,
token/n-gram frequency).

Everything is built-in expressions (split / higher-order array funcs /
md5) — scan-speed, shuffle only for the global frequency aggregations,
and every query oracle-checked. At 100 TB these all scale linearly:
per-row ops have no shuffle at all; the frequency aggs shuffle compact
(token, count) pairs after map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import md5_fingerprint
from ..functions.text_metrics import marker_hits, norm_text, tokens
from ..operators.dedup import shingle_rows
from ..operators.prefix_sum import distributed_prefix_sum, ieee_bucket_asc, ieee_bucket_desc
from ..cache import session_materialized
from ._util import (
    DEC,
    materialize_and_release,
    rank_limited,
    source_fingerprint,
    t,
)

# Marker vocabularies for the language-ID heuristic. The synthetic corpus
# draws from one shared vocabulary, so these partition that vocabulary
# into disjoint marker sets; on real data they'd be per-language stopword
# lists. Deterministic and oracle-expressible either way.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "data", "query", "table"),
    "de": ("scan", "join", "merge", "hash"),
    "es": ("fast", "slow", "big", "small"),
    "fr": ("row", "column", "line", "value"),
}

STOPWORDS = ("the", "a", "of", "and", "to")

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS_SQL = f"string_split({_NORM_SQL}, ' ')"


def _in_list(vals: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{v}'" for v in vals) + ")"


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: total, distinct, avg token length per doc."""
    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    total_len = F.length(F.regexp_replace(norm_text("text"), " ", ""))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (total_len.cast("double") / n.cast("double")).alias("avg_token_len"),
    )


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, long-token ratio, composite
    score, keep/drop flag — the standard pre-training corpus filter."""
    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks).cast("double")
    n_stop = marker_hits(toks, STOPWORDS).cast("double")
    n_long = F.size(F.filter(toks, lambda x: F.length(x) >= 5)).cast("double")
    stop_ratio = n_stop / n
    long_ratio = n_long / n
    score = (1 - stop_ratio) * 0.5 + long_ratio * 0.5
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        long_ratio.alias("long_token_ratio"),
        score.alias("quality_score"),
        (score > 0.4).alias("keep"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-set hit counts, argmax with a fixed
    tie order (the reference's F4 argmax pattern applied to text)."""
    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    hit_cols = {f"hits_{lang}": marker_hits(toks, m) for lang, m in LANG_MARKERS.items()}
    df = d.select("doc_id", "lang", *[c.alias(name) for name, c in hit_cols.items()])
    best = F.greatest(*[F.col(name) for name in hit_cols])
    pred: Column | None = None
    for lang in LANG_MARKERS:
        cond = F.col(f"hits_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return df.select(
        "doc_id",
        "lang",
        *hit_cols.keys(),
        pred.alias("lang_pred"),
    )


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-accuracy audit for the lang_id heuristic: the
    confusion matrix of predicted vs labeled language, with per-cell
    share of the labeled class — the table that tells you whether the
    marker sets are good enough BEFORE the prediction drives a
    filtering decision (same measure-don't-guess discipline as the
    sketch audits). One aggregation over lang_id's own output, so the
    audit can never drift from the classifier it grades."""
    preds = lang_id(spark, sf_dir).select("lang", "lang_pred")
    per_label = preds.groupBy("lang").agg(F.count(F.lit(1)).alias("n_label"))
    return (
        preds.groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(per_label, "lang")
        .select(
            "lang",
            "lang_pred",
            "n",
            (F.col("n").cast("double") / F.col("n_label").cast("double")).alias(
                "label_share"
            ),
        )
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint of normalized text (md5) + portable 64-bit
    form — the key for exact dedup."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        md5_fingerprint(norm_text("text")).alias("fp_md5"),
        F.conv(F.substring(F.md5(norm_text("text")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("fp64"),
    )


def token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency + document frequency (explode → agg)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
    )


def bigram_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global word-bigram frequency — r9: re-aggregated from the shared
    session-materialized per-(doc, w1, w2) count table
    (``_lm_bigram_counts``, one corpus explode for the whole bigram
    family), so the input is |distinct doc-bigram| rows instead of
    |corpus bigrams| and the corpus is exploded once per snapshot."""
    x = _lm_bigram_counts(spark, sf_dir)
    return x.groupBy(
        F.concat_ws(" ", "w1", "w2").alias("bigram")
    ).agg(F.sum("x").alias("n"))


BLOCKLIST = ("dup", "slow", "small")  # stand-in badwords lexicon
BLOCK_RATIO_MAX = 0.05  # soft gate: tolerate < 5% blocked tokens


def doc_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon blocklist gate — the C4 "bad words" filter posture: per
    document, the count and ratio of tokens in a blocklist, the strict
    C4 verdict (ANY hit drops the page) and the soft ratio gate modern
    pipelines prefer (tolerate incidental mentions below
    ``BLOCK_RATIO_MAX``). Pure per-row expression work over one scan —
    the filter any 100 TB ingest runs first because it is free."""
    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    hits = marker_hits(toks, BLOCKLIST)
    ratio = hits.cast("double") / n.cast("double")
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        hits.alias("n_blocked"),
        ratio.alias("blocked_ratio"),
        (hits == 0).alias("keep_strict"),
        (ratio < BLOCK_RATIO_MAX).alias("keep_soft"),
    )


VOCAB_CUTOFFS = [4, 16, 64, 256, 1024]


def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer merge-table sizing: what share of all corpus bigram
    occurrences do the top-K most frequent bigrams cover, for K in
    ``VOCAB_CUTOFFS``? This is the coverage curve a BPE vocab budget is
    read off of (the knee says when bigger merge tables stop paying).

    The global frequency rank uses the distributed prefix-sum operator
    (deterministic quantile buckets → per-bucket window + broadcast
    offsets), never a corpus-wide single-partition window; the cutoff
    table is a 5-row literal frame, so the rank ≤ K theta join is a
    broadcast of the tiny side against the vocab-sized ranked frame.
    At 100 TB the ranked frame is vocab-sized (millions), not
    corpus-sized — every stage stays keyed/bounded."""
    # r15: single reference now (no quantile boundary pass) — the
    # bigram aggregate is evaluated once inside the prefix sum
    bg = bigram_frequency(spark, sf_dir)
    ranked, total = distributed_prefix_sum(
        spark,
        bg,
        pid=ieee_bucket_desc("n"),
        order=[F.col("n").desc(), F.col("bigram")],
        value_col="n",
        cum_col="cum",
        rank_col="rank",
    )
    cuts = spark.createDataFrame(
        [(c,) for c in VOCAB_CUTOFFS], "cutoff int"
    )
    return (
        ranked.join(F.broadcast(cuts), F.col("rank") <= F.col("cutoff"))
        .groupBy("cutoff")
        .agg(
            F.max("rank").alias("n_types"),
            F.max("cum").alias("covered_occurrences"),
            F.lit(int(total)).cast("bigint").alias("total_occurrences"),
            (F.max("cum").cast("double") / F.lit(float(total))).alias(
                "coverage"
            ),
        )
    )


def doc_subword_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: pre-tokenizer pieces via the regex
    ``[a-z]+|[0-9]+|[^a-z0-9 ]`` (letter runs / digit runs / single
    punctuation — the GPT-2-style pre-split shape) next to whitespace
    tokens, plus the pieces-per-word ratio that LLM-data pipelines use
    to budget token counts before running a real BPE."""
    d = t(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(norm_text("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    n_pieces = F.size(pieces)
    n_words = F.size(tokens("text"))
    return d.select(
        "doc_id",
        n_pieces.alias("n_subword_pieces"),
        n_words.alias("n_ws_tokens"),
        (n_pieces.cast("double") / n_words.cast("double")).alias("pieces_per_word"),
    )


BPE_TOP_MERGES = 10


def bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE tokenizer TRAINING, relationally: count
    adjacent character pairs across the corpus weighted by word
    frequency and report the top ``BPE_TOP_MERGES`` merge candidates —
    exactly the statistic a byte-pair-encoding trainer maximizes each
    round (doc_subword_counts APPLIES a fixed pre-tokenizer; this is
    the other direction, inducing one from the corpus).

    Scale shape: pair counting runs over the (word, wf) relation
    (|vocab| rows — the PERF-18 build-from-the-aggregate discipline,
    NOT the raw token stream), explodes ≤ len(word) compact pairs per
    word, and the top-k is TakeOrderedAndProject (per-partition top-k
    + a k-row merge, never a global sort). Ties break on pair text, so
    the k-boundary is deterministic in both engines."""
    d = t(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    pairs = wf.filter(F.length("w") >= 2).select(
        "wf",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOP_MERGES)
    )


ROLLING_B = 31
ROLLING_M = 2147483647  # 2³¹ − 1; acc·31 + 255 < 2³⁶, overflow-free


def doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint via the Rabin-Karp polynomial rolling hash
    h = fold(chars, (acc, c) → (acc·B + c) mod M) over normalized text —
    the recurrence that makes windowed/winnowing fingerprints O(1) per
    step at scale (the whole-doc value doubles as an exact-dup key)."""
    d = t(spark, sf_dir, "documents")
    chars = F.split(norm_text("text"), "")
    h = F.aggregate(
        F.transform(chars, F.ascii),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * ROLLING_B + x.cast("bigint")) % ROLLING_M,
    )
    return d.select("doc_id", h.alias("rolling_hash"))


PMI_WINDOW = 3  # co-occurrence: tokens within 3 positions
PMI_MIN_COOC = 5
PMI_TOP = 50


def token_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-association mining: pointwise mutual information of token
    pairs co-occurring within a ±3-position window — the classic
    collocation detector (PMI ≫ 0 = the pair is a phrase/collocation,
    not a chance meeting). Top 50 pairs with ≥ 5 co-occurrences by
    (PMI desc, pair asc).

    Scale shape: the pair generation is a POSITIONAL BAND join — each
    (doc, pos) row meets only positions pos+1..pos+3 of the same doc
    via an equi-join on (doc_id, pos+k) per offset, so fan-out is a
    constant 3 per token, linear in corpus size (never a same-token
    posting-list self-join). Unigram and pair counts are integer aggs;
    PMI = log2((c_ab·T)/(c_a·c_b)) over exact-integer-derived doubles,
    grid-snapped to 9 dp like every transcendental in this module. The
    final top-k ranks the aggregated pair table (audit-certified
    aggregate-then-rank shape); the totals are 1-row broadcasts."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "token")
    )
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    # shift NEGATIVE: the right row landing at pos i carries the token
    # from i+k, so (token_a@i, token_b@i+k) reads left-to-right
    shifted = [
        tok.select(
            "doc_id",
            (F.col("pos") - k).alias("pos"),
            F.col("token").alias("token_b"),
        )
        for k in range(1, PMI_WINDOW + 1)
    ]
    right = shifted[0]
    for s in shifted[1:]:
        right = right.unionAll(s)
    pairs = (
        tok.select("doc_id", "pos", F.col("token").alias("token_a"))
        .join(right, ["doc_id", "pos"])
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("n_cooc"))
        .filter(F.col("n_cooc") >= PMI_MIN_COOC)
    )
    # exact pair total: a doc of n tokens yields Σ_{k=1..3} max(n−k, 0)
    # windowed pairs (the 3n−6 shortcut is wrong for 1-2 token docs)
    tot_pairs = (
        tok.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(
                sum(
                    F.greatest(F.col("n") - F.lit(k), F.lit(0))
                    for k in range(1, PMI_WINDOW + 1)
                )
            ).alias("_tp")
        )
    )
    ua = uni.select(F.col("token").alias("token_a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("token").alias("token_b"), F.col("c").alias("c_b"))
    pmi = F.round(
        F.log2(
            (F.col("n_cooc").cast("double") * F.col("_tp").cast("double"))
            / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
        ),
        9,
    )
    scored = (
        pairs.join(ua, "token_a")
        .join(ub, "token_b")
        .crossJoin(F.broadcast(tot_pairs))
        .select("token_a", "token_b", "n_cooc", pmi.alias("pmi"))
    )
    # explicit orderBy().limit(k) → TakeOrderedAndProject (per-partition
    # top-k, k-row merge); the rank window then runs over k rows only.
    # VERDICT r4 #3: the row_number ≤ k form relied on Spark's unasserted
    # window-group-limit rewrite — plan-shape-tested now.
    topk = scored.orderBy(
        F.col("pmi").desc(), "token_a", "token_b"
    ).limit(PMI_TOP)
    return rank_limited(
        topk,
        [-F.col("pmi"), F.col("token_a"), F.col("token_b")],
        ["token_a", "token_b", "n_cooc", "pmi"],
    )


RAKE_TOP = 3


def doc_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) — unsupervised
    keyphrase tagging for corpus topic indexing: candidate phrases are
    maximal stopword-free token runs; each word scores deg(w)/freq(w)
    within its document (deg = summed length of phrases containing w);
    a phrase scores the sum of its words' scores; top 3 phrases per doc.

    Fully relational: the phrase id is a running stopword count (one
    doc-keyed window), word stats are INTEGER sums (deg, freq — no
    float hazard), and the one cross-word float reduction (the phrase
    score) uses the PERF-29 fixed-point form (floor(score·10⁹ + 0.5)
    summed as BIGINT) so both engines agree bit-for-bit. Identical
    phrase strings within a doc collapse before ranking (their scores
    are identical by construction), keeping the (score desc, phrase)
    rank a total order. Everything is keyed by doc_id — explode, three
    compact aggs, one ranking window; linear at any corpus size."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "token")
    )
    stop = F.col("token").isin(*STOPWORDS)
    w_run = W.partitionBy("doc_id").orderBy("pos")
    tok = tok.withColumn(
        "phrase_id", F.sum(stop.cast("int")).over(w_run)
    ).filter(~stop)
    plen = F.count(F.lit(1)).over(W.partitionBy("doc_id", "phrase_id"))
    member = tok.withColumn("plen", plen)
    wordstat = member.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    scored = member.join(wordstat, ["doc_id", "token"]).withColumn(
        "wscore", F.col("deg").cast("double") / F.col("freq").cast("double")
    )
    fixp = F.floor(F.col("wscore") * F.lit(1e9) + F.lit(0.5)).cast("bigint")
    phrases = scored.groupBy("doc_id", "phrase_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("n_words"),
        (F.sum(fixp).cast("double") / F.lit(1e9)).alias("rake_score"),
    )
    uniq = phrases.groupBy("doc_id", "phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.max("n_words").alias("n_words"),
        F.max("rake_score").alias("rake_score"),
    )
    wr = W.partitionBy("doc_id").orderBy(
        F.col("rake_score").desc(), F.col("phrase")
    )
    return uniq.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= RAKE_TOP
    )


def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    gibberish/binary-spill quality gate (mojibake and base64 blobs sit
    far above natural-language entropy, repeated-char spam far below).
    H = log2(n) − (Σ c·log2(c))/n over per-character counts c of the
    normalized text, so the only transcendental inputs are log2 of
    SHARED INTEGERS — snapped to the 9 dp grid exactly like
    ``doc_lm_perplexity``'s — and the per-doc reduction is FIXED-POINT
    (floor(term·10⁹ + 0.5) summed as exact BIGINT, the PERF-29 form:
    many-cell double→DECIMAL casts eventually hit the rounding boundary
    where the engines disagree), making H bit-identical across engines
    and partitionings.

    Scale shape: explode to (doc, char) rows → two map-side-combined
    aggs (per-(doc,char) count, then per-doc). The char alphabet bounds
    the first agg's fan-in (≤ alphabet size per doc), so state is tiny
    however long the document."""
    d = t(spark, sf_dir, "documents")
    ch = d.select(
        "doc_id", F.explode(F.split(norm_text("text"), "")).alias("ch")
    )
    per = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    bits_fp = F.floor(
        F.col("cnt").cast("double")
        * F.round(F.log2(F.col("cnt").cast("double")), 9)
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("bigint")
    agg = per.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_chars_norm"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        (F.sum(bits_fp).cast("double") / F.lit(1e9)).alias("_bits"),
    )
    ent = F.round(F.log2(F.col("n_chars_norm").cast("double")), 9) - F.col(
        "_bits"
    ) / F.col("n_chars_norm").cast("double")
    return agg.select(
        "doc_id", "n_chars_norm", "n_distinct_chars", ent.alias("entropy_bits")
    )


SAMPLE_BUCKETS = 10
SAMPLE_KEEP = 2  # keep buckets 0,1 → deterministic 20 %


def doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep ~20% of docs per lang by
    hash-bucketing the doc_id (portable md5 hash mod 10 < 2).

    ``df.sample``/``sampleBy`` draw from an RNG — irreproducible across
    runs/engines and unstable under repartitioning. Hash sampling is the
    training-data-pipeline standard: the same doc is in or out forever,
    on any engine, at any parallelism; per-stratum rates are just
    per-key bucket predicates. Pure scan-side filter — no shuffle, and
    at 100 TB the sample never materializes the rejected rows."""
    d = t(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint"),
        F.lit(SAMPLE_BUCKETS),
    )
    return d.filter(bucket < SAMPLE_KEEP).select("doc_id", "lang", "n_chars")


def doc_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus mix report — docs, tokens, chars, and each
    source's share of the total token budget (what a pre-training data
    recipe balances). One partial+final agg over compact per-source
    rows; the grand total is a 1-row broadcast (constant fan-out at any
    scale, same shape as ``doc_tfidf_top_terms``'s corpus-size frame)."""
    d = t(spark, sf_dir, "documents")
    per = (
        d.select("source", F.size(tokens("text")).alias("n_toks"), "n_chars")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
    tot = per.agg(F.sum("n_tokens").alias("_tot"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "sum_chars",
        (F.col("n_tokens").cast("double") / F.col("_tot").cast("double")).alias(
            "token_share"
        ),
    )


MIX_MAX_EPOCHS = 4.0  # upsampling cap: repeat a cell at most 4 epochs


def corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalancing plan — the step after ``doc_source_mix``
    measures the corpus: given a uniform target share per (source, lang)
    cell, emit each cell's sampling weight, its epoch count (the weight
    capped at ``MIX_MAX_EPOCHS`` — the standard guard against repeating
    a tiny source until it memorizes), the token budget the rebalanced
    mix draws from the cell, and the cell's share of the rebalanced
    corpus. This is the deterministic skeleton of a DoReMi/Pile-style
    mixture recipe: downstream sampling multiplies each cell's rows by
    ``epochs``.

    Scale shape: one map-side-combined agg to |source|×|lang| rows, then
    every global quantity (total tokens, cell count, rebalanced total)
    is a 1-row broadcast onto that tiny frame — no windowed global sum
    over corpus rows, no single-partition exchange of anything wider
    than the cell table.

    Determinism: shares and epoch caps are per-row double arithmetic;
    the only cross-row double reduction (the rebalanced token total) is
    FIXED-POINT — floor(x·10³ + 0.5) summed as exact BIGINT (PERF 29:
    double→DECIMAL casts are not engine-portable at the rounding
    boundary, and the wide-decimal→double cast diverges above ~16
    significant digits; milli-token precision keeps the sum within
    int64 at any corpus size)."""
    d = t(spark, sf_dir, "documents")
    per = (
        d.select("source", "lang", F.size(tokens("text")).alias("n_toks"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_tot"), F.count(F.lit(1)).alias("_cells")
    )
    base = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "lang",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("_tot").cast("double")).alias(
            "token_share"
        ),
        (F.lit(1.0) / F.col("_cells").cast("double")).alias("target_share"),
    )
    exp = base.withColumn(
        "epochs",
        F.least(
            F.col("target_share") / F.col("token_share"), F.lit(MIX_MAX_EPOCHS)
        ),
    ).withColumn(
        "expected_tokens", F.col("n_tokens").cast("double") * F.col("epochs")
    )
    etot = exp.agg(
        (
            F.sum(
                F.floor(
                    F.col("expected_tokens") * F.lit(1e3) + F.lit(0.5)
                ).cast("bigint")
            ).cast("double")
            / F.lit(1e3)
        ).alias("_etot")
    )
    return exp.crossJoin(F.broadcast(etot)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        "token_share",
        "target_share",
        "epochs",
        "expected_tokens",
        (F.col("expected_tokens") / F.col("_etot")).alias("expected_share"),
    )


EMAIL_RE = "[a-z0-9]+@[a-z]+[.][a-z]+"
PHONE_RE = "[+]1-[0-9]{3}-[0-9]{4}"
GATE_MIN_TOKENS = 20
GATE_MAX_TOKENS = 100_000
GATE_MIN_AVG_LEN = 2.0
GATE_MAX_AVG_LEN = 12.0
GATE_MAX_TOP_SHARE = 0.25
GATE_MIN_DISTINCT_RATIO = 0.05


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — a mandatory pass in any training-data pipeline.
    The corpus is synthetic word-soup, so deterministic PII (an email
    and a phone derived from doc_id) is INJECTED relationally first and
    then scrubbed by regex; the oracle mirrors both steps, so the hash
    match proves the scrubber actually found and replaced every
    occurrence. Pure per-row regexp work — scan-speed, no shuffle, and
    the patterns are shared Java/RE2-compatible syntax."""
    d = t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(raw, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(raw, F.lit(PHONE_RE)).alias("n_phones"),
        md5_fingerprint(scrubbed).alias("scrubbed_fp"),
        (F.length(raw) - F.length(scrubbed)).alias("chars_removed"),
    )


def doc_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gates, each reported separately so corpus
    curation can see WHY a document fails: token-count bounds, mean
    token length bounds, top-token dominance (repetition proxy),
    type-token ratio. One explode-free pass + a per-doc mode via
    aggregate-over-grouped tokens (compact shuffle)."""
    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    base = d.select("doc_id", toks.alias("toks"))
    tok_rows = base.select("doc_id", F.explode("toks").alias("tok"))
    top = (
        tok_rows.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_tok_count"))
    )
    n = F.size("toks")
    avg_len = (
        F.aggregate(
            F.col("toks"), F.lit(0), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / n.cast("double")
    )
    stats = base.select(
        "doc_id",
        n.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    ).join(top, "doc_id")
    g_count = F.col("n_tokens").between(GATE_MIN_TOKENS, GATE_MAX_TOKENS)
    g_len = F.col("avg_token_len").between(GATE_MIN_AVG_LEN, GATE_MAX_AVG_LEN)
    g_dom = (
        F.col("top_tok_count").cast("double") / F.col("n_tokens").cast("double")
    ) <= GATE_MAX_TOP_SHARE
    g_ttr = (
        F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")
    ) >= GATE_MIN_DISTINCT_RATIO
    return stats.select(
        "doc_id",
        "n_tokens",
        g_count.alias("pass_token_count"),
        g_len.alias("pass_avg_len"),
        g_dom.alias("pass_dominance"),
        g_ttr.alias("pass_ttr"),
        (g_count & g_len & g_dom & g_ttr).alias("keep"),
    )


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style repetition metric: the fraction of word-trigram
    occurrences that are repeats of an earlier trigram in the same doc
    (1 − distinct/total). High values mark boilerplate/spam for the
    curation pass. Reuses the shingle machinery; one compact shuffle."""
    d = t(spark, sf_dir, "documents")
    rows = shingle_rows(d, ["doc_id"], distinct=False)
    per = rows.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.countDistinct("shingle").alias("n_distinct_shingles"),
    )
    rep = 1.0 - (
        F.col("n_distinct_shingles").cast("double")
        / F.col("n_shingles").cast("double")
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_distinct_shingles",
        rep.alias("repetition_ratio"),
        (rep > 0.2).alias("is_repetitive"),
    )


PACK_CONTEXT = 512  # tokens per training-sequence bin
SPLIT_TRAIN_LT = 96  # md5 bucket < 96 → train; 96-97 val; 98-99 test


def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the batch-shaping step between a curated
    corpus and a trainer: documents are laid end-to-end into
    ``PACK_CONTEXT``-token bins and the query reports each bin's doc
    count, token total, and fill ratio (the padding-waste metric that
    motivates packing in the first place). Contiguous greedy packing in
    doc_id order: a doc belongs to the bin where its start offset
    lands, so a bin can overflow by at most one doc's tail — the
    standard simple packer, fully deterministic.

    Scale shape: the running offset is a window cumsum partitioned by
    ``source`` — training shards are built per-source anyway (data
    recipes weight sources independently), so the window key is the
    natural shard key and no global ordering exists anywhere in the
    plan. One window shuffle + one hash aggregation."""
    d = t(spark, sf_dir, "documents")
    base = d.select("doc_id", "source", F.size(tokens("text")).alias("n_tokens"))
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = base.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "bin_id",
        F.floor(
            (F.col("cum") - F.col("n_tokens")) / F.lit(float(PACK_CONTEXT))
        ).cast("int"),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens") / F.lit(float(PACK_CONTEXT))).alias("fill_ratio"),
    )


def doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: a salted md5 bucket in
    [0, 100) per document — 96/2/2, stable under corpus growth (a doc's
    split never depends on other rows, the property that keeps held-out
    sets held out across recrawls). Pure per-row arithmetic, no
    shuffle; the same md5→bigint derivation both engines already use
    for the LSH plane seeds."""
    d = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split|"), F.col("doc_id"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(F.col("split_bucket") < SPLIT_TRAIN_LT, F.lit("train"))
        .when(F.col("split_bucket") < SPLIT_TRAIN_LT + 2, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", "source", bucket.alias("split_bucket")).withColumn(
        "split", split
    )


SCRUB_MIN_DF = 5  # a trigram in ≥ 5 distinct docs is boilerplate


def doc_ngram_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate span removal (the C4/RefinedWeb
    repeated-n-gram scrub): any word trigram occurring in ≥
    ``SCRUB_MIN_DF`` distinct documents marks its 3-token span as
    boilerplate; covered tokens are dropped and the document re-joined
    from the survivors. Returns per-doc token counts before/after, the
    md5 of the scrubbed text, and the masked fraction.

    Plan shape (all equi-joins, no quadratic step): posexplode trigram
    starts → trigram document frequency (compact (tri, df) pairs after
    map-side partial agg) → inner join starts against the hot-trigram
    set (output bounded by |starts|) → ``collect_list(start)`` per doc
    (the shuffle carries ONE row per hot start, not the 3× exploded
    covered positions the round-3 version distinct-ed — that distinct
    was the suite's single biggest stage) → span expansion and token
    filtering entirely array-side: kept positions =
    ``array_except(sequence(0, n−1), covered)``, a hash-set difference
    that is O(n + |covered|) per doc and preserves the ascending
    position order, so the document re-joins without the old
    (doc_id, pos, tok) anti-join + collect_list re-assembly shuffles.
    At 100 TB every shuffle key is doc_id or a compact trigram string —
    linear end-to-end, same skew profile as the shingle inverted index
    (a trigram present in every doc still joins 1:1 against each start
    occurrence), and per-doc work is bounded by document length."""
    d = t(spark, sf_dir, "documents")
    base = d.select("doc_id", tokens("text").alias("toks"))
    tri_col = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("toks"), i),
            F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
        ),
    )
    starts = base.filter(F.size("toks") >= 3).select(
        "doc_id", F.posexplode(tri_col).alias("start", "tri")
    )
    hot = (
        starts.groupBy("tri")
        .agg(F.countDistinct("doc_id").alias("df_t"))
        .filter(F.col("df_t") >= SCRUB_MIN_DF)
    )
    covered = (
        starts.join(hot, "tri")
        .groupBy("doc_id")
        .agg(F.collect_list("start").alias("hot_starts"))
        .select(
            "doc_id",
            F.array_distinct(
                F.flatten(
                    F.transform("hot_starts", lambda s: F.sequence(s, s + 2))
                )
            ).alias("covered"),
        )
    )
    empty_int = F.array().cast("array<int>")
    kept_pos = F.when(
        F.size("toks") > 0,
        F.array_except(
            F.sequence(F.lit(0), F.size("toks") - 1),
            F.coalesce(F.col("covered"), empty_int),
        ),
    ).otherwise(empty_int)
    joined = base.join(covered, "doc_id", "left").select(
        "doc_id", "toks", kept_pos.alias("kept_pos")
    )
    n_tokens = F.size("toks").cast("bigint")
    n_kept = F.size("kept_pos").cast("bigint")
    scrubbed = F.array_join(
        F.transform("kept_pos", lambda i: F.element_at(F.col("toks"), i + 1)),
        " ",
    )
    return joined.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_kept.alias("n_kept"),
        (n_tokens - n_kept).alias("n_masked"),
        F.md5(scrubbed).alias("scrubbed_fp"),
        ((n_tokens - n_kept).cast("double") / n_tokens.cast("double")).alias(
            "mask_ratio"
        ),
    )


def doc_token_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token novelty vs the corpus: mean document-frequency of
    the doc's distinct tokens plus how many are corpus-common (df over
    half the corpus) — the cheap membership-based boilerplate signal
    next to doc_ngram_scrub's positional one. Integer sums only, so the
    mean is exact at any parallelism; shuffles carry compact
    (doc_id, token) / (token, df) pairs and the corpus doc count is a
    1-row broadcast."""
    d = t(spark, sf_dir, "documents")
    pairs = d.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("token")
    )
    dfs = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("_n_docs"))
    return (
        pairs.join(dfs, "token")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            (F.sum("df").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "mean_token_df"
            ),
            F.sum(F.when(F.col("df") * 2 > F.col("_n_docs"), 1).otherwise(0))
            .cast("int")
            .alias("n_common_tokens"),
        )
    )


CMS_D = 4  # count-min sketch depth (independent hash rows)
CMS_W = 256  # count-min sketch width (cells per row)
CMS_TOPK = 20


def token_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters: build a D×W CMS over token
    counts, then report the exact top-``CMS_TOPK`` tokens with their
    sketch estimate and overcount — the sketch-vs-truth audit you run
    before trusting CMS at a cardinality where exact counting stops
    being feasible.

    The sketch is built from the aggregated (token, tf) relation, not
    the raw token stream — CMS is linear, so adding tf once per token
    equals adding 1 per occurrence, and the build shuffle carries
    |vocab|·D compact rows instead of |corpus|·D. The sketch itself is
    ≤ D·W cells regardless of data size; estimation is an equi-join of
    the (small) candidate set against those cells on (row, cell). Hash
    = the portable md5→bigint derivation used across the engine, so the
    oracle reproduces every cell exactly."""
    d = t(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    r_col = F.explode(F.array(*[F.lit(r) for r in range(CMS_D)])).alias("r")

    def cell(token: Column, r: Column) -> Column:
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cms"), r, F.lit("|"), token)), 1, 15
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(CMS_W),
        )

    sketch = (
        tf.select("token", "tf", r_col)
        .select("r", cell(F.col("token"), F.col("r")).alias("cell"), "tf")
        .groupBy("r", "cell")
        .agg(F.sum("tf").alias("cnt"))
    )
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition
    # top-k then a k-row merge on one task, never a global sort (the
    # window row_number form would single-partition the whole vocab).
    top = tf.orderBy(F.desc("tf"), F.asc("token")).limit(CMS_TOPK)
    probes = top.select("token", "tf", r_col).select(
        "token", "tf", "r", cell(F.col("token"), F.col("r")).alias("cell")
    )
    return (
        probes.join(sketch, ["r", "cell"])
        .groupBy("token", "tf")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "token",
            "tf",
            "cms_est",
            (F.col("cms_est") - F.col("tf")).alias("overcount"),
        )
    )


CHUNK_SIZE = 64  # tokens per chunk
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking — the window step between a curated corpus and
    a context-bounded consumer (pretraining sequences, RAG passages):
    overlapping ``CHUNK_SIZE``-token windows every ``CHUNK_STRIDE``
    tokens (``ceil(n/stride)`` chunks per doc; the tail chunk is
    short). Emits one row per chunk with its token span and content
    fingerprint. Pure per-row explode — no shuffle anywhere, chunk
    count scales with the doc, never the corpus."""
    d = t(spark, sf_dir, "documents")
    base = d.select("doc_id", tokens("text").alias("toks")).withColumn(
        "n", F.size("toks")
    )
    n_chunks = F.ceil(F.col("n") / F.lit(CHUNK_STRIDE)).cast("int")
    chunks = base.select(
        "doc_id",
        "n",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).withColumn("start_tok", F.col("chunk_idx") * CHUNK_STRIDE)
    chunk_toks = F.slice(F.col("toks"), F.col("start_tok") + 1, CHUNK_SIZE)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        F.least(F.lit(CHUNK_SIZE), F.col("n") - F.col("start_tok"))
        .cast("int")
        .alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk_toks, " ")).alias("chunk_fp"),
    )


WINNOW_W = 4  # winnowing window (anchors pick 1 fingerprint per window)
WINNOW_M = 1 << 31
_POS_BITS = 21  # pos < 2^21; key = h·2^21 + (2^21−1−pos) < 2^52 exact


def doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (the MOSS local document-fingerprint
    algorithm): hash every word trigram, then from each window of
    ``WINNOW_W`` consecutive trigram hashes keep the minimal hash,
    rightmost on ties; the distinct kept (hash, pos) pairs are the
    doc's fingerprint set. Winnowing guarantees ≥1 shared fingerprint
    for any shared run of WINNOW_W+2 tokens — the position-robust
    overlap detector next to whole-doc fingerprints.

    The rightmost-min-per-window selection is ONE window aggregation:
    encode (h, pos) as ``h·2^21 + (2^21−1−pos)`` (exact in int64 —
    h < 2^31, pos < 2^21), take ``min`` over the trailing-W frame, and
    decode — lexicographic (min h, max pos) without min_by/struct
    ordering, identical in any engine. Shuffle = one window partition
    by doc_id + the distinct; both carry compact rows."""
    d = t(spark, sf_dir, "documents")
    base = d.select("doc_id", tokens("text").alias("toks"))
    tri_col = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("toks"), i),
            F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
        ),
    )
    tris = base.filter(F.size("toks") >= 3).select(
        "doc_id", F.posexplode(tri_col).alias("pos", "tri")
    )
    h = (
        F.conv(F.substring(F.md5(F.col("tri")), 1, 15), 16, 10).cast("bigint")
        % WINNOW_M
    )
    pos_cap = (1 << _POS_BITS) - 1
    keyed = tris.select(
        "doc_id",
        "pos",
        (h * (1 << _POS_BITS) + (pos_cap - F.col("pos"))).alias("key"),
    )
    win = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), W.currentRow)
    )
    anchored = keyed.select(
        "doc_id",
        F.min("key").over(win).alias("sel_key"),
        F.row_number().over(W.partitionBy("doc_id").orderBy("pos")).alias("rn"),
    ).filter(F.col("rn") >= WINNOW_W)
    return (
        anchored.select("doc_id", "sel_key")
        .distinct()
        .select(
            "doc_id",
            (pos_cap - F.col("sel_key") % (1 << _POS_BITS))
            .cast("int")
            .alias("fp_pos"),
            F.shiftright("sel_key", _POS_BITS).alias("fp_hash"),
        )
    )


WINNOW_MAX_DF = 64  # stop-fingerprint cap: drop hashes in > this many docs
WINNOW_MIN_SHARED = 2  # report pairs sharing at least this many fingerprints


def doc_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document shared-span detection (the MOSS pairing step):
    join documents on shared winnowing fingerprints and report pairs
    with ≥ ``WINNOW_MIN_SHARED`` distinct shared hashes — the
    position-robust near-dup signal that catches a copied PARAGRAPH
    inside otherwise-different documents, which whole-doc MinHash and
    SimHash both dilute away.

    Scale shape: the fingerprint self-join is an equi-join on fp_hash,
    and its posting lists are explicitly bounded — fingerprints present
    in more than ``WINNOW_MAX_DF`` docs are boilerplate (license
    headers, templates) and are dropped BEFORE the join, the same
    stop-token discipline as the Jaccard prefix filter's hot-shingle
    cap. Worst-case join fan-out is therefore |fps|·MAX_DF, linear in
    the corpus, never the C(df,2) blow-up of an uncapped posting list."""
    # r14 optimization (guide §5): the winnowing-fingerprint relation
    # fed the document-frequency aggregate AND both self-join sides as
    # plain lineage — the full winnow pipeline ran per reference.
    # Persist it for the invocation, release on return; the self-join's
    # merge hint lets both sides share one sorted exchange.
    fps = (
        doc_winnow(spark, sf_dir).select("doc_id", "fp_hash").distinct()
    ).persist()
    dfreq = fps.groupBy("fp_hash").agg(F.count(F.lit(1)).alias("df"))
    kept = fps.join(
        dfreq.filter(F.col("df") <= WINNOW_MAX_DF).select("fp_hash"), "fp_hash"
    )
    a, b = kept.alias("a"), kept.alias("b").hint("merge")
    return materialize_and_release(
        a.join(
            b,
            (F.col("a.fp_hash") == F.col("b.fp_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= WINNOW_MIN_SHARED),
        fps,
    )


def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score (the CCNet/Gopher-style LM filter): fit
    an add-one-smoothed unigram model on the corpus itself, then score
    every document by cross-entropy H = -(1/n)·Σ log2 p(tok) and
    perplexity 2^H — high-perplexity docs are the unusual-token-mix
    outliers a curation pipeline reviews or drops.

    Scale shape: the model IS the (token, tf) relation (|vocab| rows),
    so "fit" is one map-side-combined agg and "score" is a broadcast
    join of that tiny model onto per-(doc, token) counts — no per-doc
    state, no driver round-trip, linear in corpus size at any sf.

    Float determinism (PERF 8/13 policy): the only transcendentals are
    log2 over shared integers — snapped to a 9 dp grid like tf-idf's
    ln — and the final 2^H, rounded to 6 dp. The per-doc reduction
    Σ cnt·log2(tf+1) runs as an exact DECIMAL(18,6) sum, so H is
    bit-identical under any partitioning and across engines.

    Materialized once per (session, corpus snapshot): the CCNet
    tercile query consumes these scores, so a sweep would otherwise run
    the scoring pipeline twice (the incremental-table posture of
    ``cache.session_materialized``)."""
    key = f"doc_lm_perplexity:{source_fingerprint(sf_dir, 'documents')}"
    return session_materialized(spark, key, lambda: _lm_perplexity_plan(spark, sf_dir))


def _lm_perplexity_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_tok = _lm_token_counts(spark, sf_dir).select(
        "doc_id", F.col("tok").alias("token"), F.col("x").alias("cnt")
    )
    # model counts derive from the shared per-(doc, token) count table
    # (``_lm_token_counts``, one corpus explode for the whole LM
    # family), not the raw token stream — the tf aggregation's input is
    # |distinct (doc, token)| rows, not |corpus tokens| (the PERF-18
    # build-from-the-aggregate discipline).
    tf = doc_tok.groupBy("token").agg(F.sum("cnt").alias("tf"))
    tot = tf.agg(
        F.sum("tf").alias("n_total"), F.count(F.lit(1)).alias("vocab")
    )
    bits = (
        F.col("cnt").cast("double")
        * F.round(F.log2(F.col("tf").cast("double") + 1.0), 9)
    ).cast(DEC)
    per_doc = (
        doc_tok.join(F.broadcast(tf), "token")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_tokens"), F.sum(bits).alias("_sb"))
    )
    ce = F.round(
        F.log2((F.col("n_total") + F.col("vocab")).cast("double")), 9
    ) - F.col("_sb").cast("double") / F.col("n_tokens").cast("double")
    # ce is NOT re-rounded: it is a grid-snapped log2 minus one exactly
    # rounded IEEE division, already bit-identical cross-engine, and a
    # final round(·, 9) would REINTRODUCE divergence at half-boundary
    # values (Spark rounds the exact binary value via BigDecimal;
    # DuckDB rounds via a 1e9 scaled multiply — observed differing on
    # one sf0.1 doc). The only remaining transcendental, 2^ce, is
    # snapped to 6 dp.
    return (
        per_doc.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_tokens",
            ce.alias("cross_entropy_bits"),
            F.round(F.pow(F.lit(2.0), ce), 6).alias("perplexity"),
        )
    )


def _lm_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared unigram count table: per-(doc_id, source, tok) occurrence
    counts ``x``, session-materialized once per corpus snapshot.

    This is THE relation every unigram-LM query needs — the corpus
    token explode + (doc, token) aggregation is the dominant cost of
    ``doc_lm_perplexity``, ``doc_domain_surprisal``, and the add-one
    vocabulary lookup of ``doc_bigram_perplexity`` — and before round 9
    each of them re-ran it (VERDICT r8 #2). At 100 TB this is the
    incremental per-snapshot token-count table written once per corpus
    build; ``cache.session_materialized`` is the local stand-in, and
    the build cost is reported via ``producer_build_seconds``.

    ``source`` rides along (functionally dependent on doc_id) so the
    per-source model of ``doc_domain_surprisal`` derives without a join
    back to the documents table."""
    key = f"lm_token_doc_counts:{source_fingerprint(sf_dir, 'documents')}"

    def build() -> DataFrame:
        d = t(spark, sf_dir, "documents")
        return (
            d.select("doc_id", "source", F.explode(tokens("text")).alias("tok"))
            .groupBy("doc_id", "source", "tok")
            .agg(F.count(F.lit(1)).alias("x"))
        )

    return session_materialized(spark, key, build)


def _lm_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared bigram count table: per-(doc_id, w1, w2) occurrence counts
    ``x``, session-materialized once per corpus snapshot.

    Both bigram-LM scorers (``doc_bigram_perplexity`` add-one and
    ``doc_kneser_ney_perplexity``) consume exactly this relation, as do
    ``bigram_frequency``/``vocab_coverage_curve`` (re-aggregations) and
    ``doc_dsir_importance`` (hashed-bucket projection); the corpus
    explode into adjacent pairs + the (doc, pair) aggregation was their
    dominant cost and used to run once per query (VERDICT r8 #2 —
    three of the six slowest sf1 entries). ``lang`` rides along
    (functionally dependent on doc_id, group cardinality unchanged) so
    DSIR's per-language bucket stats derive without a join back. Same
    100 TB posture as ``_lm_token_counts``."""
    key = f"lm_bigram_doc_counts:{source_fingerprint(sf_dir, 'documents')}"

    def build() -> DataFrame:
        d = t(spark, sf_dir, "documents")
        toks = tokens("text")
        pairs = F.when(
            F.size(toks) < 2,
            F.array().cast("array<struct<w1:string,w2:string>>"),
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            )
        )
        return (
            d.select("doc_id", "lang", F.explode(pairs).alias("p"))
            .select(
                "doc_id",
                "lang",
                F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"),
            )
            .groupBy("doc_id", "lang", "w1", "w2")
            .agg(F.count(F.lit(1)).alias("x"))
        )

    return session_materialized(spark, key, build)


def _lm_bigram_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared bigram model table (w1, w2, cb, cp, n1p, n1c): pair count,
    prefix total, distinct-successor count N1+(w1·), and
    distinct-predecessor count N1+(·w2) — the superset of what the
    add-one and Kneser-Ney scorers each need, joined once and
    session-materialized. Derives from ``_lm_bigram_counts`` (the
    PERF-18 build-from-the-aggregate discipline: model counts aggregate
    |distinct (doc, pair)| rows, not the raw pair stream)."""
    key = f"lm_bigram_model:{source_fingerprint(sf_dir, 'documents')}"

    def build() -> DataFrame:
        x = _lm_bigram_counts(spark, sf_dir)
        cb = x.groupBy("w1", "w2").agg(F.sum("x").alias("cb"))
        cp = cb.groupBy("w1").agg(
            F.sum("cb").alias("cp"), F.count(F.lit(1)).alias("n1p")
        )
        n1c = cb.groupBy("w2").agg(F.count(F.lit(1)).alias("n1c"))
        return cb.join(cp, "w1").join(n1c, "w2")

    return session_materialized(spark, key, build)


def doc_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity per document — the order-2 step from
    ``doc_lm_perplexity`` toward the 5-gram KenLM filter CCNet actually
    ships: p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V) with add-one
    smoothing over the unigram vocabulary V, scored as cross-entropy
    H = −(1/n)·Σ log2 p and perplexity 2^H.

    Scale shape: per-(doc, pair) counts and the (pair count, prefix
    total) model both come from the session-materialized shared count
    tables (``_lm_bigram_counts`` / ``_lm_bigram_model`` — one corpus
    explode for the whole LM family); the scoring join is keyed
    equi-join/agg, the only broadcast is the 1-row vocabulary size
    (distinct tokens of the shared unigram table). Unlike the unigram
    model the denominator log2(c(w1·)+V) varies per prefix, so it
    can't be factored out of the sum — each joined row carries its own
    Δlog2 term into the fixed-point BIGINT reduction (the
    dsir/char-entropy pattern; bit-identical cross-engine)."""
    d = t(spark, sf_dir, "documents")
    x = _lm_bigram_counts(spark, sf_dir)
    model = _lm_bigram_model(spark, sf_dir).select("w1", "w2", "cb", "cp")
    vocab = _lm_token_counts(spark, sf_dir).agg(
        F.countDistinct("tok").alias("v")
    )  # 1-row vocabulary size (allowlisted broadcast)
    diff = F.round(F.log2((F.col("cb") + 1).cast("double")), 9) - F.round(
        F.log2((F.col("cp") + F.col("v")).cast("double")), 9
    )
    contrib = F.floor(
        F.col("x").cast("double") * diff * F.lit(1000000000.0) + F.lit(0.5)
    ).cast("bigint")
    per = (
        x.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.sum("x").alias("n_bigrams"), F.sum(contrib).alias("_sb"))
    )
    ce = (-F.col("_sb")).cast("double") / F.lit(1000000000.0) / F.col(
        "n_bigrams"
    ).cast("double")
    scored = per.select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        ce.alias("cross_entropy_bits"),
        F.round(F.pow(F.lit(2.0), ce), 6).alias("perplexity"),
    )
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("cross_entropy_bits", F.lit(0.0)).alias(
                "cross_entropy_bits"
            ),
            F.coalesce("perplexity", F.lit(1.0)).alias("perplexity"),
        )
    )


SPARSE_DF_DEN = 5  # fractional cap: terms in > N/5 docs leave the index
# Absolute posting-list ceiling. The old 10_000 was never a real bound:
# on the round-10 Zipf corpus at sf1, dozens of mid-rank terms sit just
# under it and the posting self-join fans out to Σ df² ≈ billions of
# rows (measured: >75 GB shuffle spill, disk exhaustion). 256 is the
# production impact-index posture — Σ df² ≤ 256·Σ df keeps candidate
# volume a small multiple of the term-instance count at ANY corpus
# size, and the Zipf tail below df=256 is where sparse retrieval's
# discriminative terms live anyway (higher-df terms carry ~no idf).
SPARSE_DF_ABS = 256
SPARSE_TOPK = 5


def doc_sparse_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine nearest neighbors via a DF-capped inverted
    index — the lexical twin of the dense ANN family: document
    vectors live in the subspace of terms with df·SPARSE_DF_DEN ≤ N
    (integer-exact fractional stop-term cut — an absolute cap goes
    vacuous as N grows since every content word eventually exceeds it)
    AND df ≤ ``SPARSE_DF_ABS`` (the posting-list ceiling that binds at
    100 TB where N/5 alone would admit quadratic hot terms), pairs
    materialize only through shared index terms, and each doc keeps its
    ``SPARSE_TOPK`` highest-cosine neighbors.

    Scale shape: one term-keyed equi-join of the capped posting lists
    (max fan-out df² ≤ SPARSE_DF_ABS² per term — bounded by
    construction, the audit-clean alternative to all-pairs), dot
    products and squared
    norms as fixed-point BIGINT reductions (order-independent,
    bit-identical cross-engine), and the top-k window PARTITIONED BY
    the query doc (per-group rows bounded by Σ df over its terms).
    Only broadcast: the 1-row corpus doc count for idf.

    Corpus caveat: on the DRIVER corpus (uniform 31-word vocabulary)
    every unigram exceeds N/5 past ~10k docs and the index is
    legitimately empty — on a uniform-vocab corpus every term IS a stop
    term (the oracle agrees: verified-empty). On the round-10 Zipf
    scratch corpus the operator does real work (25k neighbor rows at
    sf0.1, 0.65 s at sf1) — and that corpus is also what exposed the
    old SPARSE_DF_ABS=10_000 ceiling as vacuous: mid-rank Zipf terms
    sat just under it and Σ df² fanned past 10⁹ rows (>75 GB spill)
    before the 256 ceiling made the bound real."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))  # 1-row idf numerator
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(nd))
        .filter(
            (F.col("df") * F.lit(SPARSE_DF_DEN) <= F.col("n_docs"))
            & (F.col("df") <= SPARSE_DF_ABS)
        )
    )
    # three consumers (norms + both posting sides) whose subtrees are
    # NOT reuse-identical (the index side filters df >= 2) — persist the
    # weight relation once, release after the result materializes
    w = (
        tf.join(dfreq, "term")
        .select(
            "doc_id",
            "term",
            "df",
            (
                F.col("tf").cast("double")
                * F.round(
                    F.log(
                        F.col("n_docs").cast("double")
                        / F.col("df").cast("double")
                    ),
                    9,
                )
            ).alias("w"),
        )
        .persist()
    )

    def _fp(c: Column) -> Column:
        return F.floor(c * F.lit(1e9) + F.lit(0.5)).cast("bigint")

    norms = w.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(_fp(F.col("w") * F.col("w"))).cast("double") / F.lit(1e9)
        ).alias("norm")
    )
    # df = 1 terms live in the norms (they're in the subspace) but can
    # never produce a cross-doc pair — pruning them from the join side
    # is result-identical and halves singleton postings
    idx = w.filter(F.col("df") >= 2).select("doc_id", "term", "w")
    a, b = idx.alias("a"), idx.alias("b").hint("merge")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("neighbor_id"),
        )
        .agg(F.sum(_fp(F.col("a.w") * F.col("b.w"))).alias("dot_fp"))
    )
    na = norms.select(F.col("doc_id"), F.col("norm").alias("norm_a"))
    nb = norms.select(
        F.col("doc_id").alias("neighbor_id"), F.col("norm").alias("norm_b")
    )
    cos = (F.col("dot_fp").cast("double") / F.lit(1e9)) / (
        F.col("norm_a") * F.col("norm_b")
    )
    scored = (
        dots.join(na, "doc_id")
        .join(nb, "neighbor_id")
        .select("doc_id", "neighbor_id", cos.alias("cosine"))
    )
    wk = W.partitionBy("doc_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return materialize_and_release(
        scored.withColumn("rank", F.row_number().over(wk).cast("int"))
        .filter(F.col("rank") <= SPARSE_TOPK)
        .select("doc_id", "neighbor_id", "cosine", "rank"),
        w,
    )


KN_DISCOUNT = 0.75  # 3/4: exact in binary, so per-row p is bit-portable


def doc_kneser_ney_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995;
    Chen & Goodman 1998) — the smoothing KenLM defaults to, next to
    ``doc_bigram_perplexity``'s add-one strawman:

        p(w2|w1) = (c(w1 w2) − D)/c(w1·) + λ(w1)·p_cont(w2)
        λ(w1)    = D·N1+(w1·)/c(w1·)
        p_cont   = N1+(·w2)/N1+(··)

    with D = 0.75. Continuation counts reward words seen after MANY
    distinct prefixes, which is what separates genuine vocabulary from
    boilerplate collocations — the reason KN-filtered corpora beat
    add-one-filtered ones. Self-scored on the corpus, so every doc
    bigram has c ≥ 1 and the interpolation only ADDS mass (p > 0).

    Scale shape: the model is four relations off ONE shared bigram
    count table (``_lm_bigram_counts`` / ``_lm_bigram_model``, built
    once per corpus snapshot for the whole LM family) — pair counts,
    prefix totals, distinct-successor counts N1+(w1·),
    distinct-predecessor counts N1+(·w2) — all keyed aggregations; the
    only broadcast is the 1-row distinct-pair total. D = 3/4 is exact
    binary, the per-row p is pure IEEE arithmetic over shared integers
    (bit-identical cross-engine), and log2 lands on the 9 dp grid into
    the fixed-point BIGINT reduction (the house pattern)."""
    d = t(spark, sf_dir, "documents")
    x = _lm_bigram_counts(spark, sf_dir)
    model = _lm_bigram_model(spark, sf_dir)
    npp = model.agg(F.count(F.lit(1)).alias("npp"))  # 1-row distinct pairs
    D = F.lit(KN_DISCOUNT)
    p = (
        (F.col("cb").cast("double") - D) / F.col("cp").cast("double")
        + D
        * F.col("n1p").cast("double")
        / F.col("cp").cast("double")
        * F.col("n1c").cast("double")
        / F.col("npp").cast("double")
    )
    contrib = F.floor(
        F.col("x").cast("double")
        * F.round(F.log2(p), 9)
        * F.lit(1000000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    per = (
        x.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(npp))
        .groupBy("doc_id")
        .agg(F.sum("x").alias("n_bigrams"), F.sum(contrib).alias("_sb"))
    )
    ce = (-F.col("_sb")).cast("double") / F.lit(1000000000.0) / F.col(
        "n_bigrams"
    ).cast("double")
    scored = per.select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        ce.alias("cross_entropy_bits"),
        F.round(F.pow(F.lit(2.0), ce), 6).alias("perplexity"),
    )
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("cross_entropy_bits", F.lit(0.0)).alias(
                "cross_entropy_bits"
            ),
            F.coalesce("perplexity", F.lit(1.0)).alias("perplexity"),
        )
    )


PPL_BUCKETS = 3  # CCNet head / middle / tail
PPL_RANK_PARTS = 8  # per-lang rank buckets for the distributed rank
_PPL_BUCKET_NAMES = ["head", "middle", "tail"]


def doc_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language perplexity split: within each language,
    documents are ranked by LM perplexity (``doc_lm_perplexity``) and
    cut into equal-count head / middle / tail terciles — head (lowest
    perplexity) is what CCNet keeps for training, tail is reviewed or
    dropped. Reports per (lang, bucket) the doc count and the exact
    min / mean / max perplexity.

    The interesting part is the rank: ``row_number() OVER (PARTITION BY
    lang ...)`` puts an ENTIRE language in one task — with ~5 languages
    over a 100 TB corpus that is a handful of tasks sorting terabytes
    each. Instead the per-lang rank is DISTRIBUTED: one control-plane
    pass collects per-lang counts, rows get a deterministic
    pid = lang_index·2⁴² + IEEE-binade-bucket(perplexity) (row-local
    since r15 — the percentile_approx sketch left the boundary collect;
    monotone in (lang, perplexity) order), ``operators/prefix_sum.py`` turns
    per-pid row numbers + broadcast offsets into the GLOBAL rank over
    (lang, perplexity, doc_id), and rank − lang_offset is the exact
    per-lang rank — identical integers to the oracle's keyed
    row_number, with no task ever holding more than one bucket.
    Tercile assignment floor(3·(rank−1)/n) is integer-derived (the
    double division cannot misround below 2^53 — n·m = k exactly or
    the quotient is >1/n away from the next integer).

    Mean perplexity uses the decimal-exact sum policy (`_util`):
    perplexity is already 6 dp-rounded, so DECIMAL(18,6) is lossless."""
    ppl = doc_lm_perplexity(spark, sf_dir).select("doc_id", "perplexity")
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = ppl.join(d, "doc_id").persist()
    # r15: the per-lang boundary collect keeps only the COUNTS (needed
    # for the lang offsets); the percentile_approx sketch is gone — the
    # within-lang pid is the row-local IEEE-binade bucket of perplexity
    # (operators/prefix_sum.ieee_bucket_asc), monotone in (lang, ppl)
    # under the 2^42 lang stride.
    qrows = (
        scored.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("lang")
        .collect()
    )
    lang_idx = None
    off_rows, off = [], 0
    for i, r in enumerate(qrows):
        cond = F.col("lang") == r["lang"]
        lang_idx = (
            F.when(cond, i) if lang_idx is None else lang_idx.when(cond, i)
        )
        off_rows.append((r["lang"], off, r["c"]))
        off += r["c"]
    pid = lang_idx.cast("long") * F.lit(1 << 42) + ieee_bucket_asc(
        "perplexity"
    )
    lang_off = spark.createDataFrame(
        off_rows, "lang string, lang_off long, n_lang long"
    )
    ranked, _ = distributed_prefix_sum(
        spark,
        scored.withColumn("one", F.lit(1).cast("bigint")),
        pid=pid,
        order=[F.col("lang"), F.col("perplexity"), F.col("doc_id")],
        value_col="one",
        cum_col="_cum",
        rank_col="rank",
    )
    scored.unpersist()
    rk = F.col("rank") - F.col("lang_off")
    bucket_ix = F.floor(
        F.lit(PPL_BUCKETS) * (rk - 1) / F.col("n_lang")
    ).cast("int")
    name = F.element_at(
        F.array(*[F.lit(n) for n in _PPL_BUCKET_NAMES]), bucket_ix + 1
    )
    return (
        ranked.join(F.broadcast(lang_off), "lang")
        .withColumn("bucket", name)
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("perplexity").alias("min_ppl"),
            (
                F.sum(F.col("perplexity").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_ppl"),
            F.max("perplexity").alias("max_ppl"),
        )
    )


DISTINCTIVE_TOPK = 5
DISTINCTIVE_MIN_COUNT = 5


def doc_source_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive vocabulary by log-lift: terms whose
    within-source relative frequency most exceeds their corpus-wide
    relative frequency (lift = (c_st/n_s)/(c_t/N)), top
    ``DISTINCTIVE_TOPK`` per source with a ``DISTINCTIVE_MIN_COUNT``
    support floor — the source-characterization report a data-mix
    review reads next to ``doc_source_mix``.

    Scale shape: one tokenize+explode, then keyed aggregations on
    (source, term), term, and source; the 1-row corpus total broadcasts
    via crossJoin (the ``doc_tfidf_top_terms`` pattern). The final
    rank's per-source groups hold the SUPPORT-FILTERED vocabulary of
    one source — sublinear in corpus size (Heap's law) and further cut
    by the count floor, unlike a per-source rank over *documents*
    (which is why ``doc_perplexity_buckets`` uses the distributed
    prefix sum instead)."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens("text")).alias("term"))
    st = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c_st"))
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    t_tot = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    n_total = st.agg(F.sum("c_st").alias("n_corpus"))
    lift = (F.col("c_st").cast("double") / F.col("n_s").cast("double")) / (
        F.col("c_t").cast("double") / F.col("n_corpus").cast("double")
    )
    scored = (
        st.filter(F.col("c_st") >= DISTINCTIVE_MIN_COUNT)
        .join(s_tot, "source")
        .join(t_tot, "term")
        .crossJoin(F.broadcast(n_total))
        .select("source", "term", "c_st", lift.alias("lift"))
    )
    w = W.partitionBy("source").orderBy(F.col("lift").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= DISTINCTIVE_TOPK)
    )


# --- BM25 full-text relevance search ---------------------------------
# Okapi BM25 with the Lucene-style non-negative idf
# ln(1 + (N - df + 0.5)/(df + 0.5)).  The constants are pre-folded in
# Python and injected as the SAME repr into both engines, so the only
# transcendental (ln over shared per-term integers) is snapped to the
# 9 dp grid and everything downstream is exactly-rounded IEEE on both
# sides (the doc_tfidf_top_terms discipline).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("join", "spark", "scan")
BM25_TOP = 20
_BM25_NUM = BM25_K1 + 1.0          # tf multiplier k1+1
_BM25_K1_1MB = BM25_K1 * (1.0 - BM25_B)
_BM25_K1B = BM25_K1 * BM25_B


def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance ranking of a fixed query over the corpus — the
    engine's full-text-search scoring path (distinct from TF-IDF term
    extraction: BM25 saturates tf and length-normalizes by dl/avgdl).

    Scale shape: one corpus tokenization → per-doc lengths (map-side
    combined agg) and a query-term-filtered tf table whose size is
    |docs containing a query term| — the inverted-index posting lists
    for the query, NOT the corpus. df and the (avgdl, N) frame are
    tiny broadcasts; the per-doc score sum is fixed-point BIGINT
    (order-independent); the final top-k is orderBy().limit(k) (global
    TakeOrderedAndProject — no corpus-wide window)."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("_sum_dl"), F.count(F.lit(1)).alias("n_docs")
    ).select(
        (F.col("_sum_dl").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
        "n_docs",
    )
    tf = (
        tok.filter(F.col("term").isin(list(BM25_TERMS)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        F.log(
            (
                F.col("n_docs").cast("double")
                - F.col("df").cast("double")
                + F.lit(0.5)
            )
            / (F.col("df").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        ),
        9,
    )
    term_score = idf * (
        (F.col("tf").cast("double") * F.lit(_BM25_NUM))
        / (
            F.col("tf").cast("double")
            + (
                F.lit(_BM25_K1_1MB)
                + (F.lit(_BM25_K1B) * F.col("dl").cast("double"))
                / F.col("avgdl")
            )
        )
    )
    scored = (
        tf.join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(term_score * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
            .alias("_s_fp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
        (F.sum("_s_fp").cast("double") / F.lit(1e9)).alias("bm25_score"),
    )
    top = per_doc.orderBy(F.col("bm25_score").desc(), "doc_id").limit(BM25_TOP)
    return rank_limited(
        top,
        [-F.col("bm25_score"), F.col("doc_id")],
        ["doc_id", "n_terms_matched", "bm25_score"],
    )


# --- Hybrid retrieval: reciprocal-rank fusion -------------------------
# Standard RRF (Cormack et al. 2009): score(d) = Σ_r 1/(K + rank_r(d))
# over the rankers that placed d in their top-``RRF_POOL``.  K = 60 is
# the canonical constant.  Determinism: both component scores use the
# fixed-point BIGINT sum discipline, ranks are integers, and the fused
# score is ONE addition of two correctly-rounded IEEE divisions — no
# order-dependent float accumulation anywhere.
RRF_K = 60
RRF_POOL = BM25_TOP  # per-ranker candidate pool
RRF_TOP = 10


def doc_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval for the fixed ``BM25_TERMS`` query: fuse the
    BM25 ranking with a classic TF-IDF ranking by reciprocal-rank
    fusion — the engine's two lexical rankers disagree on length
    normalization and tf saturation, and RRF is the standard way to
    combine rankers without calibrating their score scales.  A rank of
    0 in the output means "outside that ranker's top-RRF_POOL" (kept
    0, not NULL, so the rank columns stay non-nullable integers).

    Scale shape: the corpus is tokenized ONCE; both scores come off the
    same query-term posting lists (size = docs matching a query term,
    not the corpus) with fixed-point per-doc sums; each ranker's pool
    is orderBy().limit() (global TakeOrderedAndProject); fusion is a
    full-outer join of two ≤RRF_POOL-row frames."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("_sum_dl"), F.count(F.lit(1)).alias("n_docs")
    ).select(
        (F.col("_sum_dl").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
        "n_docs",
    )
    tf = (
        tok.filter(F.col("term").isin(list(BM25_TERMS)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    bm25_idf = F.round(
        F.log(
            (
                F.col("n_docs").cast("double")
                - F.col("df").cast("double")
                + F.lit(0.5)
            )
            / (F.col("df").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        ),
        9,
    )
    bm25_term = bm25_idf * (
        (F.col("tf").cast("double") * F.lit(_BM25_NUM))
        / (
            F.col("tf").cast("double")
            + (
                F.lit(_BM25_K1_1MB)
                + (F.lit(_BM25_K1B) * F.col("dl").cast("double"))
                / F.col("avgdl")
            )
        )
    )
    tfidf_term = F.col("tf").cast("double") * F.round(
        F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")), 9
    )

    def _fp(c: Column) -> Column:
        return F.floor(c * F.lit(1e9) + F.lit(0.5)).cast("bigint")

    scored = (
        tf.join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", _fp(bm25_term).alias("_bm_fp"), _fp(tfidf_term).alias("_ti_fp"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        (F.sum("_bm_fp").cast("double") / F.lit(1e9)).alias("bm25_score"),
        (F.sum("_ti_fp").cast("double") / F.lit(1e9)).alias("tfidf_score"),
    )

    def _pool(score: str, rank_col: str) -> DataFrame:
        top = per_doc.orderBy(F.col(score).desc(), "doc_id").limit(RRF_POOL)
        return rank_limited(
            top, [-F.col(score), F.col("doc_id")], ["doc_id"],
            rank_col=rank_col,
        )

    fused = _pool("bm25_score", "bm25_rank").join(
        _pool("tfidf_score", "tfidf_rank"), "doc_id", "full_outer"
    )

    def contrib(r: str) -> Column:
        # NULL rank (outside that ranker's pool) contributes 0
        return F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col(r)).cast("double"), F.lit(0.0)
        )
    rrf = fused.select(
        "doc_id",
        F.coalesce(F.col("bm25_rank"), F.lit(0)).alias("bm25_rank"),
        F.coalesce(F.col("tfidf_rank"), F.lit(0)).alias("tfidf_rank"),
        (contrib("bm25_rank") + contrib("tfidf_rank")).alias("rrf_score"),
    )
    top = rrf.orderBy(F.col("rrf_score").desc(), "doc_id").limit(RRF_TOP)
    return rank_limited(
        top,
        [-F.col("rrf_score"), F.col("doc_id")],
        ["doc_id", "bm25_rank", "tfidf_rank", "rrf_score"],
    )


# --- Winsorized length statistics ------------------------------------
WINSOR_LO = 0.05
WINSOR_HI = 0.95


def doc_length_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust length statistics: exact interpolated p05/p95
    of ``n_chars`` and the winsorized mean (values clamped to the
    percentile band before averaging) — the outlier-robust profiling a
    curation pipeline runs before setting length cutoffs.

    Both engines disagree on native percentile interpolation rounding,
    so the order statistics are computed EXPLICITLY: per-source
    row_number over (n_chars, doc_id), pick ranks floor/ceil of
    p·(n−1), interpolate with the same python-folded arithmetic on
    both sides.  The clamp-and-average pass re-joins the ≤|sources|-row
    bounds frame by broadcast; the mean is fixed-point BIGINT.  Scale:
    per-source windows (keyed, not global), two compact aggs, one
    broadcast join — no corpus-wide window, no driver data collect."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    nn = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))

    def _marks(p: float, tag: str):
        k = F.lit(p) * (F.col("n_docs") - 1).cast("double")
        return [
            F.floor(k).alias(f"lo{tag}"),
            F.ceil(k).alias(f"hi{tag}"),
            (k - F.floor(k).cast("double")).alias(f"frac{tag}"),
        ]

    bounds_src = nn.select(
        "source", "n_docs", *_marks(WINSOR_LO, "5"), *_marks(WINSOR_HI, "95")
    )
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.withColumn("rk", F.row_number().over(w) - 1).join(
        F.broadcast(bounds_src), "source"
    )

    def _pick(mark: str) -> Column:
        return F.max(
            F.when(F.col("rk") == F.col(mark), F.col("n_chars"))
        ).cast("double")

    agg = ranked.groupBy("source").agg(
        F.min("n_docs").alias("n_docs"),
        F.min("frac5").alias("_f5"),
        F.min("frac95").alias("_f95"),
        _pick("lo5").alias("_v5l"),
        _pick("hi5").alias("_v5h"),
        _pick("lo95").alias("_v95l"),
        _pick("hi95").alias("_v95h"),
    )
    p05 = F.col("_v5l") + (F.col("_v5h") - F.col("_v5l")) * F.col("_f5")
    p95 = F.col("_v95l") + (F.col("_v95h") - F.col("_v95l")) * F.col("_f95")
    bounds = agg.select(
        "source", "n_docs", p05.alias("p05_chars"), p95.alias("p95_chars")
    )
    clamped = d.join(F.broadcast(bounds), "source").select(
        "source",
        "n_docs",
        "p05_chars",
        "p95_chars",
        F.greatest(
            F.col("p05_chars"),
            F.least(F.col("p95_chars"), F.col("n_chars").cast("double")),
        ).alias("_cl"),
        (F.col("n_chars").cast("double") < F.col("p05_chars")).alias("_lo"),
        (F.col("n_chars").cast("double") > F.col("p95_chars")).alias("_hi"),
    )
    return clamped.groupBy("source").agg(
        F.min("n_docs").alias("n_docs"),
        F.min("p05_chars").alias("p05_chars"),
        F.min("p95_chars").alias("p95_chars"),
        (
            (
                F.sum(
                    F.floor(F.col("_cl") * F.lit(1e6) + F.lit(0.5)).cast(
                        "bigint"
                    )
                ).cast("double")
                / F.lit(1e6)
            )
            / F.min("n_docs").cast("double")
        ).alias("winsorized_mean_chars"),
        F.sum(F.col("_lo").cast("bigint")).alias("n_clamped_low"),
        F.sum(F.col("_hi").cast("bigint")).alias("n_clamped_high"),
    )


PAD_BUCKET = 16  # length-bucketed batching granularity (tokens)
PAD_MAX_LEN = 80  # truncation cap (corpus docs are 10-100 tokens; both
# constants are sf-scaled stand-ins for the production 128/8192 pair so
# the report exercises multiple buckets AND a non-empty truncation tail)
ZIPF_TOP_V = 1000  # vocabulary prefix the Zipf regression fits


def doc_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for length-bucketed batching — the number a
    training-efficiency review reads before picking bucket boundaries:
    documents are truncated at ``PAD_MAX_LEN`` tokens and grouped into
    ``PAD_BUCKET``-token length buckets (each doc pads up to its bucket
    ceiling, the standard bucketed-batching contract); per bucket the
    real vs padded token volume, the waste ratio, and the tokens lost
    to truncation.

    All-integer until the final ratio: the bucket ceiling is pure
    integer arithmetic (m − m % B with m = len + B − 1 — identical
    semantics in both engines for non-negative ints, no float ceil),
    sums are BIGINT, and the one division is per-row IEEE over exact
    integers. One map-side-combined aggregation to ≤ MAX/B rows.

    Zero-token docs (ADVICE r9): ``eff = least(n, MAX)`` is the true
    kept-token count, so ``trunc = n − eff`` can never go negative and
    no phantom real token is counted; only the bucket assignment clamps
    to ≥ 1 so degenerate docs land in the first bucket rather than a
    bucket 0. (Under the house whitespace tokenizer an empty string
    splits to [''] — n ≥ 1 in both engines — but the formula no longer
    depends on that quirk.)"""
    d = t(spark, sf_dir, "documents")
    n = F.size(tokens("text")).cast("bigint")
    eff = F.least(n, F.lit(PAD_MAX_LEN))
    m = F.greatest(eff, F.lit(1)) + F.lit(PAD_BUCKET - 1)
    bucket = (m - m % F.lit(PAD_BUCKET)).alias("bucket_len")
    per = (
        d.select(
            bucket,
            eff.alias("eff"),
            (n - eff).alias("trunc"),
        )
        .groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("eff").alias("real_tokens"),
            F.sum("trunc").alias("truncated_tokens"),
        )
    )
    padded = F.col("n_docs") * F.col("bucket_len")
    return per.select(
        "bucket_len",
        "n_docs",
        "real_tokens",
        padded.alias("padded_tokens"),
        (
            (padded - F.col("real_tokens")).cast("double")
            / padded.cast("double")
        ).alias("pad_waste_ratio"),
        "truncated_tokens",
    )


def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the frequency-ranked vocabulary — the corpus
    health number (natural text: exponent ≈ −1; synthetic/templated
    text flattens it) plus the fit quality: least-squares slope,
    intercept and R² of log2(freq) against log2(rank) over the top
    ``ZIPF_TOP_V`` terms.

    Determinism: ranks come from an explicit orderBy().limit() top-k
    (TakeOrderedAndProject — never a global-sort window) with ties
    broken by token; log2 of the shared integers (rank, freq) snaps to
    the 9 dp grid and scales to BIGINT nano-units, so Σx, Σy, Σxy, Σx²,
    Σy² are EXACT (DECIMAL(38,0) products in Spark, HUGEINT in the
    oracle — the nano-scale cancels in the slope/R² ratios); the
    normal-equation numerators/denominators are computed exactly and
    converted to double once (the agg_stats wide-decimal policy, with
    the VARCHAR round-trip on the DuckDB side)."""
    d = t(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    topv = tf.orderBy(F.col("freq").desc(), "tok").limit(ZIPF_TOP_V)
    ranked = rank_limited(
        topv, [(-F.col("freq")).alias("_nf"), F.col("tok")], ["tok", "freq"]
    )
    g9 = lambda c: F.floor(  # noqa: E731 — 9 dp grid → nano-int
        F.round(F.log2(c.cast("double")), 9) * F.lit(1e9) + F.lit(0.5)
    ).cast("bigint")
    dec38 = "decimal(38,0)"
    pts = ranked.select(
        g9(F.col("rank")).alias("x9"), g9(F.col("freq")).alias("y9")
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x9").alias("sx"),
        F.sum("y9").alias("sy"),
        F.sum(F.col("x9").cast(dec38) * F.col("y9").cast(dec38)).alias("sxy"),
        F.sum(F.col("x9").cast(dec38) * F.col("x9").cast(dec38)).alias("sxx"),
        F.sum(F.col("y9").cast(dec38) * F.col("y9").cast(dec38)).alias("syy"),
    )
    nD = F.col("n").cast(dec38)
    num = (nD * F.col("sxy") - F.col("sx").cast(dec38) * F.col("sy").cast(dec38)).cast("double")
    den = (nD * F.col("sxx") - F.col("sx").cast(dec38) * F.col("sx").cast(dec38)).cast("double")
    den2 = (nD * F.col("syy") - F.col("sy").cast(dec38) * F.col("sy").cast(dec38)).cast("double")
    slope = num / den
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / F.col("n").cast("double")
        * F.lit(1e-9)
    )
    return s.select(
        F.col("n").cast("int").alias("n_terms"),
        slope.alias("zipf_slope"),
        intercept.alias("intercept_log2"),
        ((num * num) / (den * den2)).alias("r2"),
    )


HEAPS_CHECKPOINTS = 10  # doc_id-percentile prefixes the Heaps fit samples
OOV_BUDGET = 4096  # tokenizer-vocabulary budget for the OOV-rate audit
NOVELTY_BUCKETS = 10  # corpus-order deciles for the bigram novelty curve


def _g9(c: Column) -> Column:
    """log2 snapped to the 9 dp grid, scaled to exact BIGINT nano-units
    (the vocab_zipf_fit fixed-point regression grid)."""
    return F.floor(
        F.round(F.log2(c.cast("double")), 9) * F.lit(1e9) + F.lit(0.5)
    ).cast("bigint")


def _loglog_fit(pts: DataFrame, slope_name: str) -> DataFrame:
    """Least-squares slope/intercept/R² of y9 against x9 (exact
    DECIMAL(38,0) normal equations over the nano-int grid — the
    vocab_zipf_fit policy, shared so Heaps and Zipf fits stay
    numerically identical in both engines)."""
    dec38 = "decimal(38,0)"
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x9").alias("sx"),
        F.sum("y9").alias("sy"),
        F.sum(F.col("x9").cast(dec38) * F.col("y9").cast(dec38)).alias("sxy"),
        F.sum(F.col("x9").cast(dec38) * F.col("x9").cast(dec38)).alias("sxx"),
        F.sum(F.col("y9").cast(dec38) * F.col("y9").cast(dec38)).alias("syy"),
    )
    nD = F.col("n").cast(dec38)
    num = (
        nD * F.col("sxy") - F.col("sx").cast(dec38) * F.col("sy").cast(dec38)
    ).cast("double")
    den = (
        nD * F.col("sxx") - F.col("sx").cast(dec38) * F.col("sx").cast(dec38)
    ).cast("double")
    den2 = (
        nD * F.col("syy") - F.col("sy").cast(dec38) * F.col("sy").cast(dec38)
    ).cast("double")
    # degenerate guards: den = 0 (no x variance) or den2 = 0 (no y
    # variance — e.g. a vocabulary-capped corpus keeps V constant) make
    # the fit undefined; report NULL rather than divide by zero (the
    # driver's toy 31-word corpus hits den2 = 0 on the Heaps fit).
    slope = F.when(den != 0, num / den)
    intercept = F.when(
        den != 0,
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / F.col("n").cast("double")
        * F.lit(1e-9),
    )
    return s.select(
        F.col("n").cast("int").alias("n_points"),
        slope.alias(slope_name),
        intercept.alias("intercept_log2"),
        F.when((den != 0) & (den2 != 0), (num * num) / (den * den2)).alias(
            "r2"
        ),
    )


def vocab_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(n) = K·n^β over corpus-order prefixes — the
    companion corpus-health number to ``vocab_zipf_fit``: natural text
    grows vocabulary as a sublinear power of token count (β ≈ 0.4-0.6);
    a capped or templated corpus bends the curve. The fit is the
    measurement behind tokenizer-budget and dedup-saturation planning:
    it says how much NEW vocabulary the next 10× of data will bring.

    Sampling: 10 doc_id-percentile checkpoints (exact interpolated
    percentiles, a 1-row aggregate exploded to 10 rows and broadcast —
    never a global sort). V(ck) counts tokens whose FIRST document
    (min doc_id — an exact integer per token) falls inside the prefix;
    n(ck) sums prefix token counts. Both are exact integers, so the
    log-log points land on the shared 9 dp grid and the regression is
    the exact-decimal ``_loglog_fit``. Token relation from the shared
    ``_lm_token_counts`` producer — no extra corpus pass."""
    tc = _lm_token_counts(spark, sf_dir)
    d = t(spark, sf_dir, "documents")
    ks = range(1, HEAPS_CHECKPOINTS + 1)
    cps = d.agg(
        *[
            F.percentile("doc_id", i / HEAPS_CHECKPOINTS).alias(f"c{i}")
            for i in ks
        ]
    )
    cp = cps.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("ck"), F.col(f"c{i}").alias("c"))
                    for i in ks
                ]
            )
        ).alias("s")
    ).select("s.ck", "s.c")
    first = tc.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    v = (
        first.join(F.broadcast(cp), F.col("first_doc") <= F.col("c"))
        .groupBy("ck")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    dl = tc.groupBy("doc_id").agg(F.sum("x").alias("n_toks"))
    n = (
        dl.join(F.broadcast(cp), F.col("doc_id") <= F.col("c"))
        .groupBy("ck")
        .agg(F.sum("n_toks").alias("n"))
    )
    pts = v.join(n, "ck").select(
        _g9(F.col("n")).alias("x9"), _g9(F.col("v")).alias("y9")
    )
    return _loglog_fit(pts, "heaps_beta")


def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary audit against a fixed tokenizer budget: the
    per-source token share NOT covered by the ``OOV_BUDGET`` most
    frequent corpus tokens — the number that says which sources a
    budget-V tokenizer will shred into bytes/unknowns (and therefore
    which sources inflate sequence lengths after tokenization).

    Shape: global term frequencies re-aggregate the shared
    ``_lm_token_counts`` producer; the budget vocabulary is an
    ``orderBy().limit()`` top-k (TakeOrderedAndProject, ties broken by
    token) whose size is the CONSTANT budget — broadcast onto the count
    table for a null-means-OOV left join; one per-source aggregation
    out. The corpus never shuffles beyond the producer's build."""
    tc = _lm_token_counts(spark, sf_dir)
    tf = tc.groupBy("tok").agg(F.sum("x").alias("freq"))
    vocab = (
        tf.orderBy(F.col("freq").desc(), "tok")
        .limit(OOV_BUDGET)
        .select("tok", F.lit(1).alias("in_v"))
    )
    per = tc.join(F.broadcast(vocab), "tok", "left")
    n_oov = F.sum(
        F.when(F.col("in_v").isNull(), F.col("x")).otherwise(F.lit(0))
    ).cast("bigint")
    return per.groupBy("source").agg(
        F.sum("x").cast("bigint").alias("n_tokens"),
        n_oov.alias("n_oov"),
        (
            n_oov.cast("double") / F.sum("x").cast("double")
        ).alias("oov_rate"),
    )


def corpus_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary overlap matrix — the corpus-mix
    diagnostic read before weighting sources independently: for every
    ordered source pair (src_a < src_b) that shares at least one term,
    the shared distinct-term count, both vocabulary sizes, Jaccard
    |A∩B|/|A∪B|, and the overlap coefficient |A∩B|/min(|A|,|B|) (high
    overlap-coef at low Jaccard marks a small source nested inside a
    big one — syndication, the same signal `dedup_containment` gives
    per document, here at source granularity).

    Scale shape: rides ``_lm_token_counts`` (no new corpus explode);
    the distinct (source, term) relation is |sources|·|vocab|-bounded,
    the self-join fans out per term by the number of sources carrying
    it (≤ |sources|, a catalog-sized constant), and the output is
    ≤ C(|sources|, 2) rows. Divisions are single int/int IEEE ops —
    bit-identical cross-engine; zero-shared pairs are absent by inner
    join in BOTH engines."""
    sv = _lm_token_counts(spark, sf_dir).select("source", "tok").distinct()
    vocab = sv.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a = sv.select(F.col("source").alias("src_a"), "tok")
    b = sv.select(F.col("source").alias("src_b"), "tok")
    shared = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    va = vocab.select(F.col("source").alias("src_a"), F.col("v").alias("v_a"))
    vb = vocab.select(F.col("source").alias("src_b"), F.col("v").alias("v_b"))
    return (
        shared.join(va, "src_a")
        .join(vb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "v_a",
            "v_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("v_a") + F.col("v_b") - F.col("n_shared")).cast(
                    "double"
                )
            ).alias("jaccard"),
            (
                F.col("n_shared").cast("double")
                / F.least("v_a", "v_b").cast("double")
            ).alias("overlap_coef"),
        )
    )


MINK_FRAC = 0.2  # Min-K%: the fraction of lowest-probability tokens


def doc_mink_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-K% probability membership signal (Shi et al. 2023,
    "Detecting Pretraining Data from Large Language Models"): per
    document, the mean log₂ p(token) over the 20% (``MINK_FRAC``)
    LOWEST-probability token occurrences under the corpus add-one
    unigram LM. Documents whose rarest-token tail is still
    high-probability read as memorized/duplicated material; the score
    is the standard pretraining-data-detection statistic, here with the
    corpus's own unigram LM standing in for the target model's token
    probabilities (the LM is swappable — the plan only needs a
    (token, logprob) relation).

    Scale shape: rides the shared ``_lm_token_counts`` producer (no new
    corpus explode). The k%-tail selection needs no per-occurrence
    explode either: occurrences of one distinct (doc, token) share a
    probability, so sorting the per-doc DISTINCT token rows by tf and
    taking a cnt-weighted prefix is exact — one per-doc window over
    |distinct tokens| rows (bounded by doc length), shuffle keyed on
    doc_id. Per-row take = clamp(k − cum_before, 0, cnt) handles the
    boundary token's partial inclusion.

    Float determinism (PERF 8/13 policy): log2 over shared integers
    snapped to the 9 dp grid; the weighted tail sum runs as an exact
    DECIMAL(18,6) reduction; the only IEEE ops are one division by k
    and one subtraction of the grid-snapped normalizer — bit-identical
    under any partitioning and across engines."""
    doc_tok = _lm_token_counts(spark, sf_dir).select(
        "doc_id", F.col("tok").alias("token"), F.col("x").alias("cnt")
    )
    tf = doc_tok.groupBy("token").agg(F.sum("cnt").alias("tf"))
    tot = tf.agg(
        F.sum("tf").alias("n_total"), F.count(F.lit(1)).alias("vocab")
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tf").asc(), F.col("token").asc())
    cum = F.coalesce(
        F.sum("cnt").over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    n_tokens = F.sum("cnt").over(W.partitionBy("doc_id"))
    k = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil(F.lit(MINK_FRAC) * n_tokens.cast("double")).cast("bigint"),
    )
    scored = doc_tok.join(F.broadcast(tf), "token").select(
        "doc_id",
        "cnt",
        F.round(F.log2(F.col("tf").cast("double") + 1.0), 9).alias("l9"),
        cum.alias("cum"),
        n_tokens.alias("n_tokens"),
        k.alias("k_used"),
    )
    take = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.col("cnt"), F.col("k_used") - F.col("cum")),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.max("k_used").alias("k_used"),
        F.sum((take.cast("double") * F.col("l9")).cast(DEC)).alias("_sc"),
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_tokens",
        "k_used",
        (
            F.col("_sc").cast("double") / F.col("k_used").cast("double")
            - F.round(
                F.log2((F.col("n_total") + F.col("vocab")).cast("double")), 9
            )
        ).alias("mink_logprob_bits"),
    )


def corpus_bigram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram novelty curve over corpus order — the dataset-ordering
    diagnostic a curriculum/repetition review reads: per corpus-order
    decile, how much of the bigram VOLUME was already seen in an
    earlier decile (repeat share rises as the corpus saturates; a flat
    curve means the source mix keeps injecting novelty, a cliff means
    the tail is recycled boilerplate), plus the count of new bigram
    types each decile introduces.

    Buckets are doc_id-percentile deciles (1-row percentile aggregate
    broadcast; bucket = #thresholds below the doc's id — pure per-row
    arithmetic, no global sort). First-seen bucket per bigram is an
    exact MIN; instances re-use the shared ``_lm_bigram_counts``
    producer, so the corpus pays no new explode. Repeat semantics are
    bucket-level: an instance is 'repeat' iff its bigram first occurred
    in a STRICTLY earlier bucket."""
    bc = _lm_bigram_counts(spark, sf_dir)
    d = t(spark, sf_dir, "documents")
    ths = range(1, NOVELTY_BUCKETS)
    cps = d.agg(
        *[
            F.percentile("doc_id", i / NOVELTY_BUCKETS).alias(f"c{i}")
            for i in ths
        ]
    )
    bucket = sum(
        [
            F.when(F.col("doc_id") > F.col(f"c{i}"), 1).otherwise(0)
            for i in ths
        ],
        F.lit(0),
    ).cast("int")
    db = (
        d.select("doc_id")
        .crossJoin(F.broadcast(cps))
        .select("doc_id", bucket.alias("bucket"))
    )
    inst = bc.join(db, "doc_id").select("w1", "w2", "bucket", "x")
    firstb = inst.groupBy("w1", "w2").agg(F.min("bucket").alias("first_bucket"))
    per = (
        inst.join(firstb, ["w1", "w2"])
        .groupBy("bucket")
        .agg(
            F.sum("x").cast("bigint").alias("n_instances"),
            F.sum(
                F.when(F.col("first_bucket") < F.col("bucket"), F.col("x"))
                .otherwise(F.lit(0))
            ).cast("bigint").alias("n_repeat_instances"),
        )
    )
    nt = firstb.groupBy(F.col("first_bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_new_types")
    )
    return per.join(nt, "bucket", "left").select(
        "bucket",
        "n_instances",
        "n_repeat_instances",
        (
            F.col("n_repeat_instances").cast("double")
            / F.col("n_instances").cast("double")
        ).alias("repeat_share"),
        F.coalesce(F.col("n_new_types"), F.lit(0)).cast("bigint").alias(
            "n_new_types"
        ),
    )


QUERIES = {
    "doc_padding_waste": doc_padding_waste,
    "vocab_zipf_fit": vocab_zipf_fit,
    "vocab_heaps_law_fit": vocab_heaps_law_fit,
    "vocab_oov_rate": vocab_oov_rate,
    "corpus_bigram_novelty_decay": corpus_bigram_novelty_decay,
    "doc_source_distinctive_terms": doc_source_distinctive_terms,
    "doc_winnow_overlap": doc_winnow_overlap,
    "doc_lm_perplexity": doc_lm_perplexity,
    "doc_mink_prob": doc_mink_prob,
    "corpus_source_vocab_overlap": corpus_source_vocab_overlap,
    "doc_bigram_perplexity": doc_bigram_perplexity,
    "doc_kneser_ney_perplexity": doc_kneser_ney_perplexity,
    "doc_sparse_cosine_topk": doc_sparse_cosine_topk,
    "doc_perplexity_buckets": doc_perplexity_buckets,
    "doc_ngram_scrub": doc_ngram_scrub,
    "doc_chunk": doc_chunk,
    "doc_winnow": doc_winnow,
    "doc_token_novelty": doc_token_novelty,
    "token_cms_heavy_hitters": token_cms_heavy_hitters,
    "doc_pack_sequences": doc_pack_sequences,
    "doc_split_assign": doc_split_assign,
    "doc_pii_scrub": doc_pii_scrub,
    "doc_quality_gates": doc_quality_gates,
    "doc_repetition": doc_repetition,
    "doc_source_mix": doc_source_mix,
    "corpus_mix_rebalance": corpus_mix_rebalance,
    "doc_sample_stratified": doc_sample_stratified,
    "doc_char_entropy": doc_char_entropy,
    "doc_rake_keywords": doc_rake_keywords,
    "token_pmi_cooccurrence": token_pmi_cooccurrence,
    "doc_token_stats": doc_token_stats,
    "doc_quality": doc_quality,
    "doc_subword_counts": doc_subword_counts,
    "doc_rolling_hash": doc_rolling_hash,
    "lang_id": lang_id,
    "lang_id_confusion": lang_id_confusion,
    "bpe_first_merges": bpe_first_merges,
    "doc_fingerprint": doc_fingerprint,
    "token_frequency": token_frequency,
    "bigram_frequency": bigram_frequency,
    "vocab_coverage_curve": vocab_coverage_curve,
    "doc_blocklist_filter": doc_blocklist_filter,
    "doc_bm25_search": doc_bm25_search,
    "doc_length_winsorized": doc_length_winsorized,
    "doc_rrf_fusion": doc_rrf_fusion,
}

_HITS = {
    lang: f"len(list_filter({_TOKS_SQL}, x -> x IN {_in_list(m)}))"
    for lang, m in LANG_MARKERS.items()
}

_RAW_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-'"
    " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)
# tk must be bound once in an enclosing select (see
# dedup_queries._SHINGLES_CTE): inlining the split into the lambda
# re-evaluates the full-text regex PER ELEMENT.
_TRIGRAMS_SQL = (
    "CASE WHEN len(tk) < 3 THEN [] "
    "ELSE list_transform(range(1, len(tk) - 1), "
    "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END"
)

_CMS_CELL = (
    "CAST(('0x' || substr(md5('cms' || CAST({r} AS VARCHAR) || '|' || {tok}),"
    f" 1, 15)) AS BIGINT) % {CMS_W}"
)

# Winnowing fingerprint relation, shared by the doc_winnow oracle and the
# doc_winnow_overlap oracle (which treats it as a subquery). CTE-free on
# purpose so it composes inside another WITH block.
_WINNOW_SQL = f"""
        SELECT DISTINCT doc_id,
               CAST({(1 << _POS_BITS) - 1} - (sel_key % {1 << _POS_BITS}) AS INT)
                 AS fp_pos,
               sel_key // {1 << _POS_BITS} AS fp_hash
        FROM (
          SELECT doc_id,
                 min(key) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW)
                   AS sel_key,
                 row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
          FROM (
            SELECT doc_id, pos,
                   (CAST(('0x' || substr(md5(tri), 1, 15)) AS BIGINT)
                      % {WINNOW_M}) * {1 << _POS_BITS}
                     + ({(1 << _POS_BITS) - 1} - pos) AS key
            FROM (
              SELECT doc_id, generate_subscripts(tr, 1) - 1 AS pos,
                     unnest(tr) AS tri
              FROM (SELECT doc_id,
                           list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                             AS tr
                    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
                    WHERE len(toks) >= 3)
            )
          )
        ) WHERE rn >= {WINNOW_W}
"""

ORACLES = {
    # base/tris are referenced more than once — DuckDB inlines CTEs by
    # default and would re-evaluate the tokenization/trigram build per
    # reference (PERF.md finding 9), hence AS MATERIALIZED.
    "doc_lm_perplexity": f"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
        ),
        tf AS MATERIALIZED (
          SELECT token, count(1) AS tf FROM tok GROUP BY 1
        ),
        tot AS (
          SELECT CAST(SUM(tf) AS BIGINT) AS n_total, count(1) AS vocab FROM tf
        ),
        doc_tok AS (
          SELECT doc_id, token, count(1) AS cnt FROM tok GROUP BY 1, 2
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                 CAST(SUM(CAST(CAST(cnt AS DOUBLE)
                               * round(log2(CAST(tf AS DOUBLE) + 1.0), 9)
                               AS DECIMAL(18,6))) AS DOUBLE) AS sb
          FROM doc_tok JOIN tf USING (token) GROUP BY 1
        )
        SELECT doc_id, n_tokens,
               round(log2(CAST(n_total + vocab AS DOUBLE)), 9)
                     - sb / CAST(n_tokens AS DOUBLE) AS cross_entropy_bits,
               round(pow(2.0, round(log2(CAST(n_total + vocab AS DOUBLE)), 9)
                     - sb / CAST(n_tokens AS DOUBLE)), 6) AS perplexity
        FROM per_doc CROSS JOIN tot
    """,
    "doc_mink_prob": f"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
        ),
        tf AS MATERIALIZED (
          SELECT token, count(1) AS tf FROM tok GROUP BY 1
        ),
        tot AS (
          SELECT CAST(SUM(tf) AS BIGINT) AS n_total, count(1) AS vocab FROM tf
        ),
        doc_tok AS (
          SELECT doc_id, token, count(1) AS cnt FROM tok GROUP BY 1, 2
        ),
        scored AS (
          SELECT d.doc_id, d.cnt,
                 round(log2(CAST(f.tf AS DOUBLE) + 1.0), 9) AS l9,
                 COALESCE(SUM(d.cnt) OVER (
                   PARTITION BY d.doc_id ORDER BY f.tf ASC, d.token ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   CAST(0 AS BIGINT)) AS cum,
                 SUM(d.cnt) OVER (PARTITION BY d.doc_id) AS n_tokens
          FROM doc_tok d JOIN tf f USING (token)
        ),
        taken AS (
          SELECT doc_id, cnt, l9, cum, n_tokens,
                 GREATEST(CAST(1 AS BIGINT),
                          CAST(ceil({MINK_FRAC} * CAST(n_tokens AS DOUBLE))
                               AS BIGINT)) AS k_used
          FROM scored
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
                 MAX(k_used) AS k_used,
                 CAST(SUM(CAST(
                   CAST(GREATEST(CAST(0 AS BIGINT),
                                 LEAST(cnt, k_used - cum)) AS DOUBLE) * l9
                   AS DECIMAL(18,6))) AS DOUBLE) AS sc
          FROM taken GROUP BY 1
        )
        SELECT doc_id, n_tokens, k_used,
               sc / CAST(k_used AS DOUBLE)
                 - round(log2(CAST(n_total + vocab AS DOUBLE)), 9)
                     AS mink_logprob_bits
        FROM per_doc CROSS JOIN tot
    """,
    "corpus_source_vocab_overlap": f"""
        WITH sv AS MATERIALIZED (
          SELECT DISTINCT source, unnest({_TOKS_SQL}) AS tok
          FROM documents
        ),
        vocab AS (
          SELECT source, count(1) AS v FROM sv GROUP BY 1
        ),
        shared AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 count(1) AS n_shared
          FROM sv a JOIN sv b ON a.tok = b.tok AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT s.src_a, s.src_b, s.n_shared,
               va.v AS v_a, vb.v AS v_b,
               CAST(s.n_shared AS DOUBLE)
                 / CAST(va.v + vb.v - s.n_shared AS DOUBLE) AS jaccard,
               CAST(s.n_shared AS DOUBLE)
                 / CAST(least(va.v, vb.v) AS DOUBLE) AS overlap_coef
        FROM shared s
        JOIN vocab va ON va.source = s.src_a
        JOIN vocab vb ON vb.source = s.src_b
    """,
    "doc_ngram_scrub": f"""
        WITH base AS MATERIALIZED (
          SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
        ),
        tok_pos AS (
          SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
                 unnest(toks) AS tok
          FROM base
        ),
        tris AS MATERIALIZED (
          SELECT doc_id, generate_subscripts(tr, 1) - 1 AS start,
                 unnest(tr) AS tri
          FROM (SELECT doc_id,
                       list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                         AS tr
                FROM base WHERE len(toks) >= 3)
        ),
        hot AS (
          SELECT tri FROM tris GROUP BY tri
          HAVING count(DISTINCT doc_id) >= {SCRUB_MIN_DF}
        ),
        covered AS (
          SELECT DISTINCT doc_id, unnest([start, start + 1, start + 2]) AS pos
          FROM tris JOIN hot USING (tri)
        ),
        kept AS (
          SELECT doc_id, pos, tok
          FROM tok_pos ANTI JOIN covered USING (doc_id, pos)
        ),
        rebuilt AS (
          SELECT doc_id, count(1) AS n_kept,
                 string_agg(tok, ' ' ORDER BY pos) AS scrubbed
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(len(d.toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(len(d.toks) - coalesce(r.n_kept, 0) AS BIGINT)
                 AS n_masked,
               md5(coalesce(r.scrubbed, '')) AS scrubbed_fp,
               CAST(len(d.toks) - coalesce(r.n_kept, 0) AS DOUBLE)
                 / CAST(len(d.toks) AS DOUBLE) AS mask_ratio
        FROM base d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """,
    "doc_chunk": f"""
        SELECT doc_id,
               CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_idx,
               CAST(unnest(range(0, n_chunks)) * {CHUNK_STRIDE} AS INT)
                 AS start_tok,
               CAST(unnest(list_transform(range(0, n_chunks),
                 c -> least({CHUNK_SIZE}, n - c * {CHUNK_STRIDE}))) AS INT)
                 AS n_chunk_tokens,
               unnest(list_transform(range(0, n_chunks),
                 c -> md5(array_to_string(
                        list_slice(toks, c * {CHUNK_STRIDE} + 1,
                                   c * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' '))))
                 AS chunk_fp
        FROM (
          SELECT doc_id, {_TOKS_SQL} AS toks, len({_TOKS_SQL}) AS n,
                 CAST(ceil(len({_TOKS_SQL}) / {CHUNK_STRIDE}.0) AS INT)
                   AS n_chunks
          FROM documents
        )
    """,
    "doc_winnow": _WINNOW_SQL,
    "doc_winnow_overlap": f"""
        WITH fps AS MATERIALIZED (
          SELECT DISTINCT doc_id, fp_hash FROM ({_WINNOW_SQL})
        ),
        kept AS (
          SELECT fp_hash FROM fps GROUP BY fp_hash
          HAVING count(1) <= {WINNOW_MAX_DF}
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(1) AS n_shared_fps
        FROM fps a
        JOIN kept k ON a.fp_hash = k.fp_hash
        JOIN fps b ON b.fp_hash = a.fp_hash AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(1) >= {WINNOW_MIN_SHARED}
    """,
    "doc_token_novelty": f"""
        WITH pairs AS (
          SELECT doc_id, unnest(list_distinct({_TOKS_SQL})) AS token
          FROM documents
        ),
        dfs AS (SELECT token, count(1) AS df FROM pairs GROUP BY 1),
        n AS (SELECT count(1) AS n_docs FROM documents)
        SELECT doc_id,
               count(1) AS n_distinct_tokens,
               CAST(SUM(df) AS DOUBLE) / CAST(count(1) AS DOUBLE)
                 AS mean_token_df,
               CAST(SUM(CASE WHEN df * 2 > n_docs THEN 1 ELSE 0 END) AS INT)
                 AS n_common_tokens
        FROM pairs JOIN dfs USING (token) CROSS JOIN n
        GROUP BY doc_id
    """,
    "token_cms_heavy_hitters": f"""
        WITH tf AS (
          SELECT token, count(1) AS tf
          FROM (SELECT unnest({_TOKS_SQL}) AS token FROM documents)
          GROUP BY token
        ),
        rows_r AS (
          SELECT token, tf, unnest(range(0, {CMS_D})) AS r FROM tf
        ),
        sketch AS (
          SELECT r, {_CMS_CELL.format(r="r", tok="token")} AS cell,
                 CAST(SUM(tf) AS BIGINT) AS cnt
          FROM rows_r GROUP BY 1, 2
        ),
        top AS (
          SELECT token, tf FROM tf ORDER BY tf DESC, token ASC LIMIT {CMS_TOPK}
        ),
        probes AS (
          SELECT token, tf, r, {_CMS_CELL.format(r="r", tok="token")} AS cell
          FROM (SELECT token, tf, unnest(range(0, {CMS_D})) AS r FROM top)
        )
        SELECT p.token, p.tf, min(s.cnt) AS cms_est,
               min(s.cnt) - p.tf AS overcount
        FROM probes p JOIN sketch s ON p.r = s.r AND p.cell = s.cell
        GROUP BY p.token, p.tf
    """,
    # Mirror of doc_pack_sequences: same per-source doc_id-ordered
    # cumsum and floor-division bin derivation (integer token counts,
    # so no float-determinism concern until the final ratio division).
    "doc_pack_sequences": f"""
        WITH base AS (
          SELECT doc_id, source, len({_TOKS_SQL}) AS n_tokens
          FROM documents
        ),
        packed AS (
          SELECT source, n_tokens,
                 CAST(floor(
                   (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) - n_tokens)
                   / {PACK_CONTEXT}.0) AS INTEGER) AS bin_id
          FROM base
        )
        SELECT source, bin_id,
               count(1) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_tokens) AS DOUBLE) / {PACK_CONTEXT}.0 AS fill_ratio
        FROM packed GROUP BY 1, 2
    """,
    # Same md5→bigint bucket both engines use for LSH plane seeds.
    "doc_split_assign": f"""
        WITH b AS (
          SELECT doc_id, source,
                 CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)),
                                      1, 15)) AS BIGINT) % 100 AS split_bucket
          FROM documents
        )
        SELECT doc_id, source, split_bucket,
               CASE WHEN split_bucket < {SPLIT_TRAIN_LT} THEN 'train'
                    WHEN split_bucket < {SPLIT_TRAIN_LT + 2} THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """,
    "doc_pii_scrub": f"""
        WITH raw AS (SELECT doc_id, {_RAW_SQL} AS r FROM documents),
        s AS (
          SELECT doc_id, r,
                 regexp_replace(
                   regexp_replace(r, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}',
                   '<PHONE>', 'g') AS sc
          FROM raw
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(r, '{EMAIL_RE}')) AS INT) AS n_emails,
               CAST(len(regexp_extract_all(r, '{PHONE_RE}')) AS INT)
                 AS n_phones,
               md5(sc) AS scrubbed_fp,
               CAST(length(r) - length(sc) AS INT) AS chars_removed
        FROM s
    """,
    "doc_quality_gates": f"""
        WITH base AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS tok FROM base),
        top AS (
          SELECT doc_id, max(c) AS top_tok_count
          FROM (SELECT doc_id, tok, count(1) AS c FROM tok GROUP BY 1, 2)
          GROUP BY 1
        ),
        stats AS (
          SELECT b.doc_id,
                 CAST(len(toks) AS INT) AS n_tokens,
                 CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) AS avg_token_len,
                 len(list_distinct(toks)) AS n_distinct,
                 t.top_tok_count
          FROM base b JOIN top t USING (doc_id)
        )
        SELECT doc_id, n_tokens,
               n_tokens BETWEEN {GATE_MIN_TOKENS} AND {GATE_MAX_TOKENS}
                 AS pass_token_count,
               avg_token_len BETWEEN {GATE_MIN_AVG_LEN} AND {GATE_MAX_AVG_LEN}
                 AS pass_avg_len,
               CAST(top_tok_count AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 <= {GATE_MAX_TOP_SHARE} AS pass_dominance,
               CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 >= {GATE_MIN_DISTINCT_RATIO} AS pass_ttr,
               (n_tokens BETWEEN {GATE_MIN_TOKENS} AND {GATE_MAX_TOKENS})
                 AND (avg_token_len BETWEEN {GATE_MIN_AVG_LEN} AND {GATE_MAX_AVG_LEN})
                 AND (CAST(top_tok_count AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                      <= {GATE_MAX_TOP_SHARE})
                 AND (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                      >= {GATE_MIN_DISTINCT_RATIO}) AS keep
        FROM stats
    """,
    "doc_repetition": f"""
        WITH sh AS (SELECT doc_id, {_TRIGRAMS_SQL} AS shingles
                    FROM (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents))
        SELECT doc_id,
               CAST(len(shingles) AS BIGINT) AS n_shingles,
               CAST(len(list_distinct(shingles)) AS BIGINT)
                 AS n_distinct_shingles,
               1.0 - (CAST(len(list_distinct(shingles)) AS DOUBLE)
                      / CAST(len(shingles) AS DOUBLE)) AS repetition_ratio,
               1.0 - (CAST(len(list_distinct(shingles)) AS DOUBLE)
                      / CAST(len(shingles) AS DOUBLE)) > 0.2 AS is_repetitive
        FROM sh WHERE len(shingles) > 0
    """,
    "doc_source_mix": f"""
        WITH per AS (
          SELECT source, count(1) AS n_docs,
                 CAST(sum(len({_TOKS_SQL})) AS BIGINT) AS n_tokens,
                 CAST(sum(n_chars) AS BIGINT) AS sum_chars
          FROM documents GROUP BY 1
        )
        SELECT source, n_docs, n_tokens, sum_chars,
               CAST(n_tokens AS DOUBLE)
                 / CAST((SELECT sum(n_tokens) FROM per) AS DOUBLE) AS token_share
        FROM per
    """,
    # Mirror of corpus_mix_rebalance: HUGEINT sums cast to BIGINT, all
    # literals cast to DOUBLE explicitly (DuckDB float literals are
    # DECIMAL), and the rebalanced total runs through the same
    # DECIMAL(28,12) exact-sum policy as the Spark side.
    "corpus_mix_rebalance": f"""
        WITH per AS (
          SELECT source, lang, count(1) AS n_docs,
                 CAST(sum(len({_TOKS_SQL})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1, 2
        ),
        tot AS (
          SELECT CAST(sum(n_tokens) AS BIGINT) AS _tot, count(1) AS _cells
          FROM per
        ),
        base AS (
          SELECT source, lang, n_docs, n_tokens,
                 CAST(n_tokens AS DOUBLE) / CAST(_tot AS DOUBLE) AS token_share,
                 CAST(1.0 AS DOUBLE) / CAST(_cells AS DOUBLE) AS target_share
          FROM per CROSS JOIN tot
        ),
        exp AS (
          SELECT *,
                 least(target_share / token_share,
                       CAST({MIX_MAX_EPOCHS} AS DOUBLE)) AS epochs,
                 CAST(n_tokens AS DOUBLE)
                   * least(target_share / token_share,
                           CAST({MIX_MAX_EPOCHS} AS DOUBLE)) AS expected_tokens
          FROM base
        )
        SELECT source, lang, n_docs, n_tokens, token_share, target_share,
               epochs, expected_tokens,
               expected_tokens
                 / (SELECT CAST(SUM(CAST(floor(expected_tokens * 1000.0 + 0.5)
                                         AS BIGINT)) AS DOUBLE) / 1000.0
                    FROM exp) AS expected_share
        FROM exp
    """,
    "doc_sample_stratified": f"""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % {SAMPLE_BUCKETS} < {SAMPLE_KEEP}
    """,
    # Mirror of token_pmi_cooccurrence: same positional shifts (three
    # UNION ALL branches), exact per-doc pair total, 9 dp-snapped log2
    # over identical integer-derived doubles.
    "token_pmi_cooccurrence": f"""
        WITH tok0 AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks) + 1),
                   i -> struct_pack(pos := CAST(i - 1 AS INT),
                                    token := toks[i]))) AS s
          FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
        ),
        tok AS (
          SELECT doc_id, s.pos AS pos, s.token AS token FROM tok0
        ),
        uni AS (SELECT token, count(1) AS c FROM tok GROUP BY 1),
        rightt AS (
          SELECT doc_id, pos - 1 AS pos, token AS token_b FROM tok
          UNION ALL
          SELECT doc_id, pos - 2 AS pos, token AS token_b FROM tok
          UNION ALL
          SELECT doc_id, pos - 3 AS pos, token AS token_b FROM tok
        ),
        pairs AS (
          SELECT a.token AS token_a, r.token_b, count(1) AS n_cooc
          FROM tok a JOIN rightt r
            ON a.doc_id = r.doc_id AND a.pos = r.pos
          GROUP BY 1, 2 HAVING count(1) >= {PMI_MIN_COOC}
        ),
        tp AS (
          SELECT CAST(SUM(greatest(n - 1, 0) + greatest(n - 2, 0)
                          + greatest(n - 3, 0)) AS BIGINT) AS _tp
          FROM (SELECT doc_id, count(1) AS n FROM tok GROUP BY 1)
        ),
        scored AS (
          SELECT token_a, token_b, n_cooc,
                 round(log2((CAST(n_cooc AS DOUBLE) * CAST(_tp AS DOUBLE))
                       / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))), 9)
                   AS pmi
          FROM pairs
          JOIN uni ca ON ca.token = pairs.token_a
          JOIN uni cb ON cb.token = pairs.token_b
          CROSS JOIN tp
        )
        SELECT token_a, token_b, n_cooc, pmi, rank FROM (
          SELECT *, row_number() OVER (
                      ORDER BY pmi DESC, token_a, token_b) AS rank
          FROM scored)
        WHERE rank <= {PMI_TOP}
    """,
    # Mirror of doc_rake_keywords: same running-stopword phrase ids,
    # integer deg/freq, fixed-point phrase-score reduction (PERF 29),
    # pos-ordered string_agg, identical-phrase collapse before ranking.
    "doc_rake_keywords": f"""
        WITH tok0 AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks) + 1),
                   i -> struct_pack(pos := CAST(i - 1 AS INT),
                                    token := toks[i]))) AS s
          FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
        ),
        tok AS (
          SELECT doc_id, s.pos AS pos, s.token AS token FROM tok0
        ),
        run AS (
          SELECT doc_id, pos, token,
                 CASE WHEN token IN {_in_list(STOPWORDS)}
                      THEN 1 ELSE 0 END AS st,
                 SUM(CASE WHEN token IN {_in_list(STOPWORDS)}
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
          FROM tok
        ),
        member AS (
          SELECT doc_id, phrase_id, pos, token,
                 count(1) OVER (PARTITION BY doc_id, phrase_id) AS plen
          FROM run WHERE st = 0
        ),
        ws AS (
          SELECT doc_id, token, count(1) AS freq,
                 CAST(sum(plen) AS BIGINT) AS deg
          FROM member GROUP BY 1, 2
        ),
        scored AS (
          SELECT m.doc_id, m.phrase_id, m.pos, m.token,
                 CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS wscore
          FROM member m JOIN ws ON m.doc_id = ws.doc_id
                               AND m.token = ws.token
        ),
        ph AS (
          SELECT doc_id, phrase_id,
                 string_agg(token, ' ' ORDER BY pos) AS phrase,
                 count(1) AS n_words,
                 CAST(SUM(CAST(floor(wscore * 1000000000.0 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 1000000000.0
                   AS rake_score
          FROM scored GROUP BY 1, 2
        ),
        uq AS (
          SELECT doc_id, phrase, count(1) AS n_occurrences,
                 CAST(max(n_words) AS BIGINT) AS n_words,
                 max(rake_score) AS rake_score
          FROM ph GROUP BY 1, 2
        )
        SELECT doc_id, phrase, n_occurrences, n_words, rake_score, rank
        FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY rake_score DESC, phrase) AS rank
          FROM uq)
        WHERE rank <= {RAKE_TOP}
    """,
    # Mirror of doc_char_entropy: same char explode as doc_rolling_hash
    # (string_split_regex ↔ F.split on ''), log2 over shared integers on
    # the 9 dp grid, fixed-point BIGINT per-doc reduction (PERF 29).
    "doc_char_entropy": f"""
        WITH ch AS (
          SELECT doc_id, unnest(string_split_regex({_NORM_SQL}, '')) AS ch
          FROM documents
        ),
        per AS (SELECT doc_id, ch, count(1) AS cnt FROM ch GROUP BY 1, 2),
        agg AS (
          SELECT doc_id,
                 CAST(sum(cnt) AS BIGINT) AS n_chars_norm,
                 count(1) AS n_distinct_chars,
                 CAST(SUM(CAST(floor(CAST(cnt AS DOUBLE)
                                     * round(log2(CAST(cnt AS DOUBLE)), 9)
                                     * 1000000000.0 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 1000000000.0
                   AS _bits
          FROM per GROUP BY 1
        )
        SELECT doc_id, n_chars_norm, n_distinct_chars,
               round(log2(CAST(n_chars_norm AS DOUBLE)), 9)
                 - _bits / CAST(n_chars_norm AS DOUBLE) AS entropy_bits
        FROM agg
    """,
    "doc_token_stats": f"""
        SELECT doc_id,
               len({_TOKS_SQL}) AS n_tokens,
               len(list_distinct({_TOKS_SQL})) AS n_distinct_tokens,
               CAST(length(replace({_NORM_SQL}, ' ', '')) AS DOUBLE)
                 / CAST(len({_TOKS_SQL}) AS DOUBLE) AS avg_token_len
        FROM documents
    """,
    "doc_quality": f"""
        WITH base AS (
          SELECT doc_id,
                 len({_TOKS_SQL}) AS n_tokens,
                 CAST(len(list_filter({_TOKS_SQL}, x -> x IN {_in_list(STOPWORDS)})) AS DOUBLE)
                   / CAST(len({_TOKS_SQL}) AS DOUBLE) AS stopword_ratio,
                 CAST(len(list_filter({_TOKS_SQL}, x -> length(x) >= 5)) AS DOUBLE)
                   / CAST(len({_TOKS_SQL}) AS DOUBLE) AS long_token_ratio
          FROM documents
        )
        SELECT doc_id, n_tokens, stopword_ratio, long_token_ratio,
               (1 - stopword_ratio) * 0.5 + long_token_ratio * 0.5 AS quality_score,
               ((1 - stopword_ratio) * 0.5 + long_token_ratio * 0.5) > 0.4 AS keep
        FROM base
    """,
    "doc_subword_counts": f"""
        SELECT doc_id,
               len(regexp_extract_all({_NORM_SQL}, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                 AS n_subword_pieces,
               len({_TOKS_SQL}) AS n_ws_tokens,
               CAST(len(regexp_extract_all({_NORM_SQL}, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE)
                 / CAST(len({_TOKS_SQL}) AS DOUBLE) AS pieces_per_word
        FROM documents
    """,
    "doc_rolling_hash": f"""
        SELECT doc_id,
               list_reduce(
                 list_transform(string_split_regex({_NORM_SQL}, ''), c -> CAST(ascii(c) AS BIGINT)),
                 (acc, x) -> (acc * {ROLLING_B} + x) % {ROLLING_M}
               ) AS rolling_hash
        FROM documents
    """,
    "lang_id": f"""
        WITH hits AS (
          SELECT doc_id, lang,
                 {_HITS['en']} AS hits_en,
                 {_HITS['de']} AS hits_de,
                 {_HITS['es']} AS hits_es,
                 {_HITS['fr']} AS hits_fr
          FROM documents
        )
        SELECT doc_id, lang, hits_en, hits_de, hits_es, hits_fr,
               CASE WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'en'
                    WHEN hits_de = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'de'
                    WHEN hits_es = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'es'
                    WHEN hits_fr = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'fr'
               END AS lang_pred
        FROM hits
    """,
    "doc_fingerprint": f"""
        SELECT doc_id,
               md5({_NORM_SQL}) AS fp_md5,
               CAST(('0x' || substr(md5({_NORM_SQL}), 1, 15)) AS BIGINT) AS fp64
        FROM documents
    """,
    "token_frequency": f"""
        SELECT token, count(1) AS tf, count(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents)
        GROUP BY 1
    """,
    "bigram_frequency": f"""
        SELECT bigram, count(1) AS n
        FROM (
          SELECT unnest(list_transform(range(1, len(tk)),
                        i -> tk[i] || ' ' || tk[i+1])) AS bigram
          FROM (SELECT {_TOKS_SQL} AS tk FROM documents)
        )
        GROUP BY 1
    """,
}

# Mirror of doc_blocklist_filter: list_filter hit count, double ratio.
ORACLES["doc_blocklist_filter"] = f"""
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_filter(toks, x -> x IN {_in_list(BLOCKLIST)}))
             AS n_blocked,
           CAST(len(list_filter(toks, x -> x IN {_in_list(BLOCKLIST)}))
                AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS blocked_ratio,
           len(list_filter(toks, x -> x IN {_in_list(BLOCKLIST)})) = 0
             AS keep_strict,
           CAST(len(list_filter(toks, x -> x IN {_in_list(BLOCKLIST)}))
                AS DOUBLE) / CAST(len(toks) AS DOUBLE) < {BLOCK_RATIO_MAX}
             AS keep_soft
    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
"""

# Mirror of vocab_coverage_curve: same bigram counts, row_number rank
# by (n DESC, bigram), covered = running sum at the last rank <= K.
ORACLES["vocab_coverage_curve"] = f"""
    WITH bg AS ({ORACLES["bigram_frequency"]}),
    r AS (
      SELECT bigram, n,
             row_number() OVER (ORDER BY n DESC, bigram) AS rnk
      FROM bg
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM bg)
    SELECT c.cutoff,
           CAST(max(r.rnk) AS BIGINT) AS n_types,
           CAST(sum(r.n) AS BIGINT) AS covered_occurrences,
           (SELECT t FROM tot) AS total_occurrences,
           CAST(sum(r.n) AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE)
             AS coverage
    FROM (VALUES {", ".join(f"({c})" for c in VOCAB_CUTOFFS)}) c(cutoff)
    JOIN r ON r.rnk <= c.cutoff
    GROUP BY 1
"""

# Composed after the dict to reuse the lang_id oracle verbatim (nested
# WITH inside a CTE body — same pattern as the curation manifest).
# The oracle ranks with the keyed row_number the Spark side deliberately
# avoids (fine at oracle scale); identical integers by construction.
ORACLES["doc_perplexity_buckets"] = f"""
    WITH ppl AS MATERIALIZED ({{PPL}}),
    scored AS (
      SELECT p.doc_id, p.perplexity, d.lang
      FROM ppl p JOIN documents d USING (doc_id)
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY lang
                                ORDER BY perplexity, doc_id) AS rk,
             count(1) OVER (PARTITION BY lang) AS n
      FROM scored
    ),
    b AS (
      SELECT lang, perplexity,
             ['head','middle','tail'][
               CAST(floor({PPL_BUCKETS} * (rk - 1) / n) AS INT) + 1
             ] AS bucket
      FROM r
    )
    SELECT lang, bucket, count(1) AS n_docs,
           min(perplexity) AS min_ppl,
           CAST(SUM(CAST(perplexity AS DECIMAL(18,6))) AS DOUBLE)
             / count(1) AS mean_ppl,
           max(perplexity) AS max_ppl
    FROM b GROUP BY 1, 2
"""
ORACLES["doc_perplexity_buckets"] = ORACLES["doc_perplexity_buckets"].replace(
    "{PPL}", ORACLES["doc_lm_perplexity"]
)

ORACLES["lang_id_confusion"] = f"""
    WITH preds AS MATERIALIZED ({ORACLES["lang_id"]}),
    cm AS (SELECT lang, lang_pred, count(1) AS n FROM preds GROUP BY 1, 2),
    per_label AS (
      SELECT lang, CAST(count(1) AS BIGINT) AS n_label FROM preds GROUP BY 1
    )
    SELECT c.lang, c.lang_pred, c.n,
           CAST(c.n AS DOUBLE) / CAST(l.n_label AS DOUBLE) AS label_share
    FROM cm c JOIN per_label l USING (lang)
"""

ORACLES["bpe_first_merges"] = f"""
    WITH wf AS (
      SELECT w, count(1) AS wf
      FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents)
      GROUP BY 1
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                    i -> substr(w, CAST(i AS INT), 2))) AS pair, wf
      FROM wf WHERE length(w) >= 2
    )
    SELECT pair, CAST(SUM(wf) AS BIGINT) AS n
    FROM pairs GROUP BY 1
    ORDER BY n DESC, pair ASC LIMIT {BPE_TOP_MERGES}
"""

ORACLES["doc_source_distinctive_terms"] = f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    st AS (SELECT source, term, count(1) AS c_st FROM tok GROUP BY 1, 2),
    s_tot AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
    t_tot AS (SELECT term, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
    tot AS (SELECT CAST(sum(c_st) AS BIGINT) AS n_corpus FROM st),
    scored AS (
      SELECT st.source, st.term, st.c_st,
             (CAST(st.c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
               / (CAST(c_t AS DOUBLE) / CAST(n_corpus AS DOUBLE)) AS lift
      FROM st JOIN s_tot USING (source) JOIN t_tot USING (term) CROSS JOIN tot
      WHERE st.c_st >= {DISTINCTIVE_MIN_COUNT}
    )
    SELECT source, term, c_st, lift, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                  ORDER BY lift DESC, term) AS rank
      FROM scored)
    WHERE rank <= {DISTINCTIVE_TOPK}
"""

# Mirror of doc_bigram_perplexity: same bigram explode, same model
# relations, same fixed-point BIGINT log2 reduction, ppl snapped to 6 dp.
ORACLES["doc_bigram_perplexity"] = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
    ),
    pr AS MATERIALIZED (
      SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, len(tk)),
                          i -> tk[i] || ' ' || tk[i+1])) AS bg
            FROM toks)
    ),
    x AS MATERIALIZED (
      SELECT doc_id, w1, bg, count(1) AS x FROM pr GROUP BY 1, 2, 3),
    cb AS MATERIALIZED (
      SELECT w1, bg, CAST(sum(x) AS BIGINT) AS cb FROM x GROUP BY 1, 2),
    cp AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cp FROM cb GROUP BY 1),
    v AS (SELECT count(DISTINCT tok) AS v
          FROM (SELECT unnest(tk) AS tok FROM toks)),
    per AS (
      SELECT x.doc_id,
             CAST(sum(x.x) AS BIGINT) AS n_bigrams,
             CAST(sum(CAST(floor(
                 CAST(x.x AS DOUBLE)
                 * (round(log2(CAST(cb.cb + 1 AS DOUBLE)), 9)
                    - round(log2(CAST(cp.cp + v.v AS DOUBLE)), 9))
                 * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS _sb
      FROM x
      JOIN cb ON x.w1 = cb.w1 AND x.bg = cb.bg
      JOIN cp ON x.w1 = cp.w1
      CROSS JOIN v
      GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(p.n_bigrams, 0) AS n_bigrams,
           COALESCE(CAST(-p._sb AS DOUBLE) / 1000000000.0
                      / CAST(p.n_bigrams AS DOUBLE), 0.0)
             AS cross_entropy_bits,
           COALESCE(round(pow(2.0, CAST(-p._sb AS DOUBLE) / 1000000000.0
                      / CAST(p.n_bigrams AS DOUBLE)), 6), 1.0)
             AS perplexity
    FROM documents d
    LEFT JOIN per p ON d.doc_id = p.doc_id
"""

# Mirror of doc_sparse_cosine_topk: same DF-capped index, 9 dp idf
# grid, fixed-point dot/norm reductions, row_number tie-broken by
# neighbor id.
ORACLES["doc_sparse_cosine_topk"] = f"""
    WITH tok AS (
      SELECT doc_id, unnest({{toks}}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(1) AS tf FROM tok GROUP BY 1, 2),
    nd AS (SELECT count(1) AS n_docs FROM documents),
    dfreq AS (
      SELECT term, count(1) AS df FROM tf CROSS JOIN nd GROUP BY 1, nd.n_docs
      HAVING count(1) * {SPARSE_DF_DEN} <= nd.n_docs
         AND count(1) <= {SPARSE_DF_ABS}
    ),
    w AS (
      SELECT tf.doc_id, tf.term, dfreq.df,
             CAST(tf.tf AS DOUBLE)
               * round(ln(CAST(nd.n_docs AS DOUBLE)
                          / CAST(dfreq.df AS DOUBLE)), 9) AS w
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    ),
    norms AS (
      SELECT doc_id,
             sqrt(CAST(CAST(sum(CAST(floor(w * w * 1000000000.0 + 0.5)
                  AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000000.0) AS norm
      FROM w GROUP BY 1
    ),
    dots AS (
      SELECT a.doc_id AS doc_id, b.doc_id AS neighbor_id,
             CAST(sum(CAST(floor(a.w * b.w * 1000000000.0 + 0.5)
                  AS BIGINT)) AS BIGINT) AS dot_fp
      FROM (SELECT * FROM w WHERE df >= 2) a
      JOIN (SELECT * FROM w WHERE df >= 2) b
        ON a.term = b.term AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.doc_id, d.neighbor_id,
             (CAST(d.dot_fp AS DOUBLE) / 1000000000.0)
               / (na.norm * nb.norm) AS cosine
      FROM dots d
      JOIN norms na ON na.doc_id = d.doc_id
      JOIN norms nb ON nb.doc_id = d.neighbor_id
    )
    SELECT doc_id, neighbor_id, cosine, rank FROM (
      SELECT doc_id, neighbor_id, cosine,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      FROM scored
    ) WHERE rank <= {SPARSE_TOPK}
""".replace("{toks}", _TOKS_SQL)

# Mirror of doc_kneser_ney_perplexity: same four count relations, the
# same left-to-right IEEE expression for p (both engines parse
# a/b + D*c/b*d/e identically), log2 on the 9 dp grid, fixed-point
# BIGINT reduction.
ORACLES["doc_kneser_ney_perplexity"] = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
    ),
    pr AS MATERIALIZED (
      SELECT doc_id, w1, tk[i + 1] AS w2
      FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i,
                   unnest(tk[1:len(tk) - 1]) AS w1
            FROM toks)
    ),
    x AS MATERIALIZED (
      SELECT doc_id, w1, w2, count(1) AS x FROM pr GROUP BY 1, 2, 3),
    cb AS MATERIALIZED (
      SELECT w1, w2, CAST(sum(x) AS BIGINT) AS cb FROM x GROUP BY 1, 2),
    cp AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cp, count(1) AS n1p
           FROM cb GROUP BY 1),
    n1c AS (SELECT w2, count(1) AS n1c FROM cb GROUP BY 1),
    npp AS (SELECT count(1) AS npp FROM cb),
    per AS (
      SELECT x.doc_id,
             CAST(sum(x.x) AS BIGINT) AS n_bigrams,
             CAST(sum(CAST(floor(
                 CAST(x.x AS DOUBLE)
                 * round(log2(
                     (CAST(cb.cb AS DOUBLE) - {KN_DISCOUNT})
                       / CAST(cp.cp AS DOUBLE)
                     + {KN_DISCOUNT}
                       * CAST(cp.n1p AS DOUBLE) / CAST(cp.cp AS DOUBLE)
                       * CAST(n1c.n1c AS DOUBLE) / CAST(npp.npp AS DOUBLE)
                   ), 9)
                 * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS _sb
      FROM x
      JOIN cb ON x.w1 = cb.w1 AND x.w2 = cb.w2
      JOIN cp ON x.w1 = cp.w1
      JOIN n1c ON x.w2 = n1c.w2
      CROSS JOIN npp
      GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(p.n_bigrams, 0) AS n_bigrams,
           COALESCE(CAST(-p._sb AS DOUBLE) / 1000000000.0
                      / CAST(p.n_bigrams AS DOUBLE), 0.0)
             AS cross_entropy_bits,
           COALESCE(round(pow(2.0, CAST(-p._sb AS DOUBLE) / 1000000000.0
                      / CAST(p.n_bigrams AS DOUBLE)), 6), 1.0)
             AS perplexity
    FROM documents d
    LEFT JOIN per p ON d.doc_id = p.doc_id
"""

# Mirror of vocab_heaps_law_fit: same 10 quantile_cont checkpoints (the
# verified percentile pairing), exact-integer V/n per checkpoint, the
# zipf fit's HUGEINT normal equations with the VARCHAR round-trip.
ORACLES["vocab_heaps_law_fit"] = f"""
    WITH tc AS MATERIALIZED (
      SELECT doc_id, tok, count(1) AS x
      FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents)
      GROUP BY 1, 2
    ),
    cps AS (
      SELECT {", ".join(
          f"quantile_cont(doc_id, {i}/{HEAPS_CHECKPOINTS}.0) AS c{i}"
          for i in range(1, HEAPS_CHECKPOINTS + 1))}
      FROM documents
    ),
    cp AS (
      SELECT unnest(range(1, {HEAPS_CHECKPOINTS + 1})) AS ck,
             unnest([{", ".join(f"c{i}" for i in range(1, HEAPS_CHECKPOINTS + 1))}]) AS c
      FROM cps
    ),
    first AS (SELECT tok, min(doc_id) AS first_doc FROM tc GROUP BY 1),
    v AS (SELECT ck, count(1) AS v
          FROM first JOIN cp ON first_doc <= c GROUP BY 1),
    dl AS (SELECT doc_id, CAST(sum(x) AS BIGINT) AS n_toks
           FROM tc GROUP BY 1),
    n AS (SELECT ck, CAST(sum(n_toks) AS BIGINT) AS n
          FROM dl JOIN cp ON doc_id <= c GROUP BY 1),
    g AS (
      SELECT CAST(floor(round(log2(CAST(n AS DOUBLE)), 9) * 1e9 + 0.5)
                  AS BIGINT) AS x9,
             CAST(floor(round(log2(CAST(v AS DOUBLE)), 9) * 1e9 + 0.5)
                  AS BIGINT) AS y9
      FROM v JOIN n USING (ck)
    ),
    s AS (
      SELECT CAST(count(1) AS HUGEINT) AS n,
             CAST(sum(x9) AS HUGEINT) AS sx,
             CAST(sum(y9) AS HUGEINT) AS sy,
             sum(CAST(x9 AS HUGEINT) * y9) AS sxy,
             sum(CAST(x9 AS HUGEINT) * x9) AS sxx,
             sum(CAST(y9 AS HUGEINT) * y9) AS syy
      FROM g
    ),
    e AS (
      SELECT CAST(n AS INTEGER) AS n_points,
             CAST(CAST(n AS BIGINT) AS DOUBLE) AS nd,
             CAST(CAST(sx AS BIGINT) AS DOUBLE) AS sxd,
             CAST(CAST(sy AS BIGINT) AS DOUBLE) AS syd,
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS num,
             CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS den,
             CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS den2
      FROM s
    )
    SELECT n_points,
           CASE WHEN den <> 0 THEN num / den END AS heaps_beta,
           CASE WHEN den <> 0
                THEN (syd - (num / den) * sxd) / nd * 1e-9
           END AS intercept_log2,
           CASE WHEN den <> 0 AND den2 <> 0
                THEN (num * num) / (den * den2) END AS r2
    FROM e
"""

# Mirror of vocab_oov_rate: same top-OOV_BUDGET vocabulary (freq DESC,
# tok row_number), null-means-OOV left join, per-source integer sums.
ORACLES["vocab_oov_rate"] = f"""
    WITH tc AS MATERIALIZED (
      SELECT doc_id, source, tok, count(1) AS x
      FROM (SELECT doc_id, source, unnest({_TOKS_SQL}) AS tok
            FROM documents)
      GROUP BY 1, 2, 3
    ),
    tf AS (SELECT tok, CAST(sum(x) AS BIGINT) AS freq FROM tc GROUP BY 1),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY freq DESC, tok) AS r
        FROM tf
      ) WHERE r <= {OOV_BUDGET}
    )
    SELECT source,
           CAST(sum(x) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN x ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(sum(CASE WHEN v.tok IS NULL THEN x ELSE 0 END) AS DOUBLE)
             / CAST(sum(x) AS DOUBLE) AS oov_rate
    FROM tc LEFT JOIN vocab v ON tc.tok = v.tok
    GROUP BY 1
"""

# Mirror of corpus_bigram_novelty_decay: same 9 quantile_cont
# thresholds, threshold-count bucket arithmetic, exact MIN first-seen
# bucket, strictly-earlier repeat semantics.
ORACLES["corpus_bigram_novelty_decay"] = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
    ),
    bg AS MATERIALIZED (
      SELECT doc_id, w1, tk[i + 1] AS w2, count(1) AS x
      FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i,
                   unnest(tk[1:len(tk) - 1]) AS w1
            FROM toks)
      GROUP BY 1, 2, 3
    ),
    cps AS (
      SELECT {", ".join(
          f"quantile_cont(doc_id, {i}/{NOVELTY_BUCKETS}.0) AS c{i}"
          for i in range(1, NOVELTY_BUCKETS))}
      FROM documents
    ),
    db AS (
      SELECT doc_id,
             CAST({" + ".join(
                 f"(CASE WHEN doc_id > c{i} THEN 1 ELSE 0 END)"
                 for i in range(1, NOVELTY_BUCKETS))} AS INTEGER) AS bucket
      FROM documents, cps
    ),
    inst AS MATERIALIZED (
      SELECT bg.w1, bg.w2, db.bucket, bg.x
      FROM bg JOIN db USING (doc_id)
    ),
    firstb AS MATERIALIZED (
      SELECT w1, w2, min(bucket) AS first_bucket FROM inst GROUP BY 1, 2
    ),
    per AS (
      SELECT bucket,
             CAST(sum(x) AS BIGINT) AS n_instances,
             CAST(sum(CASE WHEN first_bucket < bucket THEN x ELSE 0 END)
                  AS BIGINT) AS n_repeat_instances
      FROM inst JOIN firstb USING (w1, w2)
      GROUP BY 1
    ),
    nt AS (
      SELECT first_bucket AS bucket, count(1) AS n_new_types
      FROM firstb GROUP BY 1
    )
    SELECT per.bucket, per.n_instances, per.n_repeat_instances,
           CAST(per.n_repeat_instances AS DOUBLE)
             / CAST(per.n_instances AS DOUBLE) AS repeat_share,
           CAST(COALESCE(nt.n_new_types, 0) AS BIGINT) AS n_new_types
    FROM per LEFT JOIN nt ON nt.bucket = per.bucket
"""

_BM25_IN = "(" + ", ".join(f"'{t_}'" for t_ in BM25_TERMS) + ")"

ORACLES["doc_bm25_search"] = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(1) AS dl FROM tok GROUP BY 1),
    stats AS (
      SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(1) AS DOUBLE) AS avgdl,
             count(1) AS n_docs
      FROM dl
    ),
    tf AS (
      SELECT doc_id, term, count(1) AS tf FROM tok
      WHERE term IN {_BM25_IN} GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(1) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT doc_id,
             CAST(floor(
               round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
                          + CAST(0.5 AS DOUBLE))
                        / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                        + CAST(1.0 AS DOUBLE)), 9)
               * ((CAST(tf AS DOUBLE) * CAST({_BM25_NUM!r} AS DOUBLE))
                  / (CAST(tf AS DOUBLE)
                     + (CAST({_BM25_K1_1MB!r} AS DOUBLE)
                        + (CAST({_BM25_K1B!r} AS DOUBLE)
                           * CAST(dl AS DOUBLE)) / avgdl)))
               * 1000000000.0 + 0.5) AS BIGINT) AS s_fp
      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
      CROSS JOIN stats
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(1) AS INT) AS n_terms_matched,
             CAST(sum(s_fp) AS DOUBLE) / 1000000000.0 AS bm25_score
      FROM scored GROUP BY 1
    )
    SELECT doc_id, n_terms_matched, bm25_score, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY bm25_score DESC, doc_id) AS rank
      FROM per_doc
    ) WHERE rank <= {BM25_TOP}
"""

ORACLES["doc_length_winsorized"] = f"""
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    nn AS (SELECT source, count(1) AS n_docs FROM d GROUP BY 1),
    b AS (
      SELECT source, n_docs,
             floor(CAST({WINSOR_LO!r} AS DOUBLE)
                   * CAST(n_docs - 1 AS DOUBLE)) AS lo5,
             ceil(CAST({WINSOR_LO!r} AS DOUBLE)
                  * CAST(n_docs - 1 AS DOUBLE)) AS hi5,
             CAST({WINSOR_LO!r} AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE)
               - floor(CAST({WINSOR_LO!r} AS DOUBLE)
                       * CAST(n_docs - 1 AS DOUBLE)) AS frac5,
             floor(CAST({WINSOR_HI!r} AS DOUBLE)
                   * CAST(n_docs - 1 AS DOUBLE)) AS lo95,
             ceil(CAST({WINSOR_HI!r} AS DOUBLE)
                  * CAST(n_docs - 1 AS DOUBLE)) AS hi95,
             CAST({WINSOR_HI!r} AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE)
               - floor(CAST({WINSOR_HI!r} AS DOUBLE)
                       * CAST(n_docs - 1 AS DOUBLE)) AS frac95
      FROM nn
    ),
    ranked AS (
      SELECT d.*, b.n_docs, b.lo5, b.hi5, b.frac5, b.lo95, b.hi95, b.frac95,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY d.n_chars, d.doc_id) - 1 AS rk
      FROM d JOIN b USING (source)
    ),
    agg AS (
      SELECT source,
             min(n_docs) AS n_docs,
             min(frac5) AS f5, min(frac95) AS f95,
             CAST(max(CASE WHEN rk = lo5 THEN n_chars END) AS DOUBLE) AS v5l,
             CAST(max(CASE WHEN rk = hi5 THEN n_chars END) AS DOUBLE) AS v5h,
             CAST(max(CASE WHEN rk = lo95 THEN n_chars END) AS DOUBLE) AS v95l,
             CAST(max(CASE WHEN rk = hi95 THEN n_chars END) AS DOUBLE) AS v95h
      FROM ranked GROUP BY 1
    ),
    bounds AS (
      SELECT source, n_docs,
             v5l + (v5h - v5l) * f5 AS p05_chars,
             v95l + (v95h - v95l) * f95 AS p95_chars
      FROM agg
    )
    SELECT d.source,
           min(b.n_docs) AS n_docs,
           min(b.p05_chars) AS p05_chars,
           min(b.p95_chars) AS p95_chars,
           (CAST(sum(CAST(floor(
               greatest(b.p05_chars,
                        least(b.p95_chars, CAST(d.n_chars AS DOUBLE)))
               * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)
             / CAST(min(b.n_docs) AS DOUBLE) AS winsorized_mean_chars,
           CAST(sum(CASE WHEN CAST(d.n_chars AS DOUBLE) < b.p05_chars
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_low,
           CAST(sum(CASE WHEN CAST(d.n_chars AS DOUBLE) > b.p95_chars
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_high
    FROM d JOIN bounds b USING (source)
    GROUP BY 1
"""

ORACLES["doc_rrf_fusion"] = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(1) AS dl FROM tok GROUP BY 1),
    stats AS (
      SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(1) AS DOUBLE) AS avgdl,
             count(1) AS n_docs
      FROM dl
    ),
    tf AS (
      SELECT doc_id, term, count(1) AS tf FROM tok
      WHERE term IN {_BM25_IN} GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(1) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT doc_id,
             CAST(floor(
               round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
                          + CAST(0.5 AS DOUBLE))
                        / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                        + CAST(1.0 AS DOUBLE)), 9)
               * ((CAST(tf AS DOUBLE) * CAST({_BM25_NUM!r} AS DOUBLE))
                  / (CAST(tf AS DOUBLE)
                     + (CAST({_BM25_K1_1MB!r} AS DOUBLE)
                        + (CAST({_BM25_K1B!r} AS DOUBLE)
                           * CAST(dl AS DOUBLE)) / avgdl)))
               * 1000000000.0 + 0.5) AS BIGINT) AS bm_fp,
             CAST(floor(
               CAST(tf AS DOUBLE)
               * round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 9)
               * 1000000000.0 + 0.5) AS BIGINT) AS ti_fp
      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
      CROSS JOIN stats
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(bm_fp) AS DOUBLE) / 1000000000.0 AS bm25_score,
             CAST(sum(ti_fp) AS DOUBLE) / 1000000000.0 AS tfidf_score
      FROM scored GROUP BY 1
    ),
    bm AS (
      SELECT doc_id, r FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25_score DESC, doc_id) AS r
        FROM per_doc) WHERE r <= {RRF_POOL}
    ),
    ti AS (
      SELECT doc_id, r FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY tfidf_score DESC, doc_id) AS r
        FROM per_doc) WHERE r <= {RRF_POOL}
    ),
    fused AS (
      SELECT COALESCE(bm.doc_id, ti.doc_id) AS doc_id,
             CAST(COALESCE(bm.r, 0) AS INT) AS bm25_rank,
             CAST(COALESCE(ti.r, 0) AS INT) AS tfidf_rank,
             COALESCE(1.0 / CAST({RRF_K} + bm.r AS DOUBLE), 0.0)
               + COALESCE(1.0 / CAST({RRF_K} + ti.r AS DOUBLE), 0.0)
               AS rrf_score
      FROM bm FULL JOIN ti ON bm.doc_id = ti.doc_id
    )
    SELECT doc_id, bm25_rank, tfidf_rank, rrf_score, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
      FROM fused
    ) WHERE rank <= {RRF_TOP}
"""

# Mirror of doc_padding_waste: identical integer bucket arithmetic
# (m − m % B), BIGINT sums, one per-row double division.
ORACLES["doc_padding_waste"] = f"""
    WITH per AS (
      SELECT bucket_len,
             count(1) AS n_docs,
             CAST(sum(eff) AS BIGINT) AS real_tokens,
             CAST(sum(tr) AS BIGINT) AS truncated_tokens
      FROM (
        SELECT (m - m % {PAD_BUCKET}) AS bucket_len, eff, n - eff AS tr
        FROM (
          SELECT n, LEAST(n, {PAD_MAX_LEN}) AS eff,
                 GREATEST(LEAST(n, {PAD_MAX_LEN}), 1) + {PAD_BUCKET - 1} AS m
          FROM (SELECT CAST(len({_TOKS_SQL}) AS BIGINT) AS n FROM documents)
        )
      )
      GROUP BY 1
    )
    SELECT bucket_len, n_docs, real_tokens,
           n_docs * bucket_len AS padded_tokens,
           CAST(n_docs * bucket_len - real_tokens AS DOUBLE)
             / CAST(n_docs * bucket_len AS DOUBLE) AS pad_waste_ratio,
           truncated_tokens
    FROM per
"""

# Mirror of vocab_zipf_fit: HUGEINT-exact normal-equation sums over the
# same nano-int grid points, VARCHAR→double round-trip for the wide
# numerators (the _util wide-decimal caveat), identical final double
# expressions.
ORACLES["vocab_zipf_fit"] = f"""
    WITH tf AS (
      SELECT tok, count(1) AS freq
      FROM (SELECT unnest({_TOKS_SQL}) AS tok FROM documents)
      GROUP BY 1
    ),
    topv AS (
      SELECT tok, freq, rank FROM (
        SELECT tok, freq,
               row_number() OVER (ORDER BY freq DESC, tok) AS rank
        FROM tf
      ) WHERE rank <= {ZIPF_TOP_V}
    ),
    g AS (
      SELECT CAST(floor(round(log2(CAST(rank AS DOUBLE)), 9) * 1e9 + 0.5)
                  AS BIGINT) AS x9,
             CAST(floor(round(log2(CAST(freq AS DOUBLE)), 9) * 1e9 + 0.5)
                  AS BIGINT) AS y9
      FROM topv
    ),
    s AS (
      SELECT CAST(count(1) AS HUGEINT) AS n,
             CAST(sum(x9) AS HUGEINT) AS sx,
             CAST(sum(y9) AS HUGEINT) AS sy,
             sum(CAST(x9 AS HUGEINT) * y9) AS sxy,
             sum(CAST(x9 AS HUGEINT) * x9) AS sxx,
             sum(CAST(y9 AS HUGEINT) * y9) AS syy
      FROM g
    ),
    e AS (
      SELECT CAST(n AS INTEGER) AS n_terms,
             CAST(CAST(n AS BIGINT) AS DOUBLE) AS nd,
             CAST(CAST(sx AS BIGINT) AS DOUBLE) AS sxd,
             CAST(CAST(sy AS BIGINT) AS DOUBLE) AS syd,
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS num,
             CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS den,
             CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS den2
      FROM s
    )
    SELECT n_terms,
           num / den AS zipf_slope,
           (syd - (num / den) * sxd) / nd * 1e-9 AS intercept_log2,
           (num * num) / (den * den2) AS r2
    FROM e
"""
