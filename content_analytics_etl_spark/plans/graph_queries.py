"""Graph analytics over the near-dup pair graph (BASELINE extension —
the cluster-level view a curation pipeline builds on top of pairwise
similarity; connected components live in operators/graph.py, consumed by
``dedup_clusters``).

``graph_pagerank`` shows that even an ITERATIVE algorithm can be held to
the full hash-exact oracle standard when the iteration count is fixed:
three Lloyd-style PageRank rounds are unrolled into three relational
stages on the Spark side and three chained CTEs on the DuckDB side, with
every per-node contribution sum decimal-exact (plans/_util.py policy) so
both engines walk bit-identical rank vectors. Only UNBOUNDED iteration
(convergence loops) needs the weaker rows-only check.

Scale shape: each round is one equi-join (edges ⋈ ranks on src) + one
compact aggregation keyed by node — linear shuffles, no driver
materialization; the node-count scalar is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import DUCKDB_HASH64, portable_hash64
from ..operators.graph import common_neighbor_scores
from ..operators.prefix_sum import distributed_prefix_sum, ieee_bucket_asc
from ..cache import session_materialized
from ._util import materialize_and_release, source_fingerprint, t
from .dedup_queries import ORACLES as _DEDUP_ORACLES
from .dedup_queries import neardup_pair_graph

PR_DAMPING = 0.85
PR_BASE = 0.15  # literal, NOT computed as 1-0.85 (binary rounding differs)
PR_ITERS = 3
_DEC = "decimal(28,12)"


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank(d=0.85, 3 iterations) over the symmetrized MinHash-LSH
    near-dup graph: rank concentrates on documents with many near
    duplicates — the 'hub pages' a dedup pass should inspect first.
    The graph is symmetric so every node has out-degree ≥ 1 (no
    dangling-mass term needed)."""
    # r14 optimization: pairs come from the session-materialized pair
    # graph (written once per corpus snapshot — see neardup_pair_graph)
    # instead of re-deriving the MinHash pipeline per invocation. The
    # symmetrized edge list keeps its per-invocation persist: deg and
    # every unrolled iteration re-reference it, and the iteration
    # structure deliberately rebuilds ranks from `deg ⋈ summed` (ranks
    # referenced ONCE per round, inside contrib) — chaining ranks into
    # itself instead duplicates the rank subtree 2^ITERS times
    # (measured this round: 4.2 → 8.1 s before reverting that shape).
    pairs = neardup_pair_graph(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_tot = deg.agg(F.count(F.lit(1)).alias("n"))

    ranks = (
        deg.crossJoin(F.broadcast(n_tot))
        .select(
            F.col("src").alias("node"),
            "deg",
            (F.lit(1.0) / F.col("n")).alias("rank"),
        )
    )
    for _ in range(PR_ITERS):
        contrib = edges.join(
            ranks.select(F.col("node").alias("src"), "deg", "rank"), "src"
        ).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("deg")).alias("c"),
        )
        summed = contrib.groupBy("node").agg(
            F.sum(F.col("c").cast(_DEC)).cast("double").alias("s")
        )
        ranks = (
            deg.select(F.col("src").alias("node"), "deg")
            .join(summed, "node", "left")
            .crossJoin(F.broadcast(n_tot))
            .select(
                "node",
                "deg",
                (
                    F.lit(PR_BASE) / F.col("n")
                    + F.lit(PR_DAMPING) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return materialize_and_release(
        ranks.select("node", F.col("deg").alias("degree"), "rank"), edges
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count over the near-dup graph — the local
    clustering signal that separates tight duplicate cliques (every
    pair agrees) from hub-and-spoke false-positive clusters (a template
    page near-dups many unrelated pages but those pages don't near-dup
    each other). Curation uses it to decide keep-one vs inspect.

    Physical shape: the classic oriented-edge relational triangle
    enumeration — edges are kept in canonical (u < v) orientation so
    each triangle is generated exactly once as a < b < c: one self-join
    builds wedges (a-b-c), one more equi-join closes them against the
    edge set, then the three corners are exploded and counted. Two
    equi-join shuffles + one aggregation, all keyed — linear in edge
    count (the id orientation plays the role of the degree orientation
    in the classic algorithm; near-dup graphs have no mega-hubs by
    construction since verification prunes template collisions). The
    edge set is derived once and persisted (three join references)."""
    # r14: edge set from the session-materialized pair graph (three join
    # references read the cache; no per-invocation persist/release)
    edges = neardup_pair_graph(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    wedge = (
        edges.alias("x")
        .join(edges.alias("y"), F.col("x.v") == F.col("y.u"))
        .select(
            F.col("x.u").alias("a"), F.col("x.v").alias("b"), F.col("y.v").alias("c")
        )
    )
    tri = wedge.join(
        edges.alias("z"),
        (F.col("a") == F.col("z.u")) & (F.col("c") == F.col("z.v")),
    ).select("a", "b", "c")
    corners = tri.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the near-dup graph: for every NON-edge pair
    sharing ≥ 1 neighbor, the common-neighbor count and neighborhood
    Jaccard |Γa∩Γb| / |Γa∪Γb| — the classic 'these two documents
    near-dup the same things but were never paired' signal curation
    uses to find LSH misses and emerging template families.

    Physical shape: wedge enumeration (one self-equi-join of the
    symmetrized edge list on the shared middle vertex, a < b canonical),
    count per endpoint pair, LEFT-ANTI against the existing edge set,
    then two degree joins — all equi-joins, linear in Σdeg² (wedge
    count), which bounded-degree near-dup graphs keep near-linear in
    edges (``operators/graph.common_neighbor_scores``, whose non-empty
    behavior is fixture-tested in tests/test_graph.py).

    On THIS corpus the result is verified EMPTY at every sf — the LSH
    verify step leaves only clique components (duplicate groups whose
    every pair agrees), so all wedges close into triangles. That empty
    frame is the audit's finding: zero LSH misses at one hop."""
    # r14: pair graph from the session-materialized producer
    pairs = neardup_pair_graph(spark, sf_dir).select("doc_a", "doc_b")
    return common_neighbor_scores(pairs)


def graph_common_neighbors_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Companion to ``graph_common_neighbors`` over a seeded NON-CLIQUE
    graph (VERDICT r4 #4: the LSH graph is all cliques, so the main
    query is verified-empty at every sf and its oracle pass was
    vacuous). A deterministic third of the edges — (doc_a+doc_b) ≡ 0
    (mod 3) — is dropped before wedge enumeration, opening wedges inside
    every ≥3-clique: the dropped pair's endpoints still share the rest
    of the clique as common neighbors, so the driver hash compares REAL
    non-empty link-prediction rows (Jaccard arithmetic, anti-join,
    degree joins all exercised on data). Same linear wedge-join shape as
    the main query."""
    # r14: pair graph from the session-materialized producer
    pairs = (
        neardup_pair_graph(spark, sf_dir)
        .select("doc_a", "doc_b")
        .filter((F.col("doc_a") + F.col("doc_b")) % 3 != 0)
    )
    return common_neighbor_scores(pairs)


def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — cc = 2·tri / (deg·(deg−1))
    — over the part CO-PURCHASE graph (edges = part pairs sharing ≥ 1
    order, the ``part_affinity`` pair generation without its support
    floor). The near-dup graph is the wrong base here: its components
    are 2-3-node cliques, so cc would be identically 0/1 — the
    co-purchase graph has real triadic structure (is a part's
    neighborhood itself interconnected → a coherent basket theme, or a
    hub part bridging unrelated baskets). Every cc at sf0.001 lands
    strictly inside (0, 1), so the hash compares real fractions.

    Physical shape: pair generation is the order-key self-join with
    per-order-bounded fan-out (the part_affinity scale argument), the
    triangle count reuses the canonical a < b < c oriented enumeration
    (two equi-join shuffles), degree is one keyed agg over the
    symmetrized edges, and cc is exact-integer arithmetic until one
    final double division — linear in edges + wedges, node-keyed joins
    only."""
    op = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = op.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("u")
    )
    b = op.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("v")
    ).hint("merge")
    edges = (
        a.join(b, ["okey"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .persist()
    )
    sym = edges.select(F.col("u").alias("src")).unionAll(
        edges.select(F.col("v").alias("src"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    wedge = (
        edges.alias("x")
        .join(edges.alias("y"), F.col("x.v") == F.col("y.u"))
        .select(
            F.col("x.u").alias("a"), F.col("x.v").alias("b"), F.col("y.v").alias("c")
        )
    )
    tri = wedge.join(
        edges.alias("z"),
        (F.col("a") == F.col("z.u")) & (F.col("c") == F.col("z.v")),
    ).select("a", "b", "c")
    tricnt = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    cc = F.when(F.col("degree") < 2, F.lit(0.0)).otherwise(
        (2 * F.coalesce("n_triangles", F.lit(0))).cast("double")
        / (F.col("degree") * (F.col("degree") - 1)).cast("double")
    )
    return materialize_and_release(
        deg.select(F.col("src").alias("node"), "degree")
        .join(tricnt, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
            cc.alias("clustering_coeff"),
        ),
        edges,
    )


LPA_ITERS = 3
LPA_MIN_W = 2  # keep co-purchase edges with >= 2 shared orders


def _strong_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The strong co-purchase edge list (u < v, weight = shared orders,
    weight ≥ ``LPA_MIN_W``) — session-materialized ONCE per corpus
    snapshot (``cache.session_materialized``, keyed on the lineitem
    content fingerprint). Three registered queries consume this graph
    (weighted LPA, k-core decomposition, negative sampling); at 100 TB
    it is the incrementally-maintained graph TABLE a warehouse builds
    next to the fact, not a per-query derivation — the same posture as
    the curation manifest. Build cost is recorded in
    ``producer_build_seconds`` (bench.py) so a regression in the
    edge-build pipeline itself stays visible."""

    def build() -> DataFrame:
        op = (
            t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        a = op.select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("u")
        )
        b = op.select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("v")
        ).hint("merge")
        return (
            a.join(b, ["okey"])
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("w"))
            .filter(F.col("w") >= LPA_MIN_W)
        )

    fp = source_fingerprint(sf_dir, "lineitem")
    return session_materialized(spark, f"copurchase_edges:{fp}", build)


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by WEIGHTED synchronous label propagation
    (Raghavan et al. 2007), ``LPA_ITERS`` rounds unrolled, over the
    strong part co-purchase graph: edge weight = number of shared
    orders, edges below ``LPA_MIN_W`` dropped (the unweighted 1-shared-
    order graph is so dense that min-tie-break label flooding collapses
    it to one community — measured: 62 communities vs 514 at sf0.01).
    The near-dup graph is the wrong base entirely: all small cliques,
    where LPA degenerates to connected components (``dedup_clusters``).
    Deterministic variant: neighbor votes are weight sums, each node's
    OWN current label casts one extra vote (damps the 2-clique
    label-swap oscillation plain synchronous LPA suffers), ties broken
    by the smallest label. Output: node → community + community size.

    Scale shape: per round, one equi-join of the symmetrized weighted
    edge list against the label table (keyed shuffle, linear in edges)
    and two hash aggregations — the per-node winner is
    ``max(struct(cnt, -label, label))``, a map-side-combinable argmax,
    never a window over corpus-sized groups. Iteration count is a
    constant; the edge list comes from the session-materialized
    co-purchase graph producer; votes stay integer-exact throughout."""
    edges = _strong_copurchase_edges(spark, sf_dir)
    sym = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w")
        .unionAll(
            edges.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
        )
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(LPA_ITERS):
        nbr = sym.join(
            labels.select(F.col("node").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("node"), "label", "w")
        votes = (
            # self-vote (weight 1) damps sync oscillation
            nbr.unionByName(labels.withColumn("w", F.lit(1).cast("long")))
            .groupBy("node", "label")
            .agg(F.sum("w").alias("cnt"))
        )
        labels = votes.groupBy("node").agg(
            F.max(
                F.struct(
                    F.col("cnt"),
                    (-F.col("label")).alias("_neg"),
                    F.col("label").alias("label"),
                )
            ).alias("_m")
        ).select("node", F.col("_m.label").alias("label"))
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return materialize_and_release(
        labels.join(sizes, "label").select(
            "node", F.col("label").alias("community"), "n_members"
        ),
        sym,
    )


KCORE_K = 2
KCORE_PEELS = 6


def graph_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onion-layer k-core decomposition (k = ``KCORE_K``,
    ``KCORE_PEELS`` synchronous peel rounds unrolled) over the strong
    part co-purchase graph (the ``graph_label_propagation`` base: edge
    weight = shared orders, weight ≥ 2). Each round simultaneously
    removes every node whose CURRENT degree is below k; the round in
    which a node falls is its onion layer — the classic coreness
    signal ("is this part in a densely interlocked basket community,
    or hanging off one?"). Output: every node with ``peel_round``
    (1-based removal round, 0 = survives all rounds) and, for
    survivors, the degree inside the retained core. At sf0.001 / 0.01 /
    0.1 the fixed 6 rounds reach the fixpoint (measured: survivor
    counts stabilize at rounds 1 / 3 / 5); like PageRank/LPA the
    semantics is the fixed round count, so the oracle stays hash-exact
    even where it wouldn't converge.

    Scale shape: per round one degree aggregation + two semi-joins of
    the edge list against the kept-node set — all keyed shuffles,
    linear in surviving edges, and the edge set only shrinks.
    ``localCheckpoint`` truncates lineage each round (the operator
    references its own previous round three times, so an unchecked
    plan grows 3^rounds). No driver-side data, no windows. Edge list
    from the session-materialized co-purchase graph producer."""
    edges = _strong_copurchase_edges(spark, sf_dir).select("u", "v")
    # r15: the symmetrized edge list and the initial node set are LAZY —
    # both derive from the session-cached producer with narrow work, so
    # their former eager checkpoints (two jobs) bought nothing.  The
    # per-round checkpoint moved from the filtered NODE set to the DEG
    # table: previously ``fell`` stayed lazy and the terminal action
    # re-ran every round's degree aggregation + liveness join a second
    # time (6 extra shuffle chains in the one consuming job); with deg
    # checkpointed once per round, ``fell``/``nodes``/``kept`` are
    # narrow filters over the materialized table.  (r14 note stands:
    # lazy checkpoints (eager=False) measured WORSE — concurrent
    # downstream stages recompute not-yet-stored partitions, 5.6 →
    # 10.5 s — so the per-round materialization stays eager.)
    cur = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    # Explicit node set per round: a survivor whose LAST edges vanish
    # because its neighbors fell this round has degree 0 next round and
    # must be peeled then — deriving liveness from the edge relation
    # alone would silently drop such nodes from the output.
    nodes = cur.select(F.col("src").alias("node")).distinct()
    peeled = None
    for i in range(1, KCORE_PEELS + 1):
        edeg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("ed"))
        deg = (
            nodes.join(
                edeg.select(F.col("src").alias("node"), "ed"), "node", "left"
            )
            .select("node", F.coalesce("ed", F.lit(0)).alias("deg"))
            .localCheckpoint()
        )
        fell = deg.filter(F.col("deg") < KCORE_K).select(
            "node", F.lit(i).cast("int").alias("peel_round")
        )
        peeled = fell if peeled is None else peeled.unionAll(fell)
        nodes = deg.filter(F.col("deg") >= KCORE_K).select("node")
        kept = nodes.select(F.col("node").alias("src"))
        cur = (
            cur.join(kept, "src", "semi")
            .join(kept.select(F.col("src").alias("dst")), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint()
        )
    core_deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("ed"))
    survivors = nodes.join(
        core_deg.select(F.col("src").alias("node"), "ed"), "node", "left"
    ).select(
        "node",
        F.lit(0).cast("int").alias("peel_round"),
        F.coalesce("ed", F.lit(0).cast("long")).alias("core_degree"),
    )
    return survivors.unionByName(
        peeled.select(
            "node",
            "peel_round",
            F.lit(None).cast("long").alias("core_degree"),
        )
    )


NEG_PROPOSALS = 8  # hash proposals per node
NEG_KEEP = 3  # negatives kept per node
NEG_SEED = "negs-0"


def graph_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling over the strong co-purchase
    graph — the contrastive-pair generator every graph-embedding /
    link-prediction trainer needs: for each node, ``NEG_PROPOSALS``
    seeded hash proposals pick candidate partners uniformly from the
    node set (by proposal rank into a dense 0..N−1 node numbering);
    proposals that hit a REAL edge or the node itself are rejected
    (anti-join), and the first ``NEG_KEEP`` survivors by proposal index
    are kept. Hash-seeded like ``corpus_epoch_shuffle`` — a new seed
    resamples reproducibly, the same seed replays after failure.

    Scale shape: the dense numbering is the distributed prefix-sum
    rank (never a corpus window); proposals are a constant-fan-out
    explode; candidate resolution is one equi-join on rank; edge
    rejection is one anti-join on the (src, dst) key; the keep step is
    a window PARTITIONED BY node over ≤ NEG_PROPOSALS rows. N rides in
    as a literal from the prefix-sum's O(#buckets) control plane. Edge
    list from the session-materialized co-purchase graph producer."""
    edges = _strong_copurchase_edges(spark, sf_dir).select("u", "v")
    sym = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "one", F.lit(1).cast("long")
    )
    numbered, n_nodes = distributed_prefix_sum(
        spark,
        nodes,
        pid=ieee_bucket_asc("node"),
        order=[F.col("node")],
        value_col="one",
        cum_col="__cum",
        rank_col="rn",
    )
    numbered = numbered.select("node", (F.col("rn") - 1).alias("rn"))
    props = numbered.select(
        "node",
        F.explode(
            F.array(*[F.lit(j) for j in range(NEG_PROPOSALS)])
        ).alias("proposal_idx"),
    ).withColumn(
        "target_rn",
        F.pmod(
            portable_hash64(
                F.concat_ws(
                    "|",
                    F.col("node").cast("string"),
                    F.col("proposal_idx").cast("string"),
                ),
                seed=NEG_SEED,
            ),
            F.lit(int(n_nodes)),
        ),
    )
    cand = props.join(
        numbered.select(
            F.col("rn").alias("target_rn"), F.col("node").alias("neg_id")
        ),
        "target_rn",
    ).filter(F.col("neg_id") != F.col("node"))
    survivors = cand.join(
        sym.select(F.col("src").alias("node"), F.col("dst").alias("neg_id")),
        ["node", "neg_id"],
        "anti",
    )
    # two proposals can hash to the same partner — a repeated negative
    # is training waste, so collapse to the earliest proposal. r15
    # (guide §2.4): the (node, neg_id) dedup aggregate and the per-node
    # keep window were TWO exchanges on different keys; one
    # groupBy(node) + array fold over the ≤ NEG_PROPOSALS survivor
    # structs computes the same rows — sort by proposal_idx (unique per
    # node: each proposal resolves to one partner), keep the first
    # occurrence per partner (= min proposal_idx), slice NEG_KEEP,
    # number in order (= the old row_number over proposal_idx).
    grouped = survivors.groupBy("node").agg(
        F.array_sort(
            F.collect_list(F.struct("proposal_idx", "neg_id"))
        ).alias("s")
    )
    first_seen = F.filter(
        F.col("s"),
        lambda x, i: ~F.exists(
            F.slice(F.col("s"), 1, i), lambda a: a["neg_id"] == x["neg_id"]
        ),
    )
    return (
        grouped.select("node", F.slice(first_seen, 1, NEG_KEEP).alias("kept"))
        .select("node", F.posexplode("kept").alias("i", "k"))
        .select(
            "node",
            F.col("k.neg_id").alias("neg_id"),
            F.col("k.proposal_idx").alias("proposal_idx"),
            (F.col("i") + 1).cast("int").alias("keep_rank"),
        )
    )


QUERIES = {
    "graph_pagerank": graph_pagerank,
    "graph_triangles": graph_triangles,
    "graph_clustering_coefficient": graph_clustering_coefficient,
    "graph_common_neighbors": graph_common_neighbors,
    "graph_common_neighbors_pruned": graph_common_neighbors_pruned,
    "graph_label_propagation": graph_label_propagation,
    "graph_kcore_decomposition": graph_kcore_decomposition,
    "graph_negative_samples": graph_negative_samples,
}

# Three unrolled PageRank rounds; contribution sums decimal-exact, the
# same casts as the Spark side, so rank vectors match bit-for-bit.
_PR_STEP = """
        pr{i} AS MATERIALIZED (
          SELECT g.node, g.deg,
                 CAST({base} AS DOUBLE) / (SELECT n FROM nn)
                   + CAST({damping} AS DOUBLE)
                     * coalesce(s.s, CAST(0.0 AS DOUBLE)) AS rank
          FROM deg g LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(SUM(CAST(p.rank / p.deg AS DECIMAL(28,12))) AS DOUBLE) AS s
            FROM edges e JOIN pr{prev} p ON p.node = e.src
            GROUP BY 1
          ) s USING (node)
        )"""

ORACLES = {
    "graph_pagerank": (
        f"""
        WITH RECURSIVE pairs AS MATERIALIZED ({_DEDUP_ORACLES["dedup_minhash_lsh"]}),
        edges AS MATERIALIZED (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        deg0 AS MATERIALIZED (
          SELECT src AS node, count(1) AS deg FROM edges GROUP BY 1
        ),
        deg AS (SELECT node, deg FROM deg0),
        nn AS (SELECT count(1) AS n FROM deg0),
        pr0 AS MATERIALIZED (
          SELECT node, deg, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
          FROM deg0
        ),"""
        + ",".join(
            _PR_STEP.format(i=i, prev=i - 1, base=PR_BASE, damping=PR_DAMPING)
            for i in range(1, PR_ITERS + 1)
        )
        + f"""
        SELECT node, CAST(deg AS BIGINT) AS degree, rank FROM pr{PR_ITERS}
    """
    ),
    # Same canonical a<b<c enumeration as the Spark plan: wedge join on
    # the shared middle vertex, closure join against the edge set, corner
    # explosion via UNION ALL.
    "graph_triangles": f"""
        WITH RECURSIVE pairs AS MATERIALIZED ({_DEDUP_ORACLES["dedup_minhash_lsh"]}),
        edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs),
        tri AS MATERIALIZED (
          SELECT x.u AS a, x.v AS b, y.v AS c
          FROM edges x
          JOIN edges y ON x.v = y.u
          JOIN edges z ON z.u = x.u AND z.v = y.v
        ),
        corners AS (
          SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri
        )
        SELECT node, count(1) AS n_triangles FROM corners GROUP BY node
    """,
}

# Mirror of graph_common_neighbors: same symmetrized edges, wedge
# count with a < b, ANTI JOIN against the canonical pair list, degree
# joins, integer-exact Jaccard denominator.
# Pruned companion: identical wedge/anti-join/degree SQL, but over the
# seeded non-clique edge set ((doc_a+doc_b) % 3 <> 0) so rows > 0.
ORACLES["graph_common_neighbors_pruned"] = f"""
    WITH RECURSIVE pairs0 AS MATERIALIZED ({_DEDUP_ORACLES["dedup_minhash_lsh"]}),
    pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM pairs0 WHERE (doc_a + doc_b) % 3 <> 0
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS (SELECT src, count(1) AS deg FROM edges GROUP BY 1),
    cn AS (
      SELECT x.src AS node_a, y.dst AS node_b, count(1) AS common_neighbors
      FROM edges x JOIN edges y ON x.dst = y.src
      WHERE x.src < y.dst
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT cn.* FROM cn
      ANTI JOIN pairs p ON cn.node_a = p.doc_a AND cn.node_b = p.doc_b
    )
    SELECT node_a, node_b, common_neighbors,
           da.deg AS deg_a, db.deg AS deg_b,
           CAST(common_neighbors AS DOUBLE)
             / CAST(da.deg + db.deg - common_neighbors AS DOUBLE) AS jaccard
    FROM cand
    JOIN deg da ON cand.node_a = da.src
    JOIN deg db ON cand.node_b = db.src
"""

ORACLES["graph_common_neighbors"] = f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_DEDUP_ORACLES["dedup_minhash_lsh"]}),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS (SELECT src, count(1) AS deg FROM edges GROUP BY 1),
    cn AS (
      SELECT x.src AS node_a, y.dst AS node_b, count(1) AS common_neighbors
      FROM edges x JOIN edges y ON x.dst = y.src
      WHERE x.src < y.dst
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT cn.* FROM cn
      ANTI JOIN pairs p ON cn.node_a = p.doc_a AND cn.node_b = p.doc_b
    )
    SELECT node_a, node_b, common_neighbors,
           da.deg AS deg_a, db.deg AS deg_b,
           CAST(common_neighbors AS DOUBLE)
             / CAST(da.deg + db.deg - common_neighbors AS DOUBLE) AS jaccard
    FROM cand
    JOIN deg da ON cand.node_a = da.src
    JOIN deg db ON cand.node_b = db.src
"""

# Mirror of graph_clustering_coefficient: same co-purchase edge set,
# same oriented triangle enumeration, integer-exact cc fields.
ORACLES["graph_clustering_coefficient"] = """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM op a JOIN op b USING (l_orderkey)
      WHERE a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT src, count(1) AS degree FROM (
        SELECT u AS src FROM edges UNION ALL SELECT v FROM edges
      ) GROUP BY 1
    ),
    tri AS MATERIALIZED (
      SELECT x.u AS a, x.v AS b, y.v AS c
      FROM edges x
      JOIN edges y ON x.v = y.u
      JOIN edges z ON z.u = x.u AND z.v = y.v
    ),
    tricnt AS (
      SELECT node, count(1) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY 1
    )
    SELECT d.src AS node, d.degree,
           COALESCE(t.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree < 2 THEN 0.0
                ELSE CAST(2 * COALESCE(t.n_triangles, 0) AS DOUBLE)
                     / CAST(d.degree * (d.degree - 1) AS DOUBLE)
           END AS clustering_coeff
    FROM deg d LEFT JOIN tricnt t ON t.node = d.src
"""


def _lpa_step(i: int) -> str:
    """One weighted synchronous LPA round: weight-summed neighbor votes
    + the weight-1 self-vote, per-node winner by (cnt DESC, label ASC)
    — the row_number mirror of the Spark side's
    max(struct(cnt, -label, label)) hash argmax."""
    return f"""
    l{i} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label) AS rk
        FROM (
          SELECT node, label, CAST(sum(w) AS BIGINT) AS cnt FROM (
            SELECT e.src AS node, l.label, e.w
            FROM sym e JOIN l{i - 1} l ON e.dst = l.node
            UNION ALL
            SELECT node, label, 1 AS w FROM l{i - 1}
          ) GROUP BY 1, 2
        )
      ) WHERE rk = 1
    )"""


def _kcore_step(i: int) -> str:
    """One synchronous peel: degree = live-node set LEFT-joined against
    the surviving-edge counts (a live node with no edges left has
    degree 0 and falls THIS round — the mirror of the Spark side's
    explicit node relation), nodes below K fall with their round,
    edges keep only rows whose BOTH endpoints survived."""
    return f"""
    d{i} AS MATERIALIZED (
      SELECT n.node, coalesce(e.ed, 0) AS deg
      FROM n{i - 1} n LEFT JOIN (
        SELECT src, count(1) AS ed FROM k{i - 1} GROUP BY 1
      ) e ON e.src = n.node
    ),
    r{i} AS (
      SELECT node, {i} AS peel_round FROM d{i} WHERE deg < {KCORE_K}
    ),
    n{i} AS MATERIALIZED (
      SELECT node FROM d{i} WHERE deg >= {KCORE_K}
    ),
    k{i} AS MATERIALIZED (
      SELECT e.src, e.dst FROM k{i - 1} e
      WHERE e.src IN (SELECT node FROM n{i})
        AND e.dst IN (SELECT node FROM n{i})
    )"""


ORACLES["graph_kcore_decomposition"] = (
    f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM op a JOIN op b USING (l_orderkey)
      WHERE a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(1) >= {LPA_MIN_W}
    ),
    k0 AS MATERIALIZED (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL
      SELECT v AS src, u AS dst FROM edges
    ),
    n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM k0),"""
    + ",".join(_kcore_step(i) for i in range(1, KCORE_PEELS + 1))
    + f"""
    SELECT n.node, CAST(0 AS INTEGER) AS peel_round,
           coalesce(e.ed, 0) AS core_degree
    FROM n{KCORE_PEELS} n LEFT JOIN (
      SELECT src, count(1) AS ed FROM k{KCORE_PEELS} GROUP BY 1
    ) e ON e.src = n.node
    UNION ALL
    SELECT node, CAST(peel_round AS INTEGER) AS peel_round,
           CAST(NULL AS BIGINT) AS core_degree
    FROM ({" UNION ALL ".join(f"SELECT * FROM r{i}" for i in range(1, KCORE_PEELS + 1))})
"""
)

_NEG_H = DUCKDB_HASH64.format(
    expr=f"'{NEG_SEED}|' || CAST(node AS VARCHAR) || '|' || CAST(j AS VARCHAR)"
)
ORACLES["graph_negative_samples"] = f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM op a JOIN op b USING (l_orderkey)
      WHERE a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(1) >= {LPA_MIN_W}
    ),
    sym AS MATERIALIZED (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL
      SELECT v AS src, u AS dst FROM edges
    ),
    numbered AS MATERIALIZED (
      SELECT node, row_number() OVER (ORDER BY node) - 1 AS rn
      FROM (SELECT DISTINCT src AS node FROM sym)
    ),
    nn AS (SELECT count(1) AS n FROM numbered),
    props AS (
      SELECT node, CAST(j AS INT) AS proposal_idx,
             {_NEG_H} % (SELECT n FROM nn) AS target_rn
      FROM numbered CROSS JOIN generate_series(0, {NEG_PROPOSALS - 1}) AS g(j)
    ),
    cand AS (
      SELECT p.node, m.node AS neg_id, p.proposal_idx
      FROM props p JOIN numbered m ON m.rn = p.target_rn
      WHERE m.node <> p.node
    ),
    surv AS (
      SELECT c.* FROM cand c
      ANTI JOIN sym e ON e.src = c.node AND e.dst = c.neg_id
    ),
    dedup AS (
      SELECT node, neg_id, CAST(min(proposal_idx) AS INT) AS proposal_idx
      FROM surv GROUP BY 1, 2
    )
    SELECT node, neg_id, proposal_idx, keep_rank FROM (
      SELECT node, neg_id, proposal_idx,
             CAST(row_number() OVER (PARTITION BY node
               ORDER BY proposal_idx) AS INT) AS keep_rank
      FROM dedup
    ) WHERE keep_rank <= {NEG_KEEP}
"""

ORACLES["graph_label_propagation"] = (
    f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v, count(1) AS w
      FROM op a JOIN op b USING (l_orderkey)
      WHERE a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(1) >= {LPA_MIN_W}
    ),
    sym AS MATERIALIZED (
      SELECT u AS src, v AS dst, w FROM edges
      UNION ALL
      SELECT v AS src, u AS dst, w FROM edges
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),"""
    + ",".join(_lpa_step(i) for i in range(1, LPA_ITERS + 1))
    + f"""
    , sizes AS (
      SELECT label, count(1) AS n_members FROM l{LPA_ITERS} GROUP BY 1
    )
    SELECT l.node, l.label AS community, s.n_members
    FROM l{LPA_ITERS} l JOIN sizes s USING (label)
"""
)
