"""connected_components semantics: chains collapse to one component,
disjoint components stay apart, canonical label = min node id."""

from __future__ import annotations

from content_analytics_etl_spark.operators.graph import connected_components


def test_connected_components_chain_and_islands(spark):
    # component {1,2,3,4} as a chain (diameter > 1 forces iteration),
    # component {10, 11}, and 20-20 self-loop
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 20)], ["a", "b"]
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges, "a", "b").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_common_neighbor_scores_path_and_clique(spark):
    """Path a-b-c yields the non-edge (a,c) with cn=1 and Jaccard 1/3
    (deg 1 + 1 - 1); a 3-clique yields NOTHING (every wedge closes);
    a 4-star yields all C(3,2) leaf pairs with Jaccard 1 (their whole
    1-neighborhood is the shared hub)."""
    pairs = spark.createDataFrame(
        # path 1-2-3 | clique 10-11-12 | star hub 20, leaves 21,22,23
        [(1, 2), (2, 3), (10, 11), (10, 12), (11, 12),
         (20, 21), (20, 22), (20, 23)],
        ["doc_a", "doc_b"],
    )
    from content_analytics_etl_spark.operators.graph import (
        common_neighbor_scores,
    )

    got = {
        (r["node_a"], r["node_b"]): (
            r["common_neighbors"], r["deg_a"], r["deg_b"], r["jaccard"]
        )
        for r in common_neighbor_scores(pairs).collect()
    }
    assert got == {
        (1, 3): (1, 1, 1, 1.0),
        (21, 22): (1, 1, 1, 1.0),
        (21, 23): (1, 1, 1, 1.0),
        (22, 23): (1, 1, 1, 1.0),
    }


def test_graph_common_neighbors_empty_on_clique_corpus(spark):
    """On the real corpus every LSH component is a clique, so the audit
    query must return the empty frame (the zero-LSH-miss finding)."""
    from content_analytics_etl_spark.plans.graph_queries import (
        graph_common_neighbors,
    )

    assert graph_common_neighbors(spark, "/root/testdata/sf0.001").count() == 0


def test_graph_common_neighbors_pruned_is_nonvacuous(spark):
    """ADVICE r5: the pruned companion exists precisely so the driver
    hash compares non-empty link-prediction rows — pin a row-count
    floor so a prune-rule tweak can never silently regress it back to
    the vacuous empty frame. (Mod-2 pruning, the obvious 'more
    aggressive' variant, drops so many edges that every wedge dies —
    measured 0 rows at sf0.001 and sf0.01 — so mod-3 is load-bearing.)"""
    from content_analytics_etl_spark.plans.graph_queries import (
        graph_common_neighbors_pruned,
    )

    assert graph_common_neighbors_pruned(spark, "/root/testdata/sf0.001").count() >= 4


def test_clustering_coefficient_nontrivial_and_consistent(spark, sf_dir):
    """cc must match a python recompute over the co-purchase edge set
    AND be non-vacuous: at least one node strictly between 0 and 1."""
    from collections import defaultdict

    import duckdb

    from content_analytics_etl_spark.plans.graph_queries import (
        graph_clustering_coefficient,
    )

    pairs = duckdb.sql(
        f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM '{sf_dir}/lineitem.parquet')
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM op a JOIN op b USING (l_orderkey)
        WHERE a.l_partkey < b.l_partkey
        """
    ).fetchall()
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for n, nbrs in adj.items():
        deg = len(nbrs)
        tri = sum(
            1
            for u in nbrs
            for v in nbrs
            if u < v and v in adj[u]
        )
        cc = 0.0 if deg < 2 else (2 * tri) / (deg * (deg - 1))
        want[n] = (deg, tri, cc)
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_coeff"])
        for r in graph_clustering_coefficient(spark, sf_dir).collect()
    }
    assert got == want and got
    assert any(0.0 < v[2] < 1.0 for v in want.values()), (
        "all cc trivial — prune not opening cliques"
    )


def test_graph_kcore_peel_semantics_python_mirror(spark, sf_dir):
    """Synchronous-peel onion layers recomputed in pure python over the
    same weight-filtered co-purchase graph: per round, EVERY node with
    current degree < K falls simultaneously (a node whose degree only
    drops below K because of this round's removals falls NEXT round).
    Survivors carry their in-core degree."""
    import duckdb

    from content_analytics_etl_spark.plans.graph_queries import (
        KCORE_K,
        KCORE_PEELS,
        LPA_MIN_W,
        graph_kcore_decomposition,
    )

    edges = duckdb.sql(
        f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM '{sf_dir}/lineitem.parquet')
        SELECT a.l_partkey u, b.l_partkey v
        FROM op a JOIN op b USING (l_orderkey)
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(1) >= {LPA_MIN_W}
        """
    ).fetchall()
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    for rnd in range(1, KCORE_PEELS + 1):
        fell = {n for n, nbrs in adj.items() if len(nbrs) < KCORE_K}
        for n in fell:
            want[n] = (rnd, None)
        adj = {
            n: nbrs - fell for n, nbrs in adj.items() if n not in fell
        }
    for n, nbrs in adj.items():
        want[n] = (0, len(nbrs))
    got = {
        r["node"]: (r["peel_round"], r["core_degree"])
        for r in graph_kcore_decomposition(spark, sf_dir).collect()
    }
    assert got == want and got
    assert any(v[0] == 0 for v in want.values()), "no core survives"
