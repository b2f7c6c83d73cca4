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
