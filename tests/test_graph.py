"""Graph-analytics operators: co-purchase edges, degree-ordered
triangle counting, fixed-iteration PageRank.

Hand-checkable fixtures (complete graphs, stars, cycles) pin the
combinatorics; a pure-Python re-run of the identical PageRank
recurrence pins the numerics; the DuckDB oracles in contract.py pin
both against a second engine at sf0.01.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.operators.graph import (
    copurchase_edges,
    degree_profile,
    label_propagation,
    pagerank,
    trade_edges,
    triangle_stats,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src string, dst string, weight int"
    )


def test_copurchase_edges_counts_shared_orders(spark):
    li = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "b"), (2, "c"), (2, "c")],
        "l_orderkey int, l_partkey string",
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in copurchase_edges(li).collect()
    }
    # duplicate (2, c) lineitem must not double-count the (b, c) edge
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 2}


def test_triangle_stats_complete_graph(spark):
    # K4: C(4,3)=4 triangles, 6 edges, sum C(3,2)=12 wedges, transitivity 1
    nodes = ["a", "b", "c", "d"]
    k4 = [(u, v) for u in nodes for v in nodes if u < v]
    row = triangle_stats(_edges(spark, k4)).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 6
    assert row["n_triangles"] == 4
    assert row["n_wedges"] == 12
    assert row["transitivity"] == 1.0


def test_triangle_stats_star_plus_closing_edge(spark):
    # hub h with 4 spokes + one spoke-spoke edge: exactly 1 triangle.
    # The hub's high degree is the case degree-ordering protects: all
    # hub edges orient AWAY from the spokes into h, so no wedge pair
    # enumerates h's neighbour set quadratically.
    pairs = [("h", x) for x in ["a", "b", "c", "d"]] + [("a", "b")]
    row = triangle_stats(_edges(spark, pairs)).collect()[0]
    assert row["n_triangles"] == 1
    assert row["n_edges"] == 5
    # wedges: deg h=4 -> 6, a=2 -> 1, b=2 -> 1 = 8; transitivity 3/8
    assert row["n_wedges"] == 8
    assert row["transitivity"] == pytest.approx(0.375)


def test_triangle_stats_input_direction_and_dupes_ignored(spark):
    # same triangle given with mixed directions and a repeated edge
    pairs = [("b", "a"), ("b", "c"), ("a", "c"), ("c", "a")]
    row = triangle_stats(_edges(spark, pairs)).collect()[0]
    assert row["n_triangles"] == 1
    assert row["n_edges"] == 3


def test_degree_profile_regular_and_star(spark):
    import math

    # K4 is 3-regular: one histogram row, alpha = 1 + 1/ln(6)
    nodes = ["a", "b", "c", "d"]
    k4 = [(u, v) for u in nodes for v in nodes if u < v]
    rows = degree_profile(_edges(spark, k4)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["degree"], r["n_nodes"], r["node_share"]) == (3, 4, 1.0)
    assert r["alpha_hat"] == pytest.approx(1 + 1 / math.log(6), abs=1e-4)

    # 4-spoke star: hub degree 4 (share .2), spokes degree 1 (share .8)
    star = [("h", x) for x in ["a", "b", "c", "d"]]
    got = {
        r["degree"]: (r["n_nodes"], r["node_share"], r["alpha_hat"])
        for r in degree_profile(_edges(spark, star)).collect()
    }
    want_alpha = 1 + 5 / (math.log(8) + 4 * math.log(2))
    assert got[4][0] == 1 and got[4][1] == pytest.approx(0.2)
    assert got[1][0] == 4 and got[1][1] == pytest.approx(0.8)
    assert got[1][2] == pytest.approx(want_alpha, abs=1e-4)


def _pagerank_reference(edge_list, iters=5, d=0.85):
    """The identical recurrence in pure Python (dict arithmetic)."""
    outw: dict[str, float] = {}
    for s, t, w in edge_list:
        outw[s] = outw.get(s, 0.0) + w
    nodes = sorted({s for s, _, _ in edge_list} | {t for _, t, _ in edge_list})
    n = float(len(nodes))
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        inflow = {v: 0.0 for v in nodes}
        for s, t, w in edge_list:
            inflow[t] += rank[s] * (w / outw[s])
        rank = {v: (1.0 - d) / n + d * inflow[v] for v in nodes}
    return {v: rank[v] * n for v in nodes}


def test_pagerank_two_cycle_symmetric(spark):
    got = {
        r["node"]: r["rank_norm"]
        for r in pagerank(_edges(spark, [("a", "b"), ("b", "a")])).collect()
    }
    assert got == {"a": 1.0, "b": 1.0}


def test_pagerank_matches_pure_python_recurrence(spark):
    edge_list = [
        ("a", "b", 2.0),
        ("a", "c", 1.0),
        ("b", "c", 1.0),
        ("c", "a", 1.0),
        ("d", "a", 3.0),
        ("a", "d", 1.0),
    ]
    df = spark.createDataFrame(
        edge_list, "src string, dst string, weight double"
    )
    got = {r["node"]: r["rank_norm"] for r in pagerank(df).collect()}
    want = _pagerank_reference(edge_list)
    assert set(got) == set(want)
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=1e-4)


def test_pagerank_conserves_mass_without_dangling(spark):
    # symmetrized graph -> every node has out-edges -> sum(rank) == 1,
    # i.e. sum of normalized ranks == n
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    sym = pairs + [(b, a) for a, b in pairs]
    rows = pagerank(_edges(spark, sym)).collect()
    assert sum(r["rank_norm"] for r in rows) == pytest.approx(
        len(rows), abs=1e-2
    )


def test_label_propagation_finds_disjoint_communities(spark):
    tri = lambda a, b, c: [(a, b), (b, c), (a, c)]  # noqa: E731
    rows = label_propagation(
        _edges(spark, tri("a", "b", "c") + tri("d", "e", "f")), iters=5
    ).collect()
    got = {r["node"]: (r["label"], r["community_size"]) for r in rows}
    # each triangle collapses onto its smallest member by round 3
    assert got == {
        "a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
        "d": ("d", 3), "e": ("d", 3), "f": ("d", 3),
    }


def test_label_propagation_deterministic_under_partitioning(spark):
    import random

    rng = random.Random(7)
    pairs = list(
        {
            (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
            for _ in range(120)
        }
    )
    e = _edges(spark, pairs)
    r1 = sorted(
        (r["node"], r["label"])
        for r in label_propagation(e, iters=4).collect()
    )
    r2 = sorted(
        (r["node"], r["label"])
        for r in label_propagation(e.repartition(11), iters=4).collect()
    )
    assert r1 == r2


def test_trade_edges_symmetrized_and_prefixed(spark, sf_small):
    from uk_housing_dashboard_etl_spark.sources.readers import read_table

    o = read_table(spark, sf_small, "orders")
    li = read_table(spark, sf_small, "lineitem")
    e = trade_edges(o, li)
    fwd = e.where(F.col("src").startswith("c:")).count()
    rev = e.where(F.col("src").startswith("s:")).count()
    assert fwd == rev and fwd > 0
    # weights mirror exactly
    mism = (
        e.groupBy(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .agg(F.count_distinct("weight").alias("k"))
        .where(F.col("k") != 1)
        .count()
    )
    assert mism == 0


def test_graph_query_plans(spark):
    from tests.test_plans import plan_of

    plan = plan_of(spark, "copurchase_triangles")
    # row-local pair fan-out (Generate), never an item-table self-join
    # on the order key; the only joins are edge-grain
    assert "Generate" in plan
    assert "CartesianProduct" not in plan
    # the ship-year slice must reach the parquet scan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]
