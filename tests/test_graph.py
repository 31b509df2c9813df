"""PageRank vs a pure-Python reference with the identical fixed-point
integer contract, plus the structural properties that make it
PageRank."""

from __future__ import annotations

from kafkaconnect_spark.operators.graph import pagerank


def _ref_pagerank(edge_list, n_rounds=10, d=0.85):
    """Pure-Python twin of the engine's fixed-point arithmetic:
    1e-6 rank units, 1e-7 contribution units, round-half-up via
    (2a+b)//(2b)."""
    p = round(d * 100)
    deg = {}
    for s, _t in edge_list:
        deg[s] = deg.get(s, 0) + 1
    nodes = {n for e in edge_list for n in e}
    r6 = {n: 10**6 for n in nodes}
    for _ in range(n_rounds):
        s7 = {n: 0 for n in nodes}
        for s, t in edge_list:
            s7[t] += (20 * r6[s] + deg[s]) // (2 * deg[s])
        r6 = {
            n: (100 - p) * 10**4 + (2 * p * s7[n] + 1000) // 2000
            for n in nodes
        }
    return {n: r / 1e6 for n, r in r6.items()}


def _spark_edges(spark, edge_list):
    return spark.createDataFrame(edge_list, "src LONG, dst LONG")


def test_pagerank_matches_reference_and_ordering(spark):
    # star + chain: hub 0 is pointed at by 1..5; chain 6->7->0
    edges = [(i, 0) for i in range(1, 6)] + [(6, 7), (7, 0)]
    # make it strongly-ish connected: 0 points back to 1
    edges.append((0, 1))
    got = {r.node: r.pagerank for r in pagerank(_spark_edges(spark, edges), n_rounds=6).collect()}
    want = _ref_pagerank(edges, n_rounds=6)
    assert got == want
    # the hub out-ranks every spoke (2..5); node 1 legitimately
    # exceeds it — the hub donates its entire rank to 1 each round
    assert all(got[0] > got[i] for i in range(2, 6))
    # a node with no in-edges bottoms out at 1 - d
    assert got[6] == 0.15


def test_pagerank_undirected_symmetry_and_checkpoint_mode(spark, tmp_path):
    # symmetric triangle: all nodes must have identical rank
    und = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]
    got = {r.node: r.pagerank for r in pagerank(_spark_edges(spark, und), n_rounds=4).collect()}
    assert len(set(got.values())) == 1
    # reliable-checkpoint mode produces identical output
    got_ck = {
        r.node: r.pagerank
        for r in pagerank(
            _spark_edges(spark, und), n_rounds=4, checkpoint_dir=str(tmp_path / "ck")
        ).collect()
    }
    assert got_ck == got


def test_copurchase_basket_cap_noop_on_tpch(spark):
    """The basket-size guard must not change edges on TPC-H shapes
    (max 7 lines/order), and a tight cap must actually drop baskets."""
    from kafkaconnect_spark.queries import parts_copurchase_edges

    sf = "/root/testdata/sf0.001"
    capped = parts_copurchase_edges(spark, sf).collect()
    uncapped = parts_copurchase_edges(spark, sf, max_basket=None).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))
    # a cap of 1 removes every multi-item basket -> no pairs at all
    assert parts_copurchase_edges(spark, sf, max_basket=1).count() == 0


def _brute_triangles(edge_list):
    adj: dict[int, set[int]] = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = set()
    for a, b in edge_list:
        for c in adj[a] & adj[b]:
            tris.add(frozenset((a, b, c)))
    return tris


def test_triangles_match_bruteforce(spark):
    """K4 + pendant + disjoint triangle + isolated edge, vs a pure-
    Python reference; each triangle emitted exactly once."""
    from kafkaconnect_spark.operators.graph import triangles

    el = (
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]  # K4
        + [(4, 9)]                                              # pendant
        + [(20, 21), (21, 22), (20, 22)]                        # triangle
        + [(30, 31)]                                            # lone edge
    )
    df = spark.createDataFrame(el, "u long, v long")
    got = [frozenset((r.x, r.y, r.z)) for r in triangles(df).collect()]
    assert len(got) == len(set(got)), "a triangle was emitted twice"
    assert set(got) == _brute_triangles(el)


def test_degree_orientation_bounds_wedges(spark):
    """Schank & Wagner's point, demonstrated: on a hub-and-spokes
    graph whose hub sits mid-id-range, id-ordered wedge enumeration
    routes O(deg_hub²) wedges through the hub while degree-ordered
    orientation gives the hub zero out-edges — wedge count collapses
    from quadratic-in-hub-degree to linear-in-edges."""
    from pyspark.sql import functions as F

    from kafkaconnect_spark.operators.graph import (
        orient_edges,
        oriented_wedges,
        triangles,
    )

    hub = 20
    leaves = [i for i in range(41) if i != hub]
    el = [(min(i, hub), max(i, hub)) for i in leaves]  # star, deg(hub)=40
    el += [(i, i + 1) for i in range(0, 10)]           # chain → 10 triangles
    df = spark.createDataFrame(el, "u long, v long")

    # id-ordered wedges (the pre-r5 shape): middle vertex y, x < y < z
    e1 = df.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = df.select(F.col("u").alias("y"), F.col("v").alias("z"))
    id_wedges = e1.join(e2, "y").count()
    deg_wedges = oriented_wedges(orient_edges(df)).count()
    # hub alone contributes 20*20 = 400 id-ordered wedges
    assert id_wedges >= 400
    assert deg_wedges * 4 < id_wedges
    # and the answer is unchanged
    assert {frozenset((r.x, r.y, r.z)) for r in triangles(df).collect()} == (
        _brute_triangles(el)
    )


def test_oriented_outdegree_bound(spark):
    """Every out-edge of a degree-oriented node points at an equal-or-
    higher-rank node, so rank order is a topological order of the
    orientation (acyclicity = each triangle counted at one apex)."""
    from kafkaconnect_spark.operators.graph import orient_edges

    el = [(a, b) for a in range(1, 8) for b in range(a + 1, 8)]  # K7
    oe = orient_edges(spark.createDataFrame(el, "u long, v long"))
    for r in oe.collect():
        assert (r.src_deg, r.src) < (r.dst_deg, r.dst)
