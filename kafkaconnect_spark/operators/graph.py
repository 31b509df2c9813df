"""Graph analytics over edge lists — PageRank on the same keyed-join
substrate as the connected-components operators (operators/dedup.py).

PageRank (Page et al. 1999, public) is the canonical "iterative keyed
aggregation" workload: every iteration is contribution-explode along
edges → per-target reduce — two keyed shuffles, no driver-side graph.
The scale discipline mirrors duplicate_clusters: persist the
(static) degree-annotated edge list once, truncate the rank vector's
lineage each round (reliable ``checkpoint()`` when a directory is
given, ``localCheckpoint`` otherwise), and make every float reduce
decimal-exact so ranks are parallelism-independent.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkaconnect_spark.operators.dedup import _make_ckpt


def pagerank(
    edges: DataFrame,
    n_rounds: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank over a DIRECTED edge list (pass both directions for an
    undirected graph). Returns (node, pagerank) after ``n_rounds``
    power iterations from uniform rank 1.0, with the non-normalized
    per-node form pr = (1−d) + d·Σ pr(j)/deg(j).

    Engine-exact via FIXED-POINT INTEGER arithmetic: ranks live in
    1e-6 units (BIGINT ``__r6``), per-edge contributions
    round-half-up to 1e-7 units (``(20·r6 + deg) div (2·deg)``), and
    the damping update rounds back to 1e-6 — every step is integer,
    so results are bit-identical across engines, partitionings, and
    float-rounding conventions (a double ``round()`` here is NOT
    portable: Spark rounds the shortest decimal repr via BigDecimal
    HALF_UP while e.g. DuckDB rounds the binary value — the two
    disagree on knife-edge values). Damping is taken at integer
    percent resolution. Dangling nodes (no out-edges) keep rank
    (1−d). Unlike connected components — whose per-round plan
    references the previous labels MULTIPLE times (exponential plan
    growth without truncation) — each PageRank round references the
    previous rank vector exactly once, so lineage grows LINEARLY and
    a checkpoint every few rounds (not every round) bounds plan
    depth; skipping the per-round materialization lets consecutive
    rounds fuse into one job."""
    p = int(round(damping * 100))
    if abs(p / 100.0 - damping) > 1e-12:
        raise ValueError(f"damping must have integer-percent resolution: {damping}")
    ckpt = _make_ckpt(edges.sparkSession, checkpoint_dir)
    # the raw edge list feeds FOUR consumers (degree agg, the ed
    # join probe, and both arms of the node union) — without this
    # persist an expensive upstream plan (e.g. the co-purchase
    # self-join) re-executes once per consumer
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # static per-round join input: (src, dst, deg) — persist once
    ed = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    ed.count()

    # the node set joins into EVERY round — persist it once or each
    # round re-runs the union+distinct aggregation from the edge scan
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes.count()
    e.unpersist()  # ed and nodes are materialized — e is done
    base6 = (100 - p) * 10**4  # (1-d) in 1e-6 rank units
    ranks = nodes.select("node", F.lit(10**6).cast("long").alias("__r6"))
    for rnd in range(n_rounds):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                # round_half_up(10·r6 / deg): rank/deg in 1e-7 units
                F.expr("(20 * __r6 + __deg) div (2 * __deg)").alias("__c7"),
            )
            .groupBy("node")
            .agg(F.sum("__c7").alias("__s7"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            # base + round_half_up(p·s7 / 1000), all in 1e-6 units
            F.expr(
                f"cast({base6} + ({2 * p} * coalesce(__s7, 0) + 1000) "
                "div 2000 as bigint)"
            ).alias("__r6"),
        )
        # linear lineage: truncate every 5th round and after the last
        # round (the final ckpt also materializes ranks, making the
        # unpersists below safe — the returned frame has no lineage
        # back to the cached inputs)
        if (rnd + 1) % 5 == 0 or rnd == n_rounds - 1:
            ranks = ckpt(ranks)
    if n_rounds == 0:  # still materialize before the unpersists below
        ranks = ckpt(ranks)
    ed.unpersist()
    nodes.unpersist()  # ranks is checkpointed — no lineage back to nodes
    return ranks.select(
        "node", (F.col("__r6").cast("double") / F.lit(1000000.0)).alias("pagerank")
    )


def orient_edges(
    edges: DataFrame,
    u: str = "u",
    v: str = "v",
    degrees: DataFrame | None = None,
) -> DataFrame:
    """Degree-order each undirected edge {u, v}: emit it once as
    (src, dst) with rank(src) < rank(dst) under the total order
    rank(n) = (degree(n), n). This is Schank & Wagner 2005's
    node-iterator-core orientation: wedge enumeration over oriented
    out-edges is Σ outdeg(n)² with outdeg bounded by O(√m) on ANY
    graph (a node of degree d has out-edges only to neighbours of
    degree ≥ d, and there are at most 2m/d of those) — a hub of
    degree 100k contributes ZERO wedges as a middle vertex instead of
    10^10. Columns: src, dst, src_deg, dst_deg.

    Scale shape: one double keyed join of the edge list against the
    degree table (itself one groupBy of the edge endpoints) — no
    self-join, no window. ``degrees`` (node, degree) lets a caller
    that already built the degree table pass it in; when it is the
    same plan, Spark's ReuseExchange dedupes the shuffle."""
    deg = (
        degrees.select("node", F.col("degree").alias("__deg"))
        if degrees is not None
        else (
            edges.select(F.col(u).alias("node"))
            .unionAll(edges.select(F.col(v).alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("__deg"))
        )
    )
    e = (
        edges.select(F.col(u), F.col(v))
        .join(deg.select(F.col("node").alias(u), F.col("__deg").alias("__du")), u)
        .join(deg.select(F.col("node").alias(v), F.col("__deg").alias("__dv")), v)
    )
    u_first = (F.col("__du") < F.col("__dv")) | (
        (F.col("__du") == F.col("__dv")) & (F.col(u) < F.col(v))
    )
    return e.select(
        F.when(u_first, F.col(u)).otherwise(F.col(v)).alias("src"),
        F.when(u_first, F.col(v)).otherwise(F.col(u)).alias("dst"),
        F.when(u_first, F.col("__du")).otherwise(F.col("__dv")).alias("src_deg"),
        F.when(u_first, F.col("__dv")).otherwise(F.col("__du")).alias("dst_deg"),
    )


def oriented_wedges(oriented: DataFrame) -> DataFrame:
    """All wedges (x; y, z) with rank(x) < rank(y) < rank(z) from a
    degree-oriented edge list — each candidate triangle generated
    exactly once, at its minimum-rank vertex. One self-equi-join on
    the wedge apex; the rank comparison is the (degree, id) struct
    order, matching orient_edges."""
    e1 = oriented.select(
        F.col("src").alias("x"),
        F.col("dst").alias("y"),
        F.col("dst_deg").alias("__dy"),
    )
    e2 = oriented.select(
        F.col("src").alias("x"),
        F.col("dst").alias("z"),
        F.col("dst_deg").alias("__dz"),
    )
    return (
        e1.join(e2, "x")
        .where(F.struct("__dy", "y") < F.struct("__dz", "z"))
        .select("x", "y", "z")
    )


def triangles(
    edges: DataFrame,
    u: str = "u",
    v: str = "v",
    degrees: DataFrame | None = None,
) -> DataFrame:
    """Every triangle of the undirected simple graph, one row (x, y, z)
    per triangle (vertices in rank order). Degree-ordered
    node-iterator (Schank & Wagner 2005): oriented wedges closed by
    one equi-join back onto the oriented edge set — since
    rank(y) < rank(z), the closing edge {y, z}, if present, is
    oriented y→z, so the closure is a plain (src, dst) equi-join."""
    oe = orient_edges(edges, u, v, degrees=degrees)
    return oriented_wedges(oe).join(
        oe.select(F.col("src").alias("y"), F.col("dst").alias("z")), ["y", "z"]
    )
