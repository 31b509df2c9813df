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

    Engine-exact: each edge contribution pr(j)/deg(j) rounds to 7 and
    DECIMAL-sums per target; dangling nodes (no out-edges) keep rank
    (1−d). Each round's rank vector is lineage-truncated — without it
    the plan nests one join level per round and analysis dies long
    before compute does (same pathology as connected components)."""
    ckpt = _make_ckpt(edges.sparkSession, checkpoint_dir)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
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
    ranks = nodes.select("node", F.lit(1.0).alias("pagerank"))
    for _ in range(n_rounds):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    "cast(round(pagerank / __deg, 7) as decimal(20,7))"
                ).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = ckpt(
            nodes.join(contrib, "node", "left").select(
                "node",
                F.round(
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * F.coalesce(F.col("__s").cast("double"), F.lit(0.0)),
                    6,
                ).alias("pagerank"),
            )
        )
    ed.unpersist()
    nodes.unpersist()  # ranks is checkpointed — no lineage back to nodes
    return ranks
