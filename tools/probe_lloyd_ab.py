"""r12 A/B (r11 verdict #5): Lloyd-assignment below the 64-cell
veccode dispatch line — SQL folded-literal argmin vs the Arrow/numpy
kernel — measured at the retrain gate geometry (n_cells=8, d=64, and
the subspace-book shape n_codes=8, d=16) over the sf0.1 embeddings
corpus, plus the end-to-end training loops (_lloyd_centroids /
_lloyd_subspace_books) both ways.

The r10 measurement that placed the dispatch line at 64 cells timed
the CODING path's per-row throughput. Training is different: every
round re-analyzes the folded-literal tree (n_cells × dims literals)
and the assignment runs 2×(rounds) times — at gate scale the plan
cost can dominate the row cost. This probe measures both terms so the
dispatch can sit on a measured line (bit-exactness of the kernel is
already pinned in tests/test_veccode.py, so dispatch placement can
never change results).

Usage: python tools/probe_lloyd_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from kafkaconnect_spark.operators import similarity, veccode
    from kafkaconnect_spark.query_base import _t
    from kafkaconnect_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("kc-probe-lloyd-ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    vecs = emb.where(F.size("embedding") > 0).select("vec_id", "embedding")
    vecs = vecs.persist()
    n = vecs.count()
    print(f"corpus rows: {n}")

    # deterministic centroids: the retrain init rule (lowest-id rows)
    init8 = [
        [float(x) for x in r[0]]
        for r in vecs.orderBy("vec_id").limit(8).select("embedding").collect()
    ]

    def _time(label, fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: best-of-{reps} {best:.3f}s", flush=True)
        return best

    def _sql_assign():
        similarity._lloyd_assign(vecs, init8, "embedding").write.format(
            "noop"
        ).mode("overwrite").save()

    def _np_assign():
        veccode.lloyd_assign_np(vecs, init8, "embedding").write.format(
            "noop"
        ).mode("overwrite").save()

    # warm both paths once
    _sql_assign(); _np_assign()
    a = _time("assign n_cells=8 d=64 SQL-fold ", _sql_assign)
    b = _time("assign n_cells=8 d=64 np-kernel", _np_assign)

    # end-to-end training loops at the retrain geometry, both dispatches
    def _with_ceiling(ceiling, fn):
        old = veccode.SQL_CELLS_CEILING
        veccode.SQL_CELLS_CEILING = ceiling
        try:
            return fn()
        finally:
            veccode.SQL_CELLS_CEILING = old

    def _train_cents():
        similarity._lloyd_centroids(vecs, 8, 2, "vec_id", "embedding")

    def _train_books():
        similarity._lloyd_subspace_books(
            vecs, 4, 16, 8, 2, "vec_id", "embedding"
        )

    for label, ceiling in (("SQL-fold (ceiling 64)", 64), ("np-kernel (ceiling 0)", 0)):
        c = _time(f"_lloyd_centroids rounds=2 {label}",
                  lambda: _with_ceiling(ceiling, _train_cents))
        d = _time(f"_lloyd_subspace_books rounds=2 {label}",
                  lambda: _with_ceiling(ceiling, _train_books))
        print(f"  training total {label}: {c + d:.3f}s")

    # value-equality spot check (the pinned bit-exactness, re-asserted
    # on this corpus): same assignments both ways
    sql_rows = {
        r[0]: r[1]
        for r in similarity._lloyd_assign(vecs, init8, "embedding")
        .select("vec_id", "cell").collect()
    }
    np_rows = {
        r[0]: r[1]
        for r in veccode.lloyd_assign_np(vecs, init8, "embedding")
        .select("vec_id", "cell").collect()
    }
    assert sql_rows == np_rows, "dispatch paths diverge!"
    print(f"assignments identical on {len(sql_rows)} rows")
    print(f"RATIO assign sql/np = {a / b:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
