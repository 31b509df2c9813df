"""Similarity search over embedding columns (array<float>).

Two paths, per the north star:

- **brute-force cosine top-k** (the correctness baseline): broadcast
  the (small) query set, compute cosine with built-in higher-order
  functions (zip_with + aggregate — JVM-side, no Python), take top-k
  per query with a window. One broadcast join + one shuffle on
  query_id. At 100 TB the scan dominates; this is the exact-answer
  path for ≤ thousands of queries.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (deterministic planes seeded per (plane, dim) via md5 → same
  signature in any engine), bucket equi-join, exact re-rank within
  bucket. Multi-probe = also join on Hamming-1 neighbor buckets.
  Sub-linear candidate sets; recall tested against brute force.

Embeddings are cast to double before the dot product: float-vs-double
accumulation differences would otherwise flip near-tie rankings
between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _infer_dim(embeddings: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the first row — with a clear error
    for an empty corpus or a NULL leading vector instead of a bare
    TypeError from ``len(None)``."""
    row = embeddings.select(vec_col).first()
    if row is None or row[0] is None:
        raise ValueError(
            f"cannot infer embedding dim from '{vec_col}': corpus is empty "
            "or its first vector is NULL — pass dim= explicitly"
        )
    return len(row[0])


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query row.

    ``queries``: (query_id, embedding). Broadcast it — the corpus side
    never shuffles; only the (tiny) per-query candidate ranking does.
    Norms are hoisted to per-row columns BEFORE the join (same
    multiplication order as inline cosine → bit-identical results):
    inline they would recompute per PAIR — |queries|× the work."""
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__nq"),
    )
    corpus = embeddings.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("__nv")
    )
    scored = corpus.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("__qvec"), F.col(vec_col)) / (F.col("__nq") * F.col("__nv")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def hard_negative_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query
    (anchor), the top-k most cosine-similar corpus vectors with a
    DIFFERENT label — the negatives that actually move a contrastive
    loss (random negatives are trivially separable).

    Same shape discipline as brute_force_topk: the (small) anchor set
    broadcasts with hoisted norms, the corpus never shuffles, only the
    per-anchor candidate ranking does. The label-mismatch predicate
    rides the broadcast join condition, so Catalyst prunes same-label
    pairs before scoring. For web-scale anchor sets route candidates
    through lsh_ann_topk / ivf first and re-rank the bucket.

    Returns (query_id, neighbor_id, neighbor_label, cosine, rank)."""
    q = queries.select(
        F.col(query_id_col),
        F.col(label_col).alias("__qlabel"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__nq"),
    )
    corpus = embeddings.select(
        F.col(id_col),
        F.col(label_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("__nv"),
    )
    scored = corpus.join(
        F.broadcast(q), F.col(label_col) != F.col("__qlabel")
    ).select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.round(
            dot(F.col("__qvec"), F.col(vec_col)) / (F.col("__nq") * F.col("__nv")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "neighbor_label", "cosine", "rank")
    )


def series_l1_topk(
    series: DataFrame,
    anchors: DataFrame,
    k: int = 10,
    id_col: str = "user_id",
    seg_col: str = "seg",
    val_col: str = "n",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Multi-anchor whole-series similarity search: for each anchor
    series, the top-k corpus series by integer L1 distance over the
    shared segment axis — the batch core of streaming whole-series
    search (UCR-suite-style, reduced to its PAA representation).

    Same broadcast-anchor discipline as hard_negative_topk: `anchors`
    is a LONG-FORM frame (query_id, seg, val) small enough to
    broadcast (anchor_count × segment_count rows); the corpus series
    frame never shuffles on its own — the only shuffles are the
    per-(anchor, item) distance aggregation (map-side combined) and
    the per-anchor top-k keyed window. `exclude_self` drops the
    trivial zero-distance self match when anchors are drawn from the
    corpus itself.

    Both series must cover the same segment set (zero-filled
    upstream, e.g. queries_r3b._user_day_segments); segments missing
    from either side contribute nothing, exactly like the SQL join.

    Returns (query_id, id_col, l1_dist, rank), rank 1..k per anchor,
    ties broken by id."""
    a = anchors.select(
        query_id_col, seg_col, F.col(val_col).alias("__qn")
    )
    scored = (
        series.join(F.broadcast(a), seg_col)
        .groupBy(query_id_col, id_col)
        .agg(F.sum(F.abs(F.col(val_col) - F.col("__qn"))).alias("l1_dist"))
    )
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("l1_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "l1_dist", "rank")
    )


def hyperplane_signature(vec_col: str, num_planes: int, dim: int) -> Column:
    """Deterministic random-hyperplane LSH signature (int bucket id).

    Plane weights are pseudo-random in [-1, 1), derived per
    (plane, dimension) from md5 — reproducible anywhere, no RNG state:
        w[p][d] = (int(md5('p:d')[:8], 16) / 2^31) - 1
    bucket bit p = (Σ_d w[p][d] · v[d]) >= 0.
    """
    import hashlib

    # The weights are pure constants — fold them driver-side (identical
    # md5 math to the in-engine/oracle derivation) so the executor does
    # only the dot products, zero runtime hashing. Rendered as ONE SQL
    # expression string: per-element F.lit would cost num_planes×dim
    # py4j round-trips (~1 s of plan-build for 8×64) before Spark even
    # sees the query.
    planes_sql = "array({})".format(
        ",".join(
            "array({})".format(
                ",".join(
                    "cast('{!r}' as double)".format(
                        int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
                        / 2147483648.0
                        - 1.0
                    )
                    for d in range(dim)
                )
            )
            for p in range(num_planes)
        )
    )
    return F.expr(
        f"cast(aggregate(sequence(0, {num_planes - 1}), 0, (acc, p) -> acc + "
        f"if(aggregate(zip_with({vec_col}, element_at({planes_sql}, p + 1), "
        "(v, w) -> cast(v as double) * w), cast(0.0 as double), (a, t) -> a + t) >= 0, "
        "cast(pow(2, p) as int), 0)) as int)"
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multi_probe: bool = False,
) -> DataFrame:
    """ANN top-k: bucket equi-join on the hyperplane signature, exact
    cosine re-rank inside the bucket. Candidates ≈ N / 2^planes per
    query — tune num_planes to the corpus size.

    ``multi_probe``: also probe every Hamming-1 neighbor bucket (flip
    each signature bit on the QUERY side only — the corpus index is
    untouched, candidates grow ×(planes+1) not ×2^planes). The
    standard recall lever when a near neighbor straddles one
    hyperplane; recall gain is asserted in test_ann_recall.py."""
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    sig = hyperplane_signature(vec_col, num_planes, dim)
    corpus = embeddings.withColumn("__bucket", sig).withColumn(
        "__nv", l2_norm(F.col(vec_col))
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__nq"),
        hyperplane_signature(vec_col, num_planes, dim).alias("__bucket0"),
    )
    if multi_probe:
        probes = F.expr(
            f"array_union(array(__bucket0), transform(sequence(0, {num_planes - 1}), "
            "p -> cast(__bucket0 ^ cast(pow(2, p) as int) as int)))"
        )
        q = q.select(
            F.col(query_id_col),
            F.col("__qvec"),
            F.col("__nq"),
            F.explode(probes).alias("__bucket"),
        )
    else:
        q = q.withColumnRenamed("__bucket0", "__bucket")
    scored = corpus.join(F.broadcast(q), "__bucket").where(
        F.col(id_col) != F.col(query_id_col)
    ).select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("__qvec"), F.col(vec_col)) / (F.col("__nq") * F.col("__nv")), 6
        ).alias("cosine"),
    )
    if multi_probe:
        # a neighbor can collide on several probe buckets
        scored = scored.groupBy(query_id_col, "neighbor_id").agg(
            F.max("cosine").alias("cosine")
        )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def _ivf_index(
    embeddings: DataFrame,
    n_cells: int,
    id_col: str,
    vec_col: str,
    cents: list[tuple] | None = None,
):
    """Shared IVF index build: deterministic centroids (the n_cells
    lowest-id vectors, or caller-supplied ``cents`` — e.g. k-means-
    trained, or a persisted index manifest's), folded driver-side into
    ONE SQL expression (per-element F.lit would cost thousands of py4j
    round-trips), and the cell-assigned corpus. Returns (corpus,
    norm_sql, cell_scores_sql): corpus carries (id, vec, __nv, cell)
    with the assignment computed NARROWLY (argmax over n_cells struct
    comparisons — no shuffle); the SQL builders let callers score
    further vectors (IVF probes) against the same folded centroids."""
    if cents is None:
        cent_rows = (
            embeddings.orderBy(id_col)
            .limit(n_cells)
            .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
            .collect()
        )
        cents = _with_norms(
            [(r.cent_id, [float(v) for v in r.cent_vec]) for r in cent_rows]
        )
    norm_sql, cell_scores_sql = _ivf_sql(cents)

    # the norm bound for cell assignment rides along into downstream
    # scoring — cosine there needs only the dot product per candidate
    corpus = embeddings.select(
        F.col(id_col), F.col(vec_col), F.expr(norm_sql(vec_col)).alias("__nv")
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("__nv"),
        F.expr(f"array_max({cell_scores_sql(vec_col)}).cent_id").alias("cell"),
    )
    return corpus, norm_sql, cell_scores_sql


def _with_norms(pairs: list[tuple]) -> list[tuple]:
    """(cid, vec) → (cid, vec, ‖vec‖) with the exact accumulation
    order of ``l2_norm`` so folded-literal norms stay bit-identical
    to computed ones."""
    import math

    out = []
    for cid, vec in pairs:
        acc = 0.0
        for v in vec:
            acc += float(v) * float(v)
        out.append((cid, [float(v) for v in vec], math.sqrt(acc)))
    return out


def _ivf_sql(cents: list[tuple]):
    """(norm_sql, cell_scores_sql) SQL builders from centroid rows
    (cid, vec, norm) — the folded-literal coarse quantizer shared by
    the inline ``_ivf_index`` and the persisted ``pq_index`` (which
    loads ``cents`` from its manifest instead of the corpus)."""

    def _id_lit(cid) -> str:
        if isinstance(cid, str):
            # Spark's lexer has no doubled-quote escape — adjacent
            # string literals CONCATENATE, so '' would silently corrupt
            # ids; backslash-escape \ and ' instead
            return "'" + cid.replace("\\", "\\\\").replace("'", "\\'") + "'"
        return repr(cid)

    # Float literals via repr → string-cast: exact roundtrip.
    # cent_rows arrive sorted by cent_id, so the list index doubles as
    # the cent_id-ascending tie-break (negidx desc == cent_id asc) —
    # works for string ids too.
    cells_sql = ",".join(
        "named_struct('negidx', {neg}, 'cent_id', {cid}, "
        "'cnorm', cast('{cn!r}' as double), 'cvec', array({vs}))".format(
            cid=_id_lit(cid),
            neg=-i,
            cn=cnorm,
            vs=",".join(f"cast('{x!r}' as double)" for x in cvec),
        )
        for i, (cid, cvec, cnorm) in enumerate(cents)
    )

    def norm_sql(vec: str) -> str:
        return (
            f"sqrt(aggregate(transform({vec}, x -> cast(x as double) * cast(x as double)), "
            "cast(0.0 as double), (acc, v) -> acc + v))"
        )

    def cell_scores_sql(vec: str) -> str:
        # struct ordering: csim desc, then negidx desc == cent_id asc —
        # the same (cosine desc, cent_id) tie-break the ranked form used
        return (
            f"transform(array({cells_sql}), c -> named_struct("
            f"'csim', round(aggregate(zip_with({vec}, c.cvec, (x, y) -> cast(x as double) * y), "
            f"cast(0.0 as double), (acc, v) -> acc + v) / (__nv * c.cnorm), 6), "
            "'negidx', c.negidx, 'cent_id', c.cent_id))"
        )

    return norm_sql, cell_scores_sql


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    index=None,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into cells around
    centroids, search only the query's ``n_probe`` nearest cells.

    Centroids are chosen deterministically (the ``n_cells`` lowest-id
    vectors) instead of k-means so any engine — including the DuckDB
    oracle — reproduces the exact same index; swap in k-means|| for
    real recall tuning, the plan shape is identical.

    Scale shape: the centroid table is tiny, so it is collected once
    (the index-build step) and folded into per-row expressions — cell
    assignment is a NARROW argmax over n_cells struct comparisons, the
    corpus never shuffles for it (the window-rank formulation would
    shuffle 100 TB just to pick each row's nearest of ~thousands of
    cells). Centroid norms are precomputed driver-side with the exact
    accumulation order of ``l2_norm`` so results stay bit-identical.

    ``index`` — a prebuilt ``_ivf_index`` triple — lets a caller
    running SEVERAL searches against the same index (the n_probe
    sweep, recall audits) pay the corpus cell-assignment scan once:
    pass ``_ivf_index(...)`` with its corpus persisted and every call
    reuses the cached assignment instead of re-scanning.
    """
    corpus, norm_sql, cell_scores_sql = (
        index
        if index is not None
        else _ivf_index(embeddings, n_cells, id_col, vec_col)
    )
    probes = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.expr(norm_sql(vec_col)).alias("__nv"),
    ).select(
        F.col(query_id_col),
        F.col("__qvec"),
        F.col("__nv").alias("__nq"),
        F.explode(
            F.expr(
                f"slice(transform(sort_array({cell_scores_sql('__qvec')}, false), "
                f"s -> s.cent_id), 1, {n_probe})"
            )
        ).alias("cell"),
    )
    # no (query, neighbor) dedup needed: each corpus row lives in
    # exactly one cell and a query's probe cells are distinct, so a
    # pair can collide only once — a groupBy here would be a pure
    # extra shuffle of the candidate set.
    # The probe side is tiny (queries × n_probe) and MUST broadcast:
    # an equi-join on "cell" with only n_cells distinct values would
    # otherwise shuffle the whole corpus into n_cells reducer
    # partitions — a full-corpus exchange with extreme skew
    scored = corpus.join(F.broadcast(probes), "cell").where(
        F.col(id_col) != F.col(query_id_col)
    ).select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("__qvec"), F.col(vec_col)) / (F.col("__nq") * F.col("__nv")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def semdedup_prune(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public):
    cluster the corpus, then prune near-duplicates WITHIN each cluster
    only. Returns (id, cell, pruned): pruned = true iff a lower-id
    vector in the same cell has cosine ≥ threshold (keep-min-id, the
    repo-wide deterministic winner rule).

    Scale shape: this is the trick that makes embedding dedup linear —
    the pairwise comparison is an equi-join on ``cell``, never an
    all-pairs product; with n_cells sized ~√n the per-cell work is
    bounded and the join key is the (balanced, k-means-shaped) cluster
    id. Cell assignment itself is the narrow folded-centroid argmax
    from _ivf_index (no shuffle). Centroids here are deterministic
    lowest-id vectors so any engine replays the exact clustering; swap
    k-means|| in for real deployments — the plan shape is identical.
    """
    corpus, _, _ = _ivf_index(embeddings, n_cells, id_col, vec_col)
    # The cell-assigned corpus feeds THREE consumers (both self-join
    # sides + the final flag join). The assignment itself is the n·k·d
    # folded-centroid argmax — at n_cells ~ n/250 it is the single
    # biggest term in the plan, and without materialization Spark
    # recomputes it once per consumer (measured 3.3× wall at 20k×80
    # cells: 24.5 s → 7.4 s). persist(), not localCheckpoint(): cache
    # blocks recompute from lineage on executor loss, so the operator
    # stays correct on a real cluster under preemption. Tracked via
    # _track_cached so release_cached() callers (bench, verify) drop
    # it after materializing — an untracked persist here would feed
    # LATER _ivf_index-based queries silent plan-fragment cache hits
    # (same source + same n_cells ⇒ identical corpus subplan).
    from kafkaconnect_spark.operators.dedup import _track_cached

    corpus = corpus.persist()
    a = corpus.select(
        "cell",
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__nv").alias("__na"),
    )
    b = corpus.select(
        "cell",
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__nv").alias("__nb"),
    )
    pruned_ids = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.round(
                dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
            )
            >= threshold
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return _track_cached(
        corpus.join(pruned_ids.withColumn("__p", F.lit(True)), id_col, "left").select(
            F.col(id_col),
            F.col("cell"),
            F.coalesce(F.col("__p"), F.lit(False)).alias("pruned"),
        ),
        [corpus],
    )


def kmeans_step(
    embeddings: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One SPHERICAL k-means iteration, engine-exact: assignment is
    the _ivf_index COSINE-similarity argmax (narrow, no shuffle) —
    the metric the IVF ANN index and SemDeDup cells use — then
    per-cell per-dimension means are recomputed. NOTE this is NOT an
    iteration of ``kmeans_lloyd`` (which assigns by squared
    EUCLIDEAN distance); the two share the update step but not the
    assignment metric, so they do not compose.
    Returns long-format (cell, dim, n_members, centroid_value) — the
    updated centroid table.

    Scale shape: the only shuffle is groupBy(cell, dim) with map-side
    combine — output is n_cells×dims rows regardless of corpus size.
    Per-element values round to 7 and DECIMAL-sum (order-independent ⇒
    engine/parallelism-exact), the embedding_centroids rule."""
    corpus, _, _ = _ivf_index(
        embeddings.where(F.size(vec_col) > 0), n_cells, id_col, vec_col
    )
    counts = corpus.groupBy("cell").agg(F.count(F.lit(1)).alias("n_members"))
    means = (
        corpus.select("cell", F.posexplode(F.col(vec_col)).alias("dim", "__x"))
        .withColumn(
            "__xd", F.expr("cast(round(cast(__x as double), 7) as decimal(20,7))")
        )
        .groupBy("cell", "dim")
        .agg(F.sum("__xd").alias("__s"))
    )
    return means.join(F.broadcast(counts), "cell").select(
        "cell",
        "dim",
        "n_members",
        # NO final round: decimal sum → double → one division is
        # bit-identical in any engine; round(…,6) diverges when the
        # rational quotient's shortest repr sits on a .5 boundary
        (F.col("__s").cast("double") / F.col("n_members")).alias(
            "centroid_value"
        ),
    )


def kmeans_lloyd(
    embeddings: DataFrame,
    n_cells: int = 8,
    n_rounds: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full Lloyd's k-means (squared-EUCLIDEAN assignment — unlike
    the spherical/cosine ``kmeans_step``) with deterministic init
    (n_cells lowest-id vectors) and a fixed round count — the
    clustering pass production SemDeDup runs before within-cell
    pruning. Returns (id, cell).

    Spark shape (the same as MLlib's KMeans): assignment is a NARROW
    folded-centroid argmax per round (no shuffle, no join); the update
    step reduces to n_cells×dims decimal-exact rows that come back to
    the driver as the next round's fold constants — control plane,
    bounded by k·d, never corpus-sized. Iterative training is not
    SQL-expressible; exactness is pinned against a numpy reference in
    tests (same init, same decimal rule, same min-index tie-break).
    Empty cells keep their previous centroid (the standard rule)."""
    vecs = embeddings.where(F.size(vec_col) > 0).select(
        F.col(id_col), F.col(vec_col)
    )
    cents = _lloyd_centroids(vecs, n_cells, n_rounds, id_col, vec_col)
    return _lloyd_assign(vecs, cents, vec_col).select(F.col(id_col), "cell")


def _lloyd_assign(df: DataFrame, cents: list[list[float]], vec_col: str) -> DataFrame:
    """+cell column = squared-Euclidean argmin over folded centroid
    literals: struct ordering (negdist desc, negidx desc) ==
    (dist asc, idx asc) — narrow, no shuffle. Past the folded-literal
    ceiling (n_cells > 64 — interpreted-HOF wall + janino 64 KB limit,
    COVERAGE r10) the identical assignment comes from the Arrow/numpy
    kernel (veccode.lloyd_assign_np, bit-exactness pinned in
    tests/test_veccode.py) — what lets retrain() rotate an index to
    SemDeDup's n_cells ≈ corpus/250 rule at scale."""
    from kafkaconnect_spark.operators import veccode

    if veccode.use_np(len(cents)):
        return veccode.lloyd_assign_np(df, cents, vec_col)
    structs = ",".join(
        "named_struct('negdist', -round({dist}, 6), 'negidx', {neg})".format(
            neg=-i,
            dist=(
                "aggregate(zip_with({v}, array({cs}), "
                "(x, y) -> (cast(x as double) - y) * (cast(x as double) - y)), "
                "cast(0.0 as double), (acc, t) -> acc + t)"
            ).format(
                v=vec_col,
                cs=",".join(f"cast('{x!r}' as double)" for x in c),
            ),
        )
        for i, c in enumerate(cents)
    )
    return df.withColumn(
        "cell", F.expr(f"-array_max(array({structs})).negidx").cast("int")
    )


def _lloyd_centroids(
    vecs: DataFrame,
    n_cells: int,
    n_rounds: int,
    id_col: str,
    vec_col: str,
) -> list[list[float]]:
    """The Lloyd training loop, returning the trained CENTROID VECTORS
    (kmeans_lloyd returns assignments; the quantizer trainers —
    pq_index's coarse cells and per-subspace codebooks — need the
    centroids themselves). Deterministic init (n_cells lowest-id
    vectors), fixed ``n_rounds``, decimal-exact mean updates, empty
    cells keep their previous centroid — every step an oracle can
    replay as chained SQL CTEs."""
    init = (
        vecs.orderBy(id_col)
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    cents: list[list[float]] = [[float(x) for x in r[0]] for r in init]
    for _ in range(n_rounds):
        assigned = _lloyd_assign(vecs, cents, vec_col)
        stats = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("dim", "__x"))
            .withColumn(
                "__xd",
                F.expr("cast(round(cast(__x as double), 7) as decimal(20,7))"),
            )
            .groupBy("cell", "dim")
            .agg(F.sum("__xd").alias("__s"), F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty cells keep previous
        by_cell: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cell.setdefault(r["cell"], {})[r["dim"]] = float(r["__s"]) / r["__n"]
        for cell, dims in by_cell.items():
            new_cents[cell] = [dims[d] for d in sorted(dims)]
        if new_cents == cents:
            break
        cents = new_cents
    return cents


def _lloyd_subspace_books(
    vecs: DataFrame,
    n_sub: int,
    d: int,
    n_codes: int,
    n_rounds: int,
    id_col: str,
    vec_col: str,
) -> list[list[list[float]]]:
    """Train ALL n_sub per-subspace PQ codebooks with ONE corpus pass
    per round: each subspace's assignment is an independent folded
    argmin column, and the mean-update statistics for every
    (subspace, cell, dim) come back from a single explode + groupBy —
    n_sub separate `_lloyd_centroids` calls pay n_sub corpus scans
    per round for the identical numbers (bit-identical: same slice,
    same cast, same round-7 decimal sums, same empty-cell rule —
    pinned in tests/test_ann_recall.py). Driver state per round is
    n_sub·k·d floats."""
    init = vecs.orderBy(id_col).limit(n_codes).select(vec_col).collect()
    books = [
        [[float(x) for x in r[0][s * d : (s + 1) * d]] for r in init]
        for s in range(n_sub)
    ]
    for _ in range(n_rounds):
        work = vecs.select(
            *[
                F.expr(f"slice({vec_col}, {s * d + 1}, {d})").alias(f"__sub{s}")
                for s in range(n_sub)
            ]
        )
        for s in range(n_sub):
            work = _lloyd_assign(work, books[s], f"__sub{s}").withColumnRenamed(
                "cell", f"__cell{s}"
            )
        long = work.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.col(f"__cell{s}").alias("cell"),
                            F.col(f"__sub{s}").alias("sub"),
                        )
                        for s in range(n_sub)
                    ]
                )
            ).alias("e")
        ).select("e.s", "e.cell", F.posexplode("e.sub").alias("dim", "__x"))
        stats = (
            long.withColumn(
                "__xd",
                F.expr("cast(round(cast(__x as double), 7) as decimal(20,7))"),
            )
            .groupBy("s", "cell", "dim")
            .agg(F.sum("__xd").alias("__s"), F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        new_books = [[list(c) for c in books[s]] for s in range(n_sub)]
        by: dict[tuple[int, int], dict[int, float]] = {}
        for r in stats:
            by.setdefault((r["s"], r["cell"]), {})[r["dim"]] = (
                float(r["__s"]) / r["__n"]
            )
        for (s, cell), dims in by.items():
            new_books[s][cell] = [dims[dd] for dd in sorted(dims)]
        if new_books == books:
            break
        books = new_books
    return books


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ τ, candidate-pruned by LSH
    bucket equi-join (corpus self-join never goes quadratic)."""
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    sig = hyperplane_signature(vec_col, num_planes, dim)
    # distinct column names per side (not DataFrame aliases): the
    # name-resolved SQL expression inside the signature breaks under
    # self-join attribute dedup otherwise
    c = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        sig.alias("__bucket"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    a = c.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        "__bucket",
        F.col("__n").alias("__na"),
    )
    b = c.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        "__bucket",
        F.col("__n").alias("__nb"),
    )
    return (
        a.join(b, "__bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_min: int = 2,
    df_max: int = 100,
    threshold: float = 0.5,
) -> DataFrame:
    """Sparse LEXICAL similarity: document pairs with TF-IDF cosine ≥
    ``threshold`` via an inverted-index (posting-list) equi-join —
    the classic sparse-vector twin of the dense embedding paths.

    Scale discipline — the two caps ARE the plan:
    - terms with df > ``df_max`` are dropped (stop-terms): a term in
      10⁶ docs would alone contribute ~10¹² candidate pairs; the cap
      bounds per-term join fan-out at df_max² while barely moving the
      cosine (idf of a hot term is ~1, its weight noise);
    - df < ``df_min`` terms cannot form pairs (df_min=2 is free
      pruning).
    The pair volume is Σ_term df² ≤ df_max·Σ df — linear in postings.

    Engine-exactness: weights are FIXED-POINT integers,
    w = round_half_up(tf·N·10⁴ / df) (idf = N/df, the log-free
    variant of the salient-terms rule — ln() is not identically
    rounded across libms), products/sums run in DECIMAL, and only
    the final norm/cosine touch doubles (sqrt is IEEE-correctly
    rounded). Returns (id_a, id_b, cosine)."""
    from pyspark.sql import types as T

    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        ).alias("term"),
    ).where(F.length("term") > 0)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("__tf"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df").between(df_min, df_max))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            # round_half_up(tf·N·1e4 / df) as pure integer arithmetic
            F.expr("(2 * __tf * __n * 10000 + __df) div (2 * __df)")
            .cast(T.DecimalType(19, 0))
            .alias("__w"),
        )
        .persist()
    )
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("__w") * F.col("__w")).cast("double")).alias("__nrm")
    )
    a = w.select(
        F.col("term"), F.col(id_col).alias("id_a"), F.col("__w").alias("__wa")
    )
    b = w.select(
        F.col("term"), F.col(id_col).alias("id_b"), F.col("__w").alias("__wb")
    )
    dots = (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("__nrm").alias("__na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("__nrm").alias("__nb"))
    from kafkaconnect_spark.operators.dedup import _track_cached

    return _track_cached(
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__dot").cast("double") / (F.col("__na") * F.col("__nb")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold),
        [w],  # posting weights feed norms AND dots — caller releases
    )


def pq_codes(
    embeddings: DataFrame,
    n_sub: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    books: list | None = None,
) -> DataFrame:
    """Product quantization (Jégou et al. 2011, "Product quantization
    for nearest neighbor search", public): split each vector into
    ``n_sub`` subvectors, code each against a per-subspace codebook →
    the vector compresses to n_sub small codes (here 4×3 bits vs
    64×32 — the memory step that makes billion-scale ANN fit RAM).

    Codebooks are deterministic (the n_codes lowest-id vectors'
    subvectors — the kmeans_lloyd init rule; production would refine
    them with per-subspace Lloyd rounds, same machinery). Assignment
    is squared-Euclidean argmin rounded to 6, tie → lowest code —
    folded into a narrow literal expression per subspace, NO shuffle:
    at 100 TB this is a pure map stage. Returns
    (id, code_0..code_{n_sub-1}, quant_err) with quant_err the sum of
    the per-subspace rounded residuals."""
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    vecs = embeddings.where(F.size(vec_col) > 0).select(
        F.col(id_col), F.col(vec_col)
    )
    if books is None:
        books, d = _pq_codebooks(vecs, n_sub, n_codes, dim, id_col, vec_col)
    else:  # caller-supplied (e.g. Lloyd-trained) codebooks
        d = dim // n_sub
    out = vecs
    err_terms = []
    for s in range(n_sub):
        code_expr, dist_expr = _pq_sub_argmin(books, s, d, vec_col)
        out = out.withColumn(f"code_{s}", F.expr(code_expr))
        err_terms.append(dist_expr)
    return out.withColumn(
        "quant_err", F.round(F.expr(" + ".join(err_terms)), 6)
    ).select(
        id_col, *[f"code_{s}" for s in range(n_sub)], "quant_err"
    )


def _pq_codebooks(
    vecs: DataFrame, n_sub: int, n_codes: int, dim: int, id_col: str, vec_col: str
) -> tuple[list[list[list[float]]], int]:
    """Deterministic per-subspace codebooks (the n_codes lowest-id
    vectors' subvectors — kmeans_lloyd's init rule) collected once
    driver-side; returns (books[s][c] = subvector floats, d = subdim)."""
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    d = dim // n_sub
    init = vecs.orderBy(id_col).limit(n_codes).select(vec_col).collect()
    books = [
        [[float(x) for x in r[0][s * d : (s + 1) * d]] for r in init]
        for s in range(n_sub)
    ]
    return books, d


def _pq_sq_dist_sql(vec_col: str, start: int, d: int, cvec: list[float]) -> str:
    """Rounded squared-L2 distance of a d-wide slice of ``vec_col``
    to a folded-literal codeword — the shared kernel of code
    assignment AND the ADC lookup table (identical text on both uses
    so the same value is computed bit-identically)."""
    cs = ",".join(f"cast('{x!r}' as double)" for x in cvec)
    return (
        f"aggregate(zip_with(slice({vec_col}, {start}, {d}), array({cs}), "
        "(x, y) -> (cast(x as double) - y) * (cast(x as double) - y)), "
        "cast(0.0 as double), (acc, t) -> acc + t)"
    )


def _pq_sub_argmin(
    books: list[list[list[float]]], s: int, d: int, vec_col: str
) -> tuple[str, str]:
    """(code_expr, dist_expr) for subspace s: squared-Euclidean argmin
    rounded to 6, tie → lowest code — a narrow literal expression, NO
    shuffle (at 100 TB this is a pure map stage)."""
    structs = ",".join(
        "named_struct('negdist', -round({dist}, 6), 'negidx', {neg})".format(
            neg=-c,
            dist=_pq_sq_dist_sql(vec_col, s * d + 1, d, books[s][c]),
        )
        for c in range(len(books[s]))
    )
    best = f"array_max(array({structs}))"
    return (f"cast(-{best}.negidx as int)", f"-{best}.negdist")


def _pq_adc_lut_sql(
    books: list[list[list[float]]], d: int, vec_col: str
) -> str:
    """ADC lookup table for one query vector: array<array<double>> of
    n_sub × n_codes rounded squared-L2 distances from the query's
    subvectors to every codeword — computed ONCE per query (tiny),
    then every candidate's distance is n_sub array lookups."""
    subs = []
    for s, book in enumerate(books):
        entries = ",".join(
            f"round({_pq_sq_dist_sql(vec_col, s * d + 1, d, cvec)}, 6)"
            for cvec in book
        )
        subs.append(f"array({entries})")
    return "array(" + ",".join(subs) + ")"


def ivfpq_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    n_sub: int = 4,
    n_codes: int = 8,
    rerank: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
    index=None,
    quantizers=None,
) -> DataFrame:
    """IVF-PQ ANN with asymmetric distance computation (Jégou et al.
    2011, public) — the composed memory-bounded search real 100 TB
    vector corpora run: probe the query's ``n_probe`` nearest IVF
    cells, score every candidate by PQ ADC (a per-query lookup table
    of subvector→codeword distances; each candidate costs n_sub array
    lookups over its CODES — the full vector is never touched),
    shortlist the ``rerank`` best, then re-rank exactly on the true
    vectors fetched by id.

    Scale shape: the candidate stage carries (id, cell, n_sub small
    ints) — codes, not vectors — so the shortlist scan streams the
    compressed representation (the memory step that makes
    billion-scale ANN fit RAM); the exact re-rank joins only
    queries × rerank ids back to the vector table (keyed equi-join).
    Probes (with their LUTs) broadcast; the corpus never shuffles.
    Centroids and codebooks are deterministic (lowest-id rule) so any
    engine — including the DuckDB oracle — replays the identical
    index; swap k-means(|‖)-trained versions in for real recall
    tuning, the plan shape is unchanged.

    Returns (query_id, neighbor_id, cosine, adc_dist, rank ≤ k):
    ranking by exact cosine desc (tie → neighbor_id) within the
    ADC shortlist (adc asc, tie → neighbor_id)."""
    sl = _ivfpq_shortlist(
        embeddings,
        queries,
        n_cells=n_cells,
        n_probe=n_probe,
        n_sub=n_sub,
        n_codes=n_codes,
        max_rerank=rerank,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        dim=dim,
        index=index,
        quantizers=quantizers,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sl.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "adc_dist", "rank")
    )


def _ivfpq_shortlist(
    embeddings: DataFrame,
    queries: DataFrame,
    n_cells: int,
    n_probe: int,
    n_sub: int,
    n_codes: int,
    max_rerank: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    dim: int | None,
    index=None,
    quantizers=None,
) -> DataFrame:
    """The shared ADC stage of IVF-PQ: probe cells, score candidates
    on their codes, keep the ``max_rerank`` best per query WITH their
    exact cosine and shortlist rank — so a rerank-depth sweep derives
    every depth r ≤ max_rerank from ONE candidate scan (shortlist(r)
    is a rank-prefix of shortlist(max_rerank)). Returns (query_id,
    neighbor_id, cosine, adc_dist, shortlist_rank).

    ``quantizers``: optional (cents, books) — centroid rows (cid, vec,
    norm) + per-subspace codebooks — replacing the lowest-id defaults;
    how k-means-trained quantizers plug in without changing the plan
    shape (queries_r7.embedding_ivfpq_trained_recall)."""
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    if quantizers is not None:
        cents, books = quantizers
        d = dim // n_sub
        corpus, norm_sql, cell_scores_sql = (
            index
            if index is not None
            else _ivf_index(embeddings, n_cells, id_col, vec_col, cents=cents)
        )
    else:
        corpus, norm_sql, cell_scores_sql = (
            index
            if index is not None
            else _ivf_index(embeddings, n_cells, id_col, vec_col)
        )
        books, d = _pq_codebooks(
            embeddings.select(id_col, vec_col), n_sub, n_codes, dim, id_col, vec_col
        )
    # the stored index at scale: (id, cell, codes) — no vectors
    coded = corpus.select(
        F.col(id_col),
        F.col("cell"),
        *[
            F.expr(_pq_sub_argmin(books, s, d, vec_col)[0]).alias(f"code_{s}")
            for s in range(n_sub)
        ],
    )
    probes = _pq_probes(
        queries, books, d, n_probe, norm_sql, cell_scores_sql, query_id_col, vec_col
    )
    return _adc_rerank(
        coded, probes, embeddings, n_sub, max_rerank, id_col, vec_col,
        query_id_col, norm_sql,
    )


def _pq_probes(
    queries: DataFrame,
    books: list,
    d: int,
    n_probe: int,
    norm_sql,
    cell_scores_sql,
    query_id_col: str,
    vec_col: str,
) -> DataFrame:
    """One row per (query, probed cell): the query vector + norm, its
    per-subspace ADC lookup table, and the probe cell — everything the
    candidate scan needs, built once per query (tiny; broadcasts)."""
    return queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.expr(norm_sql(vec_col)).alias("__nv"),
    ).select(
        F.col(query_id_col),
        F.col("__qvec"),
        F.col("__nv").alias("__nq"),
        F.expr(_pq_adc_lut_sql(books, d, "__qvec")).alias("__lut"),
        F.explode(
            F.expr(
                f"slice(transform(sort_array({cell_scores_sql('__qvec')}, false), "
                f"s -> s.cent_id), 1, {n_probe})"
            )
        ).alias("cell"),
    )


def _adc_rerank(
    coded: DataFrame,
    probes: DataFrame,
    vectors: DataFrame,
    n_sub: int,
    max_rerank: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    norm_sql,
) -> DataFrame:
    """The shared ADC-score → shortlist → exact-re-rank tail of IVF-PQ
    search, over ANY coded source — the inline corpus coding above or
    a persisted index's stored codes (operators/pq_index.match).
    ``vectors`` is the true-vector store the exact re-rank joins by id
    (only queries × max_rerank ids are fetched)."""
    # per-entry values are already rounded to 6 decimals; summing them
    # as DECIMAL(18,6) is EXACT in any engine — no float-association
    # sensitivity between this plan and an oracle replay
    adc = F.expr(
        "cast(("
        + " + ".join(
            f"cast(element_at(element_at(__lut, {s + 1}), code_{s} + 1) "
            "as decimal(18,6))"
            for s in range(n_sub)
        )
        + ") as double)"
    )
    shortlisted = (
        coded.join(F.broadcast(probes), "cell")
        .where(F.col(id_col) != F.col(query_id_col))
        .withColumn("__adc", adc)
    )
    w_adc = Window.partitionBy(query_id_col).orderBy(
        F.col("__adc").asc(), F.col(id_col).asc()
    )
    shortlist = (
        shortlisted.withColumn("__srn", F.row_number().over(w_adc))
        .where(F.col("__srn") <= max_rerank)
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            "__adc",
            "__srn",
            "__qvec",
            "__nq",
        )
    )
    # exact re-rank: fetch true vectors for ONLY the shortlist ids
    truth = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__tvec"),
        F.expr(norm_sql(vec_col)).alias("__nt"),
    )
    return shortlist.join(truth, "neighbor_id").select(
        query_id_col,
        "neighbor_id",
        F.round(
            dot(F.col("__qvec"), F.col("__tvec")) / (F.col("__nq") * F.col("__nt")),
            6,
        ).alias("cosine"),
        F.col("__adc").alias("adc_dist"),
        F.col("__srn").alias("shortlist_rank"),
    )
