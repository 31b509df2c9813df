"""Distributed spectral primitives: power iteration for the dominant
principal component without materializing the covariance matrix.

The matvec v' = C v is computed as v'_j = Σ_i x̃_ij · (x̃_i · v) over
the centered rows x̃ — two corpus passes per round (a narrow per-row
fold for the dot products, a D-way explode + D-key aggregation for
the accumulation), the textbook distributed formulation (Halko,
Martinsson & Tropp 2011 treat the same sketch-free matvec as the
building block of randomized PCA; public).

Engine-exactness discipline (shared with the k-means / PageRank
iterative family, tightened): every matvec term is fixed-point
(×10⁷ → bigint) so partial aggregation is integer-exact and
order-independent; inter-round normalization divides by a POWER OF
TWO sized from the max coefficient's bit length — binary-exact in a
double, i.e. NO rounding between rounds; only the driver-side
64-value collect (the k-means centroid discipline) crosses rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = "1e7"


def per_dim_means(vecs: DataFrame, vec_col: str = "vec") -> DataFrame:
    """(dim, m): decimal-exact per-dimension means of the vector
    column — identical at any parallelism."""
    return (
        vecs.select(F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.sum(F.round(F.col("x"), 7).cast("decimal(20,7)")).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select("dim", (F.col("__s").cast("double") / F.col("__n")).alias("m"))
    )


def matvec_fixed_point(
    vecs: DataFrame, mu: list[float], v: list[float], dim: int, vec_col: str = "vec"
) -> DataFrame:
    """One covariance matvec s = Σ_i x̃_i (x̃_i·v) in fixed point:
    returns (dim, s) with s an EXACT bigint of the ×10⁷-scaled
    coefficient. mu and v are driver-side literals (bounded —
    D doubles each)."""
    mu_sql = ",".join(repr(x) for x in mu)
    v_sql = ",".join(repr(x) for x in v)
    d = vecs.select(
        vec_col,
        (
            F.expr(
                f"aggregate(sequence(1, {dim}), 0L, (acc, j) -> acc + "
                f"CAST(round((element_at({vec_col}, j) - element_at(array({mu_sql}), j))"
                f" * element_at(array({v_sql}), j) * {_SCALE}) AS BIGINT))"
            )
            / F.lit(float(_SCALE))
        ).alias("__d"),
    )
    return (
        d.select(F.posexplode(vec_col).alias("dim", "x"), "__d")
        .select(
            "dim",
            F.expr(
                f"CAST(round((x - element_at(array({mu_sql}), dim + 1))"
                f" * __d * {_SCALE}) AS BIGINT)"
            ).alias("__t"),
        )
        .groupBy("dim")
        .agg(F.sum("__t").alias("s"))
    )


def _norm_agg(s_df: DataFrame, k: int) -> DataFrame:
    """1-row (__norm) = ‖s‖₂ of the fixed-point coefficient column,
    overflow-safe (r6 ADVICE): squaring the raw bigint as
    decimal(19,0)² summed into decimal(38,0) overflows to NULL (ANSI
    off) once |s| nears 9e18 on a large corpus. Prescale instead by
    the power of two that keeps each |s| div 2^kk under 2^26 (``k`` =
    bit length of max|s|): the squares (<2^52) and their D-term sum
    (<2^58 for D ≤ 64) stay exact bigints in any engine,
    order-independent; the final sqrt → ×2^kk is two
    correctly-rounded double ops the oracle replays bit-identically
    (abs(s) >> kk on its side). The dropped low bits perturb the norm
    by ~2⁻²⁶ relative — far inside the 6-decimal output rounding."""
    kk = max(k - 26, 0)
    t = F.expr(f"abs(s) div {2 ** kk}")
    return s_df.agg(
        (F.sqrt(F.sum(t * t).cast("double")) * F.lit(float(2**kk))).alias("__norm")
    )


def power_iteration_top_component(
    embeddings: DataFrame,
    rounds: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dominant principal component after ``rounds`` fixed power
    iterations from the all-positive init (a power-of-two constant
    per dim — binary-exact; power iteration is scale-free so only
    the direction matters, but the constant must match the oracle's
    because the fixed-point quantization sees the scale). Returns 64 rows
    (dim, mean, component) with component the unit-normalized final
    coefficient vector (one decimal rounding, at the very end).

    Convergence is spectrum-dependent — error ∝ (λ₂/λ₁)^rounds — so
    a FIXED round count pins the matvec semantics for the oracle the
    same way embedding_kmeans_step pins one Lloyd step; production
    iterates this same plan until the Rayleigh quotient stabilizes
    (tests/test_queries_r6c.py demonstrates convergence in 6 rounds
    on an anisotropic corpus)."""
    from kafkaconnect_spark.operators.dedup import _track_cached

    vecs = embeddings.where(F.size(vec_col) > 0).select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("vec"),
    ).persist()
    mu_rows = per_dim_means(vecs).persist()
    mu = [r.m for r in sorted(mu_rows.collect(), key=lambda r: r.dim)]
    v = [0.125] * dim  # 2^-3: binary-exact, matches the oracle literal
    s_df = None
    for _ in range(rounds):
        s_df = matvec_fixed_point(vecs, mu, v, dim)
        s_ints = {r.dim: r.s for r in s_df.collect()}  # D exact bigints
        k = max(max(abs(x) for x in s_ints.values()).bit_length(), 1)
        v = [s_ints[j] / float(2**k) for j in range(dim)]  # /2^k: exact
    norm = _norm_agg(s_df, k)
    return _track_cached(
        s_df.crossJoin(F.broadcast(norm))
        .join(mu_rows, "dim")
        .select(
            "dim",
            F.round(F.col("m"), 6).alias("mean"),
            F.round(F.col("s").cast("double") / F.col("__norm"), 6).alias(
                "component"
            ),
        ),
        [vecs, mu_rows],
    )
