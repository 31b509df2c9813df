"""Vectorized (Arrow + numpy) kernels for IVF-PQ coding, probing and
Lloyd assignment at LARGE cell counts — the r10 scale defect's fix.

The folded-literal SQL kernels in operators/similarity.py (`_ivf_sql`,
`_pq_sub_argmin`, `_lloyd_assign`) are the right shape at gate
geometry: compact higher-order-function folds, narrow, oracle-
replayable. But HOFs always evaluate interpreted, and the r10 sf100
ladder measured the n_cells=256 cell-scores expression at ~40 ms/row
(jstack: ArrayTransform/ArrayAggregate.eval + per-centroid BigDecimal
Round) — past ~64 centroids the unrolled form also exceeds janino's
64 KB codegen method limit (COVERAGE r10 adjudication), so exactly the
geometries SemDeDup's n_cells ≈ corpus/250 rule REQUIRES at scale fall
off every JVM fast path. This module replaces the hot stage with an
Arrow-batched numpy kernel behind ``mapInPandas``: no expression-size
ceiling (centroids ride as plain arrays in the task closure, so
n_cells can follow the corpus), SIMD arithmetic instead of
per-element interpretation, and — critically — BIT-IDENTICAL results
to the SQL kernels, so every stored code, probe set and oracle row is
unchanged whichever path ran.

Bit-exactness contract (pinned in tests/test_veccode.py):

- **Sequential accumulation.** The SQL folds accumulate strictly
  left-to-right in double: ``((0 + x₀·y₀) + x₁·y₁) + …``. numpy's
  ``dot``/``sum`` use pairwise/SIMD association and may differ in the
  last ulp, so every value that LEAVES a kernel is produced by
  per-dimension vectorized updates (``acc += x[:, d] * c[d]`` — each
  elementwise op one IEEE-exact instruction, same order as the fold).
- **Exact Spark ``round(x, 6)``.** Spark rounds HALF_UP on the
  SHORTEST DECIMAL REPR of the double (BigDecimal.valueOf →
  setScale(6, HALF_UP)). :func:`round6` reproduces it: a vectorized
  scaled-rint bulk path (provably equal off the .5 boundary) plus a
  ``decimal.Decimal(repr(x))`` fixup for the measure-zero boundary
  band. ``-0.0`` outputs normalize to ``+0.0`` exactly as BigDecimal's
  do (Spark's double ordering puts -0.0 < 0.0, so the sign matters
  for tie-breaks).
- **Fast path + exact fixup for SELECTION.** Cell scores are never
  emitted — only their rounded ORDER is consumed (argmax for
  assignment, top-n_probe for probes, argmin for Lloyd). The kernel
  computes a BLAS matmul fast score, then re-derives the sequential-
  exact score ONLY for cells within (1e-6 + error-bound) of the
  selection boundary — every cell whose rounded value could possibly
  tie across the boundary, by monotonicity of rounding — and decides
  on those exactly. Emitted VALUES (ADC lookup tables, norms) are
  always computed on the exact sequential path (they are small:
  n_sub × n_codes per query, one norm per row).

Dispatch rule: the SQL folds stay the implementation at gate geometry
(n_cells ≤ 64 — measured fast, zero Python-worker overhead, and the
path every oracled catalog query pins); :func:`use_np` switches to
this module above it. Routing is a pure performance decision — both
paths produce identical bytes — mirroring hamming_index's hot-value
routing contract.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# folded-literal SQL ceiling: above this cell count the HOF fold is
# interpreted-slow AND the unrolled form exceeds janino's 64 KB method
# limit (COVERAGE r10) — route through the numpy kernels
SQL_CELLS_CEILING = 64

# margin added to the 1e-6 rounding-tie band when selecting which
# cells need the sequential-exact recompute: generous vs the ~1e-14
# relative error of a 64-dim BLAS dot (scaled by magnitude terms for
# the squared-distance identity's cancellation)
_FAST_ERR = 1e-8


def use_np(n_cells: int) -> bool:
    return n_cells > SQL_CELLS_CEILING


# ---------------------------------------------------------------------------
# exact Spark round(x, 6)
# ---------------------------------------------------------------------------

def round6(a: np.ndarray) -> np.ndarray:
    """Exact replication of Spark's ``round(col, 6)`` on DoubleType
    (BigDecimal.valueOf(d).setScale(6, HALF_UP).doubleValue()) over a
    float64 array. Vectorized off the half boundary; Decimal fixup on
    it. Non-finite values pass through unchanged."""
    import decimal

    a = np.asarray(a, dtype=np.float64)
    y = a * 1e6
    finite = np.isfinite(y)
    # bulk: nearest integer then correctly-rounded division — equal to
    # the BigDecimal result whenever the scaled value is farther from
    # a .5 boundary than the scaling error (|y| ≤ 1e12 ⇒ ulp ≤ 2e-4…
    # but the fixup band is 1e-5, so widen the risky set for huge y)
    k = np.rint(y)
    frac = y - np.floor(y)
    risky = finite & (
        (np.abs(frac - 0.5) < 1e-5) | (np.abs(y) > 1e10)
    )
    with np.errstate(invalid="ignore"):
        out = np.where(finite, k / 1e6, a)
    # normalize -0.0 → +0.0 (BigDecimal never yields -0.0; Spark's
    # struct ordering distinguishes the sign)
    out = out + 0.0
    if risky.any():
        q = decimal.Decimal("0.000001")
        flat = out.ravel()
        src = a.ravel()
        for i in np.flatnonzero(risky.ravel()):
            flat[i] = float(
                decimal.Decimal(repr(float(src[i]))).quantize(
                    q, rounding=decimal.ROUND_HALF_UP
                )
            )
        out = flat.reshape(a.shape)
    return out


# ---------------------------------------------------------------------------
# sequential-exact primitives (the SQL fold's association order)
# ---------------------------------------------------------------------------

def _seq_norms(x64: np.ndarray) -> np.ndarray:
    """sqrt(Σ x_d²) accumulated left-to-right — bit-identical to
    ``l2_norm`` / ``norm_sql``. (n, dim) → (n,)."""
    acc = np.zeros(x64.shape[0], dtype=np.float64)
    for dd in range(x64.shape[1]):
        col = x64[:, dd]
        acc += col * col
    return np.sqrt(acc)


def _seq_dots_pairs(xg: np.ndarray, cg: np.ndarray) -> np.ndarray:
    """Sequential dot per (row, cell) PAIR — the exact-fixup gather
    path. (m, dim) × (m, dim) → (m,)."""
    acc = np.zeros(xg.shape[0], dtype=np.float64)
    for dd in range(xg.shape[1]):
        acc += xg[:, dd] * cg[:, dd]
    return acc


def _seq_sqdists_pairs(xg: np.ndarray, cg: np.ndarray) -> np.ndarray:
    """Sequential Σ (x_d − c_d)² per pair — exact-fixup for Lloyd /
    PQ distances."""
    acc = np.zeros(xg.shape[0], dtype=np.float64)
    for dd in range(xg.shape[1]):
        diff = xg[:, dd] - cg[:, dd]
        acc += diff * diff
    return acc


def _seq_sqdists_small(x64: np.ndarray, book: np.ndarray) -> np.ndarray:
    """Sequential Σ (x_d − c_d)² against a SMALL codebook, all pairs:
    (n, d) × (k, d) → (n, k). Exact everywhere (used where the values
    themselves are emitted — ADC LUTs — or k is small)."""
    n, d = x64.shape
    k = book.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for dd in range(d):
        diff = x64[:, dd][:, None] - book[:, dd][None, :]
        acc += diff * diff
    return acc


# ---------------------------------------------------------------------------
# selection kernels: fast score + exact boundary fixup
# ---------------------------------------------------------------------------

def _exact_scores_at(
    x64: np.ndarray, cents64: np.ndarray, cnorms: np.ndarray,
    nv: np.ndarray, rows: np.ndarray, cols: np.ndarray,
) -> np.ndarray:
    """Rounded cosine scores — the SQL ``csim`` — for scattered
    (row, cell) pairs, on the sequential-exact path."""
    dots = _seq_dots_pairs(x64[rows], cents64[cols])
    return round6(dots / (nv[rows] * cnorms[cols]))


def top_cells(
    x64: np.ndarray,
    cents64: np.ndarray,
    cnorms: np.ndarray,
    n_top: int,
    nv: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Per row, the ``n_top`` cell INDICES ordered by
    (round6(cosine) desc, index asc) — exactly
    ``slice(transform(sort_array(cell_scores, false), s -> s.cent_id),
    1, n_top)`` over `_ivf_sql`'s scores. Returns (indices (n, p),
    norms (n,)) with p = min(n_top, n_cells).

    Fast BLAS scores select a candidate band around the p-th value;
    candidates are re-scored on the sequential-exact path and the
    final order decided on exact rounded values (rounding is monotone,
    so no cell outside the band can reach the top p)."""
    n, _dim = x64.shape
    k = cents64.shape[0]
    p = min(n_top, k)
    if nv is None:
        nv = _seq_norms(x64)
    if np.any(nv == 0.0) or np.any(cnorms == 0.0):
        raise ValueError(
            "zero-norm vector or centroid reached the numpy cell-score "
            "kernel; the SQL path's divide-by-zero semantics are not "
            "replicated — filter empty/zero vectors upstream"
        )
    fast = (x64 @ cents64.T) / (nv[:, None] * cnorms[None, :])
    # p-th largest fast score per row (selection boundary)
    if p < k:
        kth = np.partition(fast, k - p, axis=1)[:, k - p]
    else:
        kth = np.full(n, -np.inf)
    band = fast >= (kth - (1e-6 + 2 * _FAST_ERR))[:, None]
    rows, cols = np.nonzero(band)
    exact = _exact_scores_at(x64, cents64, cnorms, nv, rows, cols)
    # order candidates per row by (exact desc, idx asc); stable sort on
    # -exact keeps the ascending col order produced by nonzero
    order = np.lexsort((cols, -exact, rows))
    rows_s, cols_s = rows[order], cols[order]
    starts = np.searchsorted(rows_s, np.arange(n))
    counts = np.diff(np.append(starts, rows_s.size))
    if np.any(counts < p):
        raise AssertionError("candidate band narrower than n_top")
    take = (starts[:, None] + np.arange(p)[None, :]).ravel()
    return cols_s[take].reshape(n, p), nv


def assign_cells(
    x64: np.ndarray,
    cents64: np.ndarray,
    cnorms: np.ndarray,
    nv: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row argmax cell index by (round6(cosine) desc, index asc) —
    exactly ``array_max(cell_scores).cent_id``. Returns (idx, norms)."""
    top, nv = top_cells(x64, cents64, cnorms, 1, nv)
    return top[:, 0], nv


def lloyd_assign_cells(x64: np.ndarray, cents64: np.ndarray) -> np.ndarray:
    """Per-row argmin cell index by (round6(Σ(x−c)²) asc, index asc) —
    exactly similarity._lloyd_assign's folded struct argmax. Fast path
    uses the expanded identity ‖x‖² − 2x·c + ‖c‖² (BLAS); its
    cancellation error scales with the magnitudes, so the exact band
    is widened by a magnitude-proportional bound before the
    sequential-exact fixup decides."""
    n = x64.shape[0]
    x2 = np.einsum("ij,ij->i", x64, x64)
    c2 = np.einsum("ij,ij->i", cents64, cents64)
    fast = x2[:, None] - 2.0 * (x64 @ cents64.T) + c2[None, :]
    err = _FAST_ERR * (1.0 + x2 + c2.max() if c2.size else 1.0)
    dmin = fast.min(axis=1)
    band = fast <= (dmin + 1e-6 + 2 * err)[:, None]
    rows, cols = np.nonzero(band)
    exact = round6(_seq_sqdists_pairs(x64[rows], cents64[cols]))
    order = np.lexsort((cols, exact, rows))
    rows_s, cols_s = rows[order], cols[order]
    starts = np.searchsorted(rows_s, np.arange(n))
    return cols_s[starts]


def pq_code_cols(x64: np.ndarray, books64: list[np.ndarray]) -> list[np.ndarray]:
    """Per-subspace PQ code (argmin by round6(Σ(x−c)²) asc, idx asc) —
    exactly `_pq_sub_argmin`. Codebooks are small (n_codes ≲ 64), so
    every distance runs the exact path; np.argmin takes the first
    (lowest-index) minimum, matching the negidx tie-break."""
    codes = []
    d = books64[0].shape[1]
    for s, book in enumerate(books64):
        dists = round6(_seq_sqdists_small(x64[:, s * d:(s + 1) * d], book))
        codes.append(np.argmin(dists, axis=1).astype(np.int32))
    return codes


def adc_lut(x64: np.ndarray, books64: list[np.ndarray]) -> np.ndarray:
    """Per-row ADC lookup table — round6 subvector→codeword squared
    distances, exactly `_pq_adc_lut_sql`. (n, dim) → (n, n_sub,
    n_codes) float64; every entry exact (these are EMITTED values the
    decimal ADC sum consumes)."""
    d = books64[0].shape[1]
    luts = [
        round6(_seq_sqdists_small(x64[:, s * d:(s + 1) * d], book))
        for s, book in enumerate(books64)
    ]
    return np.stack(luts, axis=1)


# ---------------------------------------------------------------------------
# DataFrame-level kernels (mapInPandas)
# ---------------------------------------------------------------------------

def _cell_dtype(cent_ids: list) -> T.DataType:
    """The Spark type the folded-literal path gives the ``cell``
    column: integral literals unify to INT unless any needs 64 bits;
    string ids stay strings (matching `_ivf_sql._id_lit`)."""
    if all(isinstance(c, str) for c in cent_ids):
        return T.StringType()
    if all(-(2**31) <= int(c) < 2**31 for c in cent_ids):
        return T.IntegerType()
    return T.LongType()


def _stack(series) -> np.ndarray:
    """pandas Series of float arrays → (n, dim) float64 (float→double
    widening is exact, matching the SQL cast)."""
    return np.asarray(np.stack(series.to_numpy()), dtype=np.float64)


def _split_cents(cents) -> tuple[list, np.ndarray, np.ndarray]:
    """(cid, vec, norm) triples → (ids, vecs (k, dim) f64, norms f64).
    Norms arrive precomputed from `_with_norms`, exactly the folded
    ``c.cnorm`` literals."""
    ids = [c[0] for c in cents]
    vecs = np.asarray([c[1] for c in cents], dtype=np.float64)
    norms = np.asarray([c[2] for c in cents], dtype=np.float64)
    return ids, vecs, norms


def coded_np(
    vecs: DataFrame,
    cents,
    books,
    d: int,
    n_sub: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Numpy twin of pq_index._coded — (id, cell, code_*) in one
    Arrow-batched narrow stage, bit-identical to the folded-literal
    plan (pinned in tests/test_veccode.py), with no expression-size
    ceiling on n_cells."""
    cent_ids, cents64, cnorms = _split_cents(cents)
    books64 = [np.asarray(b, dtype=np.float64) for b in books]
    id_field = vecs.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("cell", _cell_dtype(cent_ids)),
            *[T.StructField(f"code_{s}", T.IntegerType()) for s in range(n_sub)],
        ]
    )
    id_is_str = isinstance(out_schema["cell"].dataType, T.StringType)

    def _fn(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x64 = _stack(pdf[vec_col])
            idx, _nv = assign_cells(x64, cents64, cnorms)
            codes = pq_code_cols(x64, books64)
            data = {id_col: pdf[id_col].to_numpy()}
            if id_is_str:
                data["cell"] = [cent_ids[j] for j in idx]
            else:
                data["cell"] = np.asarray(
                    [cent_ids[j] for j in idx],
                    dtype=np.int64,
                )
            for s in range(n_sub):
                data[f"code_{s}"] = codes[s]
            yield pd.DataFrame(data)

    return vecs.select(id_col, vec_col).mapInPandas(_fn, out_schema)


def probes_np(
    queries: DataFrame,
    cents,
    books,
    d: int,
    n_probe: int,
    query_id_col: str,
    vec_col: str,
) -> DataFrame:
    """Numpy twin of similarity._pq_probes — one row per (query,
    probed cell) carrying (__qvec, __nq, __lut, cell), bit-identical
    values and probe sets."""
    cent_ids, cents64, cnorms = _split_cents(cents)
    books64 = [np.asarray(b, dtype=np.float64) for b in books]
    qid_field = queries.schema[query_id_col]
    vec_field = queries.schema[vec_col]
    cell_dt = _cell_dtype(cent_ids)
    out_schema = T.StructType(
        [
            T.StructField(query_id_col, qid_field.dataType),
            T.StructField("__qvec", vec_field.dataType),
            T.StructField("__nq", T.DoubleType()),
            T.StructField(
                "__lut", T.ArrayType(T.ArrayType(T.DoubleType()))
            ),
            T.StructField("cell", cell_dt),
        ]
    )
    id_is_str = isinstance(cell_dt, T.StringType)

    def _fn(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            x64 = _stack(pdf[vec_col])
            top, nv = top_cells(x64, cents64, cnorms, n_probe)
            lut = adc_lut(x64, books64)
            p = top.shape[1]
            rep = np.repeat(np.arange(n), p)
            flat = top.ravel()
            data = {
                query_id_col: pdf[query_id_col].to_numpy()[rep],
                "__qvec": pdf[vec_col].to_numpy()[rep],
                "__nq": nv[rep],
                "__lut": [lut[i].tolist() for i in rep],
            }
            if id_is_str:
                data["cell"] = [cent_ids[j] for j in flat]
            else:
                data["cell"] = np.asarray(
                    [cent_ids[j] for j in flat], dtype=np.int64
                )
            yield pd.DataFrame(data)

    return queries.select(query_id_col, vec_col).mapInPandas(_fn, out_schema)


def lloyd_assign_np(df: DataFrame, cents: list[list[float]], vec_col: str) -> DataFrame:
    """Numpy twin of similarity._lloyd_assign: appends the squared-
    Euclidean argmin ``cell`` (int) to the frame, all other columns
    passed through."""
    cents64 = np.asarray(cents, dtype=np.float64)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("cell", T.IntegerType())]
    )

    def _fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x64 = _stack(pdf[vec_col])
            pdf = pdf.copy()
            pdf["cell"] = lloyd_assign_cells(x64, cents64).astype(np.int32)
            yield pdf

    return df.mapInPandas(_fn, out_schema)
