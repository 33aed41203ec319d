"""Arrow-batched numpy kernels for dense-vector math [EXT].

Why UDFs here, when the repo's rule is "built-ins first": Spark's
higher-order array functions (``aggregate``/``zip_with``/
``transform``) are ``CodegenFallback`` expressions — they evaluate
INTERPRETED, per row, per element, with boxing, outside whole-stage
codegen. For scalar columns built-ins beat UDFs 10-100x; for
dense-vector folds the ranking flips: a 128-dim dot product as
``aggregate(zip_with(...))`` costs ~50 us/row interpreted, while the
same work inside an Arrow batch is one BLAS/numpy matmul row —
~0.05 us/row. Measured on this repo at sf1 (20k x 128-dim
embeddings): the within-cluster pair join of ``semantic_dedup``
spent 38+ min in ``ZipWith.eval``/``ArrayAggregate.eval`` on one
core; the same pairs through the matmul kernel complete in seconds.
SemDeDup/FAISS-style systems run exactly this shape (cluster, then
dense matmul within cluster) on BLAS/GPU — this module is that
design expressed as ``applyInPandas``/``mapInPandas``.

Float contract: numpy sums pairwise, the interpreted fold sums
left-to-right. Both engines' outputs are rounded (cosine to 6
decimals, distances to 4) before any comparison or emission, so the
~1e-15 relative summation difference is absorbed — the DuckDB
oracles hash-match either path (verified by selfcheck at sf0.01).
Ties in argmin break to the FIRST (lowest) index in both paths
(``array_position(arr, array_min(arr))`` and ``np.argmin``).

Accepted-risk bounds of that contract (documented, not hidden):

- Rounding absorbs drift except when a true value lies within
  ~1e-15 relative of a 6-decimal rounding boundary, where half-even
  (numpy) vs half-away (Spark/DuckDB) can emit adjacent values. Per
  pair that probability is ~2e-9 (boundary width / decimal step);
  cross-engine hash checks at corpus scale should therefore compare
  cosines with a 1-ulp-at-``decimals`` tolerance rather than assume
  exactness forever (at sf<=1, zero mismatches observed).
- ``assign_nearest_centroid`` takes argmin over UNROUNDED distances
  (rounding before argmin would merge genuinely distinct centroids
  at coarse ``decimals``); an ulp-level near-TIE between two
  centroids can flip cross-engine. With deterministically generated
  centroids this has never occurred in selfcheck; it is the standard
  k-means reproducibility caveat, accepted rather than papered over.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

__all__ = [
    "assign_nearest_centroid",
    "semantic_keep_by_cluster",
]

#: Row-block size for within-cluster pair matmuls: a block scores
#: B x m cosines at once (B*m*8 bytes of float64), so a degenerate
#: mega-cluster of m=100k rows peaks at ~400 MB per task instead of
#: m^2 — the kernel degrades to streaming blocks, never OOM.
_PAIR_BLOCK_ROWS = 512


def _stack(col: pd.Series, dim: int | None = None):
    """Column of array cells -> ``((m, dim) float64 matrix, valid)``.

    NULL cells and ragged rows (length != the expected ``dim``, taken
    from the first non-null cell when not given) become ZERO rows with
    ``valid=False`` instead of crashing the task — preserving the SQL
    expression paths' soft-NULL contract (NULL cosine/distance; the
    row never drops another and is never dropped) for malformed
    embedding data.
    """
    cells = []
    for v in col:
        if v is None:
            cells.append(None)
            continue
        a = np.asarray(v, dtype=np.float64)
        cells.append(a if a.ndim == 1 else None)
    if dim is None:
        dim = next((len(a) for a in cells if a is not None), 0)
    out = np.zeros((len(cells), dim), dtype=np.float64)
    valid = np.zeros(len(cells), dtype=bool)
    for i, a in enumerate(cells):
        if a is not None and len(a) == dim:
            out[i] = a
            valid[i] = True
    return out, valid


def assign_nearest_centroid(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    *,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    dist_col: str = "__dist",
) -> DataFrame:
    """Append ``(cluster, dist)`` = (argmin, min) of squared-L2
    distance to the given centroid list — the k-means / IVF assign
    step as ONE narrow ``mapInPandas`` pass (no shuffle, no join;
    centroids ride along as task-closure literals, the Spark analog
    of a broadcast variable for k x dim doubles).

    Every input column passes through, so the caller can feed the
    assigned frame straight into the mean-update aggregation without
    a join back. Ties in the argmin break to the lowest cluster id
    (``np.argmin`` returns the first minimum), matching the
    expression path ``array_position(d, array_min(d)) - 1``.
    """
    cen = np.asarray([[float(x) for x in c] for c in centroids], dtype=np.float64)
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(cluster_col, IntegerType()),
            StructField(dist_col, DoubleType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v, ok = _stack(pdf[vec_col], dim=cen.shape[1])
            d2 = np.empty((len(pdf), len(cen)), dtype=np.float64)
            # per-centroid loop keeps the temp at m x dim (not
            # m x k x dim) and the float semantics a plain
            # sum-of-squares — no expanded-identity cancellation
            for j in range(len(cen)):
                diff = v - cen[j]
                d2[:, j] = np.einsum("ij,ij->i", diff, diff)
            pdf = pdf.copy()
            cl = pd.array(d2.argmin(axis=1), dtype="Int32")
            di = pd.array(d2.min(axis=1), dtype="Float64")
            cl[~ok] = pd.NA  # null/ragged vector -> NULL cluster/dist
            di[~ok] = pd.NA
            pdf[cluster_col] = cl
            pdf[dist_col] = di
            yield pdf[in_cols + [cluster_col, dist_col]]

    return df.mapInPandas(kernel, schema=out_schema)


def semantic_keep_by_cluster(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "__v",
    cluster_col: str = "cluster",
    threshold: float = 0.45,
    decimals: int = 6,
) -> DataFrame:
    """Within-cluster semantic-dedup verdicts: for each cluster group,
    ``keep`` is False iff some SAME-CLUSTER row with a smaller id has
    cosine similarity >= ``threshold`` (cosine rounded to
    ``decimals`` first — the engine-portable contract).

    One ``applyInPandas`` over ``groupBy(cluster)``: the executor
    computes the cluster's pair cosines as blocked unit-vector
    matmuls (see ``_PAIR_BLOCK_ROWS`` for the memory bound) instead
    of a self-join evaluating an interpreted array fold per pair.
    Zero-norm vectors have NULL cosine by contract: they never drop
    another row and are never dropped (masked out of both matmul
    sides, independent of the threshold's sign).

    Returns ``(id_col, cluster, keep)``.
    """
    id_field = emb.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField(cluster_col, IntegerType()),
            StructField("keep", BooleanType()),
        ]
    )

    def kernel(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        m = len(pdf)
        v, ok = _stack(pdf[vec_col])
        norms = np.sqrt(np.einsum("ij,ij->i", v, v))
        # null/ragged cells behave exactly like zero-norm rows:
        # NULL cosine -> never drop another row, never be dropped
        valid = ok & (norms != 0.0)
        unit = np.zeros_like(v)
        unit[valid] = v[valid] / norms[valid, None]
        dropped = np.zeros(m, dtype=bool)
        for lo in range(0, m, _PAIR_BLOCK_ROWS):
            hi = min(lo + _PAIR_BLOCK_ROWS, m)
            if lo == 0 and hi == 1:
                continue
            sims = np.round(unit[lo:hi] @ unit.T, decimals)
            hit = (sims >= threshold) & valid[None, :]
            # only columns j strictly before the global row index count
            col_idx = np.arange(m)[None, :]
            row_idx = np.arange(lo, hi)[:, None]
            hit &= col_idx < row_idx
            dropped[lo:hi] = hit.any(axis=1) & valid[lo:hi]
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                cluster_col: pdf[cluster_col].astype("Int32"),
                "keep": ~dropped,
            }
        )

    return (
        emb.select(id_col, vec_col, cluster_col)
        .groupBy(cluster_col)
        .applyInPandas(kernel, schema=out_schema)
    )
