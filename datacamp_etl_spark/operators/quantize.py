"""Embedding quantization: per-vector int8 scalar quantization [EXT].

North-star operator (SURVEY §2.14): 100 TB of float32 embeddings is
4x the storage and shuffle of int8 codes; scalar quantization is the
standard first step of any large ANN index build (IVF/PQ pipelines
re-quantize residuals the same way).

Everything is JVM-side array lambdas (``F.transform``) over the
vector column — a narrow, shuffle-free, codegen'd projection. All
arithmetic is float64 with explicit ``floor(x + 0.5)`` rounding so
Spark and the DuckDB oracle compute bit-identical codes.

Affine scheme: ``code = floor((v - vmin) / scale + 0.5) - 128`` with
``scale = (vmax - vmin) / 255`` — codes span [-128, 127]; a constant
vector (scale 0) maps to all-zero codes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quantize_int8",
    "dequantize_int8",
    "quantization_error",
    "standardize_embeddings",
]


def quantize_int8(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Per-vector affine int8 quantization. Output columns: the id,
    ``codes array<int>``, ``vmin double``, ``scale double`` (the
    dequantization parameters)."""
    v = F.col(vec_col).cast("array<double>")
    vmin = F.array_min(v)
    vmax = F.array_max(v)
    scale = (vmax - vmin) / F.lit(255.0)
    codes = F.when(scale == 0, F.transform(v, lambda _: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: (F.floor((x - vmin) / scale + F.lit(0.5)) - 128).cast(
                "int"
            ),
        )
    )
    return df.select(
        F.col(id_col),
        codes.alias("codes"),
        vmin.alias("vmin"),
        scale.alias("scale"),
    )


def dequantize_int8(
    df: DataFrame,
    codes_col: str = "codes",
    vmin_col: str = "vmin",
    scale_col: str = "scale",
    out_col: str = "vec",
) -> DataFrame:
    """Inverse transform: ``v ~= (code + 128) * scale + vmin``."""
    rec = F.transform(
        F.col(codes_col),
        lambda c: (c.cast("double") + 128) * F.col(scale_col)
        + F.col(vmin_col),
    )
    return df.withColumn(out_col, rec)


def quantization_error(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Max absolute reconstruction error per vector (bounded by
    ``scale / 2`` — the property test for the scheme). One projection
    pass: quantize, dequantize, zip_with the original."""
    q = quantize_int8(df, vec_col, id_col)
    orig = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    both = dequantize_int8(q.join(orig, id_col))
    err = F.array_max(
        F.zip_with("vec", "__v", lambda a, b: F.abs(a - b))
    )
    return both.select(
        F.col(id_col),
        err.alias("max_abs_err"),
        (F.col("scale") / 2).alias("bound"),
    )


def standardize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    stat_decimals: int = 6,
    z_decimals: int = 4,
) -> DataFrame:
    """Per-DIMENSION z-score standardization of an embedding column —
    the feature-prep pass before distance-based ops (k-means, IVF)
    when dimensions have wildly different scales. Returns the
    unpivoted ``(id, pos, z)`` form.

    Two passes, both bounded: ``posexplode`` then a dimension-keyed
    aggregation (``dim`` rows out — 64, not corpus-sized), and the
    per-dim stats broadcast back for the normalize projection.
    Cross-engine determinism: the first and second moments are rounded
    to ``stat_decimals`` BEFORE the z computation (absorbing sum-order
    ulp drift), std is the population form ``sqrt(m2 - m1*m1)`` on the
    rounded moments, zero-variance dims emit z=0, and z rounds to
    ``z_decimals``.
    """
    unp = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))
                     ).alias("pos", "x"),
    )
    stats = unp.groupBy("pos").agg(
        F.round(F.avg("x"), stat_decimals).alias("m1"),
        F.round(F.avg(F.col("x") * F.col("x")), stat_decimals).alias("m2"),
    )
    std = F.sqrt(F.greatest(F.col("m2") - F.col("m1") * F.col("m1"),
                            F.lit(0.0)))
    return (
        unp.join(F.broadcast(stats), "pos")
        .select(
            F.col("id").alias(id_col),
            F.col("pos").cast("int"),
            (
                F.when(std == 0, F.lit(0.0)).otherwise(
                    F.round((F.col("x") - F.col("m1")) / std, z_decimals)
                )
                + F.lit(0.0)  # -0.0 + 0.0 = +0.0: one cross-engine zero
            ).alias("z"),
        )
    )
