"""Int8 embedding quantization (operators/quantize.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.quantize import (
    dequantize_int8,
    quantization_error,
    quantize_int8,
)


def _emb(spark):
    rows = [
        (1, [0.0, 1.0, 2.0, 3.0]),
        (2, [-5.5, 5.5, 0.0, 2.75]),
        (3, [7.25, 7.25, 7.25, 7.25]),  # constant vector
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_codes_in_range_and_constant_vector_zero(spark):
    q = quantize_int8(_emb(spark), "embedding", "vec_id")
    rows = {r["vec_id"]: r for r in q.collect()}
    for r in rows.values():
        assert all(-128 <= c <= 127 for c in r["codes"])
    assert rows[3]["codes"] == [0, 0, 0, 0]
    assert rows[3]["scale"] == 0.0
    # extremes map to the ends of the code range
    assert min(rows[2]["codes"]) == -128 and max(rows[2]["codes"]) == 127


def test_reconstruction_error_bounded_by_half_scale(spark):
    err = quantization_error(_emb(spark), "embedding", "vec_id")
    for r in err.collect():
        assert r["max_abs_err"] <= r["bound"] + 1e-12


def test_roundtrip_on_real_embeddings(spark, sf_dir):
    from datacamp_etl_spark.queries import t

    emb = t(spark, sf_dir, "embeddings")
    q = quantize_int8(emb, "embedding", "vec_id")
    rec = dequantize_int8(q)
    joined = rec.join(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
        "vec_id",
    )
    bad = joined.where(
        F.array_max(F.zip_with("vec", "v", lambda a, b: F.abs(a - b)))
        > F.col("scale") / 2 + F.lit(1e-12)
    ).count()
    assert bad == 0
