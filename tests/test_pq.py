"""Product quantization (operators/pq.py): structure + recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.pq import pq_encode, pq_topk, pq_train


def _emb(spark, sf_dir):
    from datacamp_etl_spark.queries import t

    return t(spark, sf_dir, "embeddings")


def test_encode_shape_and_range(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    books = pq_train(emb, m=4, k=4, n_iter=0, dim=64)
    assert len(books) == 4 and all(len(b) == 4 for b in books)
    assert all(len(c) == 16 for b in books for c in b)
    codes = pq_encode(emb, books).collect()
    assert all(len(r["codes"]) == 4 for r in codes)
    assert all(0 <= c <= 3 for r in codes for c in r["codes"])


def test_lloyd_reduces_distortion(spark, sf_dir):
    emb = _emb(spark, sf_dir)

    def distortion(books):
        codes = pq_encode(emb, books)
        # reconstruct: concat chosen centroids; mean squared error
        recon = F.flatten(
            F.array(*[
                F.element_at(
                    F.lit(books[s]).cast("array<array<double>>"),
                    F.element_at("codes", s + 1) + 1,
                )
                for s in range(4)
            ])
        )
        joined = codes.join(emb, "vec_id").select(
            F.aggregate(
                F.zip_with(
                    recon,
                    F.col("embedding").cast("array<double>"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("se")
        )
        return joined.agg(F.avg("se")).collect()[0][0]

    d0 = distortion(pq_train(emb, m=4, k=4, n_iter=0, dim=64))
    d2 = distortion(pq_train(emb, m=4, k=4, n_iter=2, dim=64))
    assert d2 < d0  # Lloyd refinement must reduce reconstruction MSE


def test_adc_recall_vs_brute_force(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    # uniform-random embeddings are PQ's worst case (no cluster
    # structure) — 16 subspaces of 4 dims keep per-cell distortion
    # low enough for a meaningful recall bar
    books = pq_train(emb, m=16, k=8, n_iter=2, dim=64)
    codes = pq_encode(emb, books)
    qrow = emb.orderBy("vec_id").first()
    query = [float(x) for x in qrow["embedding"]]

    exact = emb.select(
        "vec_id",
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.lit(query).cast("array<double>"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("d"),
    ).orderBy("d", "vec_id").limit(10)
    exact_ids = {r["vec_id"] for r in exact.collect()}

    approx = pq_topk(codes, books, query, topk=50)
    approx_ids = {r["vec_id"] for r in approx.collect()}
    # deterministic setup: measured 7/10 recall@50 on this data
    assert qrow["vec_id"] in approx_ids
    assert len(exact_ids & approx_ids) >= 5
