"""Round-4 operators: boilerplate scoring, embedding standardization,
grouped percentile trim, leakage-safe splitting."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_boilerplate_ratio_flags_repeated_shingles(spark):
    from datacamp_etl_spark.operators.quality import boilerplate_ratio

    tmpl = "all rights reserved contact us today"
    rows = [(i, f"{tmpl} unique{i} words{i} here{i}") for i in range(10)]
    rows.append((99, "completely original text nothing shared at all"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in boilerplate_ratio(docs, min_docs=10).collect()
    }
    # the template's 4 shingles appear in 10 docs -> boilerplate
    assert out[0]["n_boiler"] == 4
    assert out[0]["boiler_ratio"] > 0
    assert out[99]["n_boiler"] == 0 and out[99]["boiler_ratio"] == 0.0


def test_standardize_embeddings_zero_mean_unit_var(spark):
    from datacamp_etl_spark.operators.quantize import standardize_embeddings

    rows = [(i, [float(i), 7.0]) for i in range(8)]  # dim1 constant
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = standardize_embeddings(df).collect()
    d0 = [r["z"] for r in out if r["pos"] == 0]
    d1 = [r["z"] for r in out if r["pos"] == 1]
    assert all(z == 0.0 for z in d1)  # zero-variance dim -> 0
    assert abs(sum(d0)) < 1e-3
    var = sum(z * z for z in d0) / len(d0)
    assert abs(var - 1.0) < 1e-3
    assert not any(math.copysign(1, z) < 0 and z == 0 for z in d0)  # no -0.0


def test_percentile_trim_grouped_trims_per_group(spark):
    from datacamp_etl_spark.operators.curation import percentile_trim_grouped

    rows = [(g, i, i * (g + 1)) for g in range(2) for i in range(100)]
    df = spark.createDataFrame(rows, "g int, id int, v int")
    out = percentile_trim_grouped(df, "g", "v", "id", buckets=20)
    kept = out.groupBy("g").agg(
        F.count("*").alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).collect()
    for r in kept:
        assert r["n"] == 90  # each group sheds its own 5% tails
        scale = r["g"] + 1
        assert r["lo"] == 5 * scale and r["hi"] == 94 * scale


def test_containment_catches_quote_jaccard_misses(spark):
    from datacamp_etl_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"filler{i} pad{i} more{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally unrelated content here now")],
        "doc_id long, text string",
    )
    cont = {(r["id_a"], r["id_b"]) for r in containment_pairs(docs).collect()}
    assert (1, 2) in cont          # short doc contained in long
    assert (2, 1) not in cont      # not symmetric
    assert not any(3 in p for p in cont)
    jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert not any(                # Jaccard misses the quote pair
        {r["id_a"], r["id_b"]} == {1, 2} for r in jac
    )
    # the prefix-filtered strategy is lossless (pigeonhole prune)
    pref = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(docs, strategy="prefix").collect()
    }
    assert pref == cont


def test_pack_concat_bins_respect_budget_and_order(spark, sf_dir):
    from datacamp_etl_spark.queries import QUERIES

    packed = QUERIES["pack_concat"](spark, sf_dir).collect()
    seqs = QUERIES["pack_sequences"](spark, sf_dir).collect()
    import collections

    want = collections.Counter((r["source"], r["bin_id"]) for r in seqs)
    got = {(r["source"], r["bin_id"]): r for r in packed}
    assert set(got) == set(want)
    for key, r in got.items():
        assert r["n_docs"] == want[key]
        assert r["packed"].count(" <|endofdoc|> ") == r["n_docs"] - 1
        # a bin overflows by at most one document (streaming packer)
        if r["n_docs"] > 1:
            assert r["n_tokens"] - 2048 < 2048


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    from datacamp_etl_spark.queries import QUERIES

    out = QUERIES["leakage_safe_split"](spark, sf_dir)
    leaks = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert leaks == 0
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_containment_prefix_alpha_integer_boundary(spark):
    # Float alpha = ceil(0.55 * 100) = ceil(55.000000000000007) = 56
    # shortens the prefix to 45 = |A-only shingles|; since A-only
    # shingles are globally RAREST (df=1 vs df=2 for shared), the
    # buggy prefix contains no shared shingle, the candidate is never
    # generated, and a pair with EXACTLY threshold overlap is silently
    # dropped. Integer alpha = ceil(100*5500/10000) = 55 keeps one
    # shared shingle in the prefix. Both strategies must agree.
    from datacamp_etl_spark.operators.dedup import containment_pairs

    # A: 100 distinct word 3-shingles (102 words); B shares A's first
    # 57 words -> exactly 55 shingles -> overlap ratio exactly 0.55
    words_a = [f"w{i:03d}" for i in range(102)]
    words_b = words_a[:57] + [f"z{i:03d}" for i in range(60)]
    docs = spark.createDataFrame(
        [(1, " ".join(words_a)), (2, " ".join(words_b))],
        "doc_id long, text string",
    )
    for strategy in ("expand", "prefix"):
        got = {
            (r["id_a"], r["id_b"]): (r["n_common"], r["n_a"])
            for r in containment_pairs(
                docs, threshold=0.55, strategy=strategy
            ).collect()
        }
        assert got.get((1, 2)) == (55, 100), (strategy, got)
