"""Data selection via importance resampling (DSIR) [EXT].

The Xie et al. 2023 recipe (arXiv:2302.03169) for choosing
pretraining documents that LOOK LIKE a small high-quality target set:
fit two bag-of-hashed-n-gram unigram models — one on the target
documents, one on the raw pool — and score every pool document by its
log importance ratio ``sum_f count_f(doc) * (ln p_target(f) -
ln p_raw(f))``. High-ratio documents are distributionally closest to
the target; selection is then a top-k (the deterministic variant) or
Gumbel-noise sampling (the paper's randomized variant — equivalent to
top-k on ``weight + noise``).

Engine shape (100 TB posture):

- Features are hashed unigrams + bigrams (``hash32 % buckets``) — the
  model is a BOUNDED table of at most ``buckets`` rows per side, no
  vocabulary explosion, no driver collect.
- Fitting is two map-side-combinable count aggregations over the
  exploded feature instances; the per-side totals are one scalar row
  broadcast onto the bounded bucket table (never onto fact rows).
- Scoring joins the ≤``buckets``-row log-ratio table (broadcast hash
  join) back onto per-document feature counts and sums — one explode,
  three aggregated shuffles, zero UDFs, zero Python in the data plane.
- ``hash32`` is the md5-prefix hash, so the whole computation is
  expressible identically in any SQL engine (oracle-replayable).

Laplace smoothing (+1 per bucket) keeps every ratio finite — a
feature seen only in the pool gets a finite negative contribution,
not ``-inf``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datacamp_etl_spark.operators.sketch import hash32
from datacamp_etl_spark.operators.spread import ensure_parallelism, scoped_cache
from datacamp_etl_spark.operators.text import tokens

__all__ = ["hashed_ngram_features", "dsir_weights"]


def hashed_ngram_features(text_col: Column | str, buckets: int) -> Column:
    """Array of hashed unigram+bigram feature buckets (with
    multiplicity) for one document: each whitespace token and each
    adjacent-token pair, hashed via :func:`hash32` into
    ``[0, buckets)``. Empty/one-token docs yield the unigrams they
    have (possibly an empty array) — never NULL."""
    toks = tokens(text_col)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(toks, bigrams), lambda t: hash32(t) % buckets
    )


def dsir_weights(
    df: DataFrame,
    target_pred: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    decimals: int = 6,
) -> DataFrame:
    """Per-document DSIR log importance weight of every document in
    ``df`` (the raw pool), toward the target distribution defined by
    the rows where ``target_pred`` holds.

    Returns ``(id_col, n_feats, log_weight)`` for EVERY pool document:
    ``n_feats`` is the hashed unigram+bigram instance count and
    ``log_weight = sum_f c_f(doc) * (ln p_t(f) - ln p_r(f))`` with
    Laplace-smoothed per-bucket proportions
    ``p(f) = (count(f) + 1) / (total + buckets)``. Feature-less
    documents report ``(0, 0.0)`` — never NULL, so a downstream
    ``ORDER BY log_weight DESC LIMIT k`` (deterministic selection) or
    Gumbel-perturbed variant always sees every candidate. Rounded to
    the repo-wide 6 decimals after the integer-count fold.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    feats = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        target_pred.alias("__t"),
        F.explode(hashed_ngram_features(text_col, buckets)).alias("__f"),
    )
    # Fold the exploded instances straight into the (doc, feature)
    # count table and cache THAT: one map-side-combined shuffle over
    # the explosion instead of materializing every feature instance
    # in the cache and scanning it three times (raw margin, target
    # margin, per-doc fold). ``__t`` is constant per document, so
    # max() carries it through the fold unchanged and both margins
    # are exact integer sums of the per-doc counts.
    pf = scoped_cache(
        feats.groupBy("__id", "__f").agg(
            F.count("*").alias("__c"), F.max("__t").alias("__t")
        )
    )
    raw = pf.groupBy("__f").agg(F.sum("__c").alias("__cr"))
    tgt = (
        pf.where("__t").groupBy("__f").agg(F.sum("__c").alias("__ct"))
    )
    model = raw.join(tgt, "__f", "left").select(
        "__f",
        F.col("__cr"),
        F.coalesce("__ct", F.lit(0)).alias("__ct"),
    )
    # per-side totals: one scalar row broadcast onto the <=buckets-row
    # model table (never onto document rows)
    totals = model.agg(
        F.sum("__cr").alias("__nr"), F.sum("__ct").alias("__nt")
    )
    ratio = model.crossJoin(F.broadcast(totals)).select(
        "__f",
        (
            F.log(F.col("__ct") + 1)
            - F.log(F.col("__nt") + buckets)
            - F.log(F.col("__cr") + 1)
            + F.log(F.col("__nr") + buckets)
        ).alias("__lr"),
    )
    per_doc = (
        pf.join(F.broadcast(ratio), "__f")
        .groupBy("__id")
        .agg(
            F.sum("__c").cast("long").alias("n_feats"),
            F.round(F.sum(F.col("__c") * F.col("__lr")), decimals).alias(
                "log_weight"
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )
