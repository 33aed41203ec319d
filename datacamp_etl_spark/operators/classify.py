"""Closed-form distributed classifiers for corpus curation [EXT].

No counterpart in the reference (Stiivi/Datacamp-ETL has no ML
surface; its closest analog is the SQL-side derived columns of
``loading.rb``); the algorithm is the public multinomial Naive Bayes
of McCallum & Nigam 1998 ("A Comparison of Event Models for Naive
Bayes Text Classification") — the standard cheap corpus-quality /
language / domain classifier that pipelines like CCNet and fastText
replace with a learned linear model. NB's training step is PURE
AGGREGATION, which makes it the one text classifier whose train AND
score phases are both fully expressible as DataFrame ops — no
driver-side optimization loop, no UDF, and an exact DuckDB oracle.

Design for 100 TB:

- **Training is two aggregated shuffles**: class priors
  (``groupBy(label).count()`` over documents) and add-one-smoothed
  token likelihoods (``groupBy(token, label).count()`` over the token
  stream, map-side combinable). The model NEVER materializes
  driver-side — likelihood rows stay a DataFrame keyed by token, so a
  100 TB corpus with a 100M-token vocabulary trains without any
  bounded-collect assumption.
- **Scoring is one equi-join**: the document token stream joins the
  likelihood table on ``token`` (both sides shuffle-partitioned by
  token; AQE broadcasts the model side when the vocabulary is small),
  then one ``groupBy(doc_id, label)`` partial-aggregated sum and a
  size-``|classes|`` max-struct argmax per document. Out-of-vocab
  tokens contribute the smoothing floor ``ln(alpha) -
  ln(class_tokens + alpha*V)`` via the join's null branch, so the
  join stays an OUTER-free left join over the per-class expansion.
- **Determinism** (so the oracle hash-matches): scores are a sum of
  ``ln`` terms rounded only at the FINAL projection (6 decimals, the
  repo-wide float contract); argmax ties break to the
  lexicographically smallest label via the max-struct trick with a
  descending-safe label key.

The self-train/self-score shape registered in ``queries.py``
(``nb_language_scores``) is the standard pipeline smoke: training a
model on the corpus it scores is exactly what perplexity filtering
(``text.bigram_lm_scores``) already does, and it exercises every
phase without needing a second labeled fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datacamp_etl_spark.operators.text import normalize_text

__all__ = [
    "nb_train",
    "nb_score",
    "nb_classify",
    "hashed_presence_features",
    "logistic_train",
    "logistic_score",
]


def _token_stream(
    docs: DataFrame, *, id_col: str, text_col: str, label_col: str | None
) -> DataFrame:
    """(doc_id[, label], token) — one row per token OCCURRENCE of the
    normalized text; empty documents contribute no rows."""
    cols = [F.col(id_col)]
    if label_col is not None:
        cols.append(F.col(label_col))
    norm = docs.select(*cols, normalize_text(F.col(text_col)).alias("__n"))
    return norm.where(F.col("__n") != "").select(
        *[c for c in (id_col, label_col) if c is not None],
        F.explode(F.split("__n", " ")).alias("token"),
    )


def nb_train(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    alpha: float = 1.0,
) -> dict[str, DataFrame]:
    """Train a multinomial NB model; returns three DataFrames (the
    model stays distributed — nothing is collected):

    - ``priors``: (label, log_prior, log_floor) — one row per class;
      ``log_floor = ln(alpha) - ln(class_tokens + alpha*V)`` is the
      likelihood of any token unseen in that class.
    - ``likelihood``: (token, label, log_like) — only observed
      (token, class) pairs; absent pairs take the class floor.
    - ``vocab``: 1-row (v) — the smoothing denominator's vocabulary
      size, kept for introspection/tests.

    Edge case, by design: a class whose training documents are ALL
    empty (zero tokens after normalization) is dropped from the model
    — ``priors`` inner-joins the per-class token counts, so the class
    contributes no prior and can never be predicted. Rationale: its
    ``class_tokens`` is 0, so every token would score the bare floor
    ``ln(alpha) - ln(alpha*V)``, which is GREATER than any trained
    class's floor — an all-empty label (usually a data bug) would
    otherwise win every unseen-token argmax. The oracle SQL replays
    the same inner join. Pinned by
    ``test_nb_train_drops_tokenless_class``.
    """
    from datacamp_etl_spark.operators.spread import scoped_cache

    toks = _token_stream(
        docs, id_col=id_col, text_col=text_col, label_col=label_col
    )
    # ONE pass over the token stream: fold it to the (token, label)
    # count table and cache that (vocab x classes bounded) — the
    # vocabulary scalar, per-class token totals and the likelihood
    # table all derive from it, where computing each directly from
    # ``toks`` re-ran the tokenizer + explode once per consumer
    # (3 full corpus passes in the training plan alone).
    tl = scoped_cache(
        toks.groupBy("token", label_col).agg(F.count("*").alias("tc"))
    )
    # |V| — global distinct-token count: a single scalar, broadcast as
    # a 1-row crossJoin (same bounded pattern as lm_perplexity_scores).
    vocab = tl.agg(F.countDistinct("token").alias("v"))
    class_tokens = tl.groupBy(label_col).agg(
        F.sum("tc").alias("class_tokens")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    priors = (
        docs.groupBy(label_col)
        .agg(F.count("*").alias("class_docs"))
        .crossJoin(n_docs)
        .join(class_tokens, label_col)
        .crossJoin(vocab)
        .select(
            label_col,
            (F.log("class_docs") - F.log("n_docs")).alias("log_prior"),
            (
                F.log(F.lit(float(alpha)))
                - F.log(F.col("class_tokens") + alpha * F.col("v"))
            ).alias("log_floor"),
            "class_tokens",
            "v",
        )
    )
    likelihood = (
        tl.join(class_tokens, label_col)
        .crossJoin(vocab)
        .select(
            "token",
            label_col,
            (
                F.log(F.col("tc") + F.lit(float(alpha)))
                - F.log(F.col("class_tokens") + alpha * F.col("v"))
            ).alias("log_like"),
        )
    )
    return {
        "priors": priors.drop("class_tokens", "v"),
        "likelihood": likelihood,
        "vocab": vocab,
    }


def nb_score(
    docs: DataFrame,
    model: dict[str, DataFrame],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Per-(document, class) log-posterior: (doc_id, label, score).

    One token-stream/likelihood left join per class-expansion row:
    the token stream crossJoins the (bounded, |classes|-row) priors
    table so every token scores under EVERY class, takes the observed
    ``log_like`` where the (token, class) pair was seen in training
    and the class ``log_floor`` otherwise, then one partial-aggregated
    ``groupBy(doc, class)`` sum adds the prior. Empty documents score
    ``log_prior`` alone (they re-enter via the final right join with
    n_tokens = 0)."""
    toks = _token_stream(
        docs, id_col=id_col, text_col=text_col, label_col=None
    )
    priors = model["priors"]
    ml = model["likelihood"].select(
        F.col("token").alias("__mt"),
        F.col(label_col).alias("__ml"),
        "log_like",
    )
    expanded = (
        toks.crossJoin(F.broadcast(priors.select(label_col, "log_floor")))
        .join(
            ml,
            (F.col("token") == F.col("__mt"))
            & (F.col(label_col) == F.col("__ml")),
            "left",
        )
        .select(
            F.col(id_col),
            F.col(label_col),
            F.coalesce("log_like", "log_floor").alias("ll"),
        )
    )
    per_class = expanded.groupBy(id_col, label_col).agg(
        F.sum("ll").alias("sum_ll"), F.count("*").alias("n_tokens")
    )
    # Re-enter empty docs (no tokens): every class at its prior.
    base = docs.select(id_col).crossJoin(
        F.broadcast(priors.select(label_col, "log_prior"))
    )
    return base.join(per_class, [id_col, label_col], "left").select(
        id_col,
        label_col,
        (F.col("log_prior") + F.coalesce("sum_ll", F.lit(0.0))).alias(
            "score"
        ),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
    )


def nb_classify(
    docs: DataFrame,
    model: dict[str, DataFrame] | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    alpha: float = 1.0,
    decimals: int = 6,
) -> DataFrame:
    """End-to-end classify: (doc_id, predicted, nb_score, n_tokens).

    ``model=None`` self-trains on ``docs`` (the registered smoke
    shape). The argmax is a size-|classes| ``max_by`` per document on
    the ROUNDED score — rounding before the argmax pins the
    prediction against sub-1e-6 cross-engine float drift — with ties
    to the lexicographically smallest label."""
    if model is None:
        model = nb_train(
            docs,
            id_col=id_col,
            text_col=text_col,
            label_col=label_col,
            alpha=alpha,
        )
    scored = nb_score(
        docs, model, id_col=id_col, text_col=text_col, label_col=label_col
    ).select(
        id_col,
        label_col,
        F.round("score", decimals).alias("r_score"),
        "n_tokens",
    )
    # argmax via max(struct): score ASC then label DESC, so the max
    # struct is (highest score, lexicographically smallest label) —
    # the label is stored negated-by-ordering using a descending-safe
    # trick: max on (r_score, struct-reversed label) is not directly
    # expressible, so use min over (-r_score, label).
    pick = (
        scored.groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("r_score")).alias("neg"),
                    F.col(label_col).alias("lab"),
                )
            ).alias("m"),
            F.max("n_tokens").alias("n_tokens"),
        )
        .select(
            id_col,
            F.col("m.lab").alias("predicted"),
            (-F.col("m.neg")).alias("nb_score"),
            "n_tokens",
        )
    )
    return pick


# ---------------------------------------------------------------------
# Hashed-feature logistic scorer (fastText-shape linear classifier)
# ---------------------------------------------------------------------
# The learned complement to the closed-form NB above: a binary linear
# model over hashed token features (the "hashing trick", Weinberger et
# al. 2009, ICML — the fastText/Vowpal-Wabbit feature plan), trained
# with full-batch gradient descent. This is the model family CCNet-
# style pipelines use for model-based quality scoring once rule
# batteries (quality.gopher_rules / c4_rules) stop discriminating.
#
# 100 TB execution contract:
# - features are PRESENCE bits per (doc, hashed bucket) — one explode
#   + distinct, bounded by n_buckets per doc, exact integers;
# - each GD iteration is aggregation-only: one margin pass (features
#   x broadcast weight-array literal, groupBy(doc)), one gradient
#   pass (groupBy(bucket), DECIMAL(38,0)-exact sums), and ONE bounded
#   collect of <= n_buckets gradient rows. The corpus never leaves
#   the cluster; the model never exceeds n_buckets + 1 integers.
# - everything cross-row is integer fixed-point (micros): per-doc
#   errors are rounded to integer micros BEFORE the gradient sum, so
#   the gradient is an order-independent exact integer — reruns are
#   bit-identical regardless of partitioning. The single float op
#   (the sigmoid) is per-row and rounded once.
#
# Scoring is one join-free projection per doc: margin_micros =
# bias + sum of the present buckets' weights — exact BIGINT, replayed
# verbatim by the DuckDB oracle with the trained weights pinned as a
# literal array (the tokenizer-fixture pattern: train is pytest-gated
# with a pure-Python fixed-point replica, score is oracle-gated).

#: Fixed-point scale for logistic weights/errors: micro-units.
LOGISTIC_SCALE = 1_000_000


def _bucket(col: Column, n_buckets: int) -> Column:
    """hash32(token) % n_buckets — the hashing-trick feature index
    (sketch.hash32: md5-prefix, engine-portable)."""
    from datacamp_etl_spark.operators.sketch import hash32

    return (hash32(col) % n_buckets).cast("int")


def hashed_presence_features(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, bucket) presence pairs: bucket b is present for a doc iff
    any of its normalized tokens hashes to b. One explode + one
    map-side-combinable distinct; at most ``n_buckets`` rows per doc
    however long the document."""
    norm = docs.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("__n")
    )
    return (
        norm.where(F.col("__n") != "")
        .select(
            id_col, F.explode(F.split("__n", " ")).alias("__tok")
        )
        # dedup (doc, token) BEFORE the md5 bucket hash: real corpora
        # repeat tokens heavily, and presence semantics make the
        # per-occurrence hash pure waste
        .distinct()
        .select(id_col, _bucket(F.col("__tok"), n_buckets).alias("bucket"))
        .distinct()
    )


def _margins(
    feats: DataFrame,
    docs_ids: DataFrame,
    weights: list[int],
    bias: int,
    id_col: str,
) -> DataFrame:
    """(id, margin_micros): bias + sum of present buckets' weights —
    exact BIGINT; empty docs carry the bare bias."""
    w_arr = F.lit([int(w) for w in weights]).cast("array<long>")
    per_doc = feats.select(
        F.col(id_col),
        F.element_at(w_arr, F.col("bucket") + 1).alias("__w"),
    ).groupBy(id_col).agg(F.sum("__w").alias("__sw"))
    return docs_ids.join(per_doc, id_col, "left").select(
        id_col,
        (F.lit(int(bias)) + F.coalesce("__sw", F.lit(0)))
        .cast("long")
        .alias("margin_micros"),
    )


def logistic_train(
    docs: DataFrame,
    label: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    n_iter: int = 5,
    lr_num: int = 1,
    lr_den: int = 2,
) -> dict:
    """Train the binary hashed-feature logistic model; returns
    ``{"weights": [int; n_buckets], "bias": int, "n_docs": int}``
    with weights in integer micros.

    Full-batch GD on the mean log-loss with rational learning rate
    ``lr_num/lr_den``: per iteration, every doc's error ``e_i =
    round(sigmoid(margin_i) * 1e6) - y_i * 1e6`` (integer micros) is
    summed exactly per present bucket (DECIMAL(38,0) — immune to both
    overflow and float ordering), collected (<= n_buckets + 1 rows),
    and applied driver-side as ``w[b] -= (lr_num * g[b]) // (lr_den *
    n_docs)`` (Python floor division — deterministic). ``label`` is a
    0/1 integer Column evaluated against ``docs``.
    """
    if n_iter < 0 or n_buckets < 1 or lr_den < 1:
        raise ValueError("need n_iter >= 0, n_buckets >= 1, lr_den >= 1")
    from datacamp_etl_spark.operators.spread import scoped_cache

    labeled = scoped_cache(
        docs.select(
            F.col(id_col), label.cast("long").alias("__y")
        )
    )
    feats = scoped_cache(
        hashed_presence_features(
            docs, id_col=id_col, text_col=text_col, n_buckets=n_buckets
        )
    )
    n_docs = labeled.count()
    if n_docs == 0:
        raise ValueError("cannot train on an empty corpus")
    weights = [0] * n_buckets
    bias = 0
    for _ in range(n_iter):
        margins = _margins(
            feats, labeled.select(id_col), weights, bias, id_col
        )
        err = margins.join(labeled, id_col).select(
            F.col(id_col),
            (
                F.round(
                    F.lit(float(LOGISTIC_SCALE))
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -F.col("margin_micros")
                            / F.lit(float(LOGISTIC_SCALE))
                        )
                    ),
                    0,
                ).cast("long")
                - F.col("__y") * LOGISTIC_SCALE
            ).alias("__e"),
        )
        grad_rows = (
            err.join(feats, id_col)
            .groupBy("bucket")
            .agg(
                F.sum(F.col("__e").cast("decimal(38,0)")).alias("__g")
            )
            .collect()
        )
        [gb] = err.agg(
            F.sum(F.col("__e").cast("decimal(38,0)")).alias("__g")
        ).collect()
        den = lr_den * n_docs
        for r in grad_rows:
            weights[r["bucket"]] -= (lr_num * int(r["__g"])) // den
        bias -= (lr_num * int(gb["__g"])) // den
    return {"weights": weights, "bias": bias, "n_docs": n_docs}


def logistic_score(
    docs: DataFrame,
    weights: list[int],
    bias: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document under a trained (or pinned) model:
    ``(id, n_features, margin_micros, predicted)`` — the margin is an
    exact BIGINT (bias + sum of present buckets' micro-weights), the
    prediction its sign; no float touches the output, so the oracle
    replay is hash-exact. n_buckets is implied by len(weights)."""
    feats = hashed_presence_features(
        docs, id_col=id_col, text_col=text_col, n_buckets=len(weights)
    )
    w_arr = F.lit([int(w) for w in weights]).cast("array<long>")
    per_doc = feats.select(
        F.col(id_col),
        F.element_at(w_arr, F.col("bucket") + 1).alias("__w"),
    ).groupBy(id_col).agg(
        F.count("*").alias("__nf"), F.sum("__w").alias("__sw")
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("__nf", F.lit(0)).cast("long").alias("n_features"),
        (F.lit(int(bias)) + F.coalesce("__sw", F.lit(0)))
        .cast("long")
        .alias("margin_micros"),
        (
            F.lit(int(bias)) + F.coalesce("__sw", F.lit(0)) >= 0
        ).alias("predicted"),
    )


#: Pinned hashed-logistic quality model for the registered
#: logistic_quality_scores query: logistic_train on the sf0.001
#: documents with Gopher rule-battery pass/fail as the weak label
#: (quality.gopher_rules(...).keep — the standard weak-supervision
#: recipe: rule battery labels, learned scorer generalizes), frozen
#: as integer micro-weights. Config: n_buckets=64, n_iter=20,
#: lr=1/4. Training accuracy 70.2% vs the 51.2% majority baseline —
#: presence-bit features learn the battery's length/stopword
#: structure. tests/test_round10_ops.py re-derives it to guard rot;
#: the oracle-gated entry replays SCORING only (exact BIGINT margin).
FIXTURE_LOGISTIC_V1: dict = {
    "weights": [
        -42364, 112715, 0, 0, 0, 62405, 0, 0, 0, 0, 51512, 0, 23276,
        -148084, 12581, 0, 0, 0, 0, 29151, 0, 0, 44021, 84467, 0,
        29208, 0, 89962, 0, 0, 45589, 82572, 66295, 0, 0, 0, 65691,
        0, 0, -17294, 0, 134000, 0, 0, 0, -88107, 0, 0, -17504,
        -165543, 0, 0, 0, 0, 0, 92990, 96606, 224318, -180077, 0, 0,
        75669, 0, 0,
    ],
    "bias": -300283,
}
