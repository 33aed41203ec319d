"""Deduplication operators for training-data pipelines [EXT].

Exact and near-duplicate detection over a document table, designed for
100 TB scale:

- **exact**: hash-groupBy on the normalized-text fingerprint — one
  shuffle of (hash, id), map-side partial aggregation.
- **MinHash + LSH**: shingle -> per-seed min-hash signature -> band ->
  bucket-join. Candidate generation never compares all pairs: docs
  only meet inside an LSH bucket, so the join key is (band, band
  signature) and skew is bounded by bucket size. All hashing is
  ``md5``-based (deterministic, available in every engine — no
  Python UDFs).
- **SimHash**: 60-bit bitwise-majority signature via explode +
  groupBy-sum — two narrow shuffles; near-pairs by hamming distance
  with pigeonhole segment blocking.
- **n-gram Jaccard**: exact pairwise similarity *within LSH candidate
  pairs* (or all pairs for small inputs) via shingle-set intersection
  counts.
- **embedding cosine**: near-dup by vector similarity, delegated to
  :mod:`datacamp_etl_spark.operators.similarity`.

Every op returns DataFrames (lazy plans) and avoids driver-side
materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datacamp_etl_spark.operators.spread import ensure_parallelism, scoped_cache
from datacamp_etl_spark.operators.text import fingerprint, normalize_text, tokens

__all__ = [
    "exact_duplicates",
    "dedup_exact",
    "lsh_candidate_probability",
    "lsh_band_plan",
    "shingles",
    "minhash_signature",
    "band_signatures",
    "band_index_append",
    "band_index_stats",
    "lsh_candidate_pairs",
    "incremental_dedup",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
    "span_dedup",
    "containment_pairs",
    "substring_dedup",
    "duplicate_text_fraction",
    "intra_doc_repeats",
    "intra_doc_repeat_fraction",
    "remove_spans",
    "substring_dedup_apply",
    "source_minhash_overlap",
    "shingle_hashes",
    "band_sigs_from_hashes",
    "row_band_signatures",
    "streaming_near_dup_filter",
]


# ---------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------

def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of exact duplicates (by normalized-text MD5): returns
    ``(fingerprint, n_dups, keep_id)`` for groups with >1 member;
    ``keep_id`` is the smallest id (deterministic survivor)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: keep the smallest-id row per fingerprint. One
    shuffle on the 16-byte digest; survivor selection is a semi-join
    back (no wide row in the shuffle)."""
    keep = (
        df.select(F.col(id_col), fingerprint(text_col).alias("__fp"))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------------
# Shingling + MinHash + LSH
# ---------------------------------------------------------------------

def shingles(text_col: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles of the normalized text
    (``array<string>``). Word shingles (not char) keep cardinality
    manageable at scale; k=3 is the usual near-dup setting.

    Built by zipping k shifted views of the token array — O(n) per
    document. (A transform over indices with slice() inside is O(n*k)
    array copies = quadratic-ish per doc and ~7x slower at sf0.1.)
    """
    toks = F.split(normalize_text(text_col), " ")
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))  # shingle count (0 when n < k)
    sh = F.slice(toks, 1, m)
    for off in range(1, k):
        sh = F.zip_with(
            sh, F.slice(toks, off + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


MINHASH_PRIME = (1 << 31) - 1  # Mersenne prime: (a*h + b) % p stays < 2^62


def minhash_constants(num_hashes: int = 16) -> tuple[list[int], list[int]]:
    """Deterministic md5-derived universal-hash constants
    ``a_j in [1, p-1], b_j in [0, p-1]`` — reproducible anywhere
    without RNG state, inlineable as literals in SQL oracles."""
    import hashlib

    a, b = [], []
    for j in range(num_hashes):
        ha = int(hashlib.md5(f"minhash-a:{j}".encode()).hexdigest()[:8], 16)
        hb = int(hashlib.md5(f"minhash-b:{j}".encode()).hexdigest()[:8], 16)
        a.append(ha % (MINHASH_PRIME - 1) + 1)
        b.append(hb % MINHASH_PRIME)
    return a, b


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """MinHash signatures: ``(id, seed, minhash)`` (minhash BIGINT).

    One md5 per shingle (folded to a 60-bit int, reduced mod the
    Mersenne prime 2^31-1), then ``num_hashes`` universal-hash mixes
    ``(a_j*h + b_j) % p`` — integer-exact, reproducible in any engine.

    All mins are computed as parallel agg columns in a SINGLE
    groupBy (one shuffle, no seed-explosion row blowup), then
    unpivoted to the (id, seed, minhash) shape.

    Measured (r13): a per-row array-kernel variant (16
    ``array_min(transform(...))`` minima over :func:`shingle_hashes`
    behind an ``evaluate_once`` barrier) was tried and REVERTED — it
    still needs the same groupBy (callers may key by a NON-unique
    group column, e.g. :func:`source_minhash_overlap`) and the 16
    per-row array materializations measured ~1.5x SLOWER than this
    exploded incremental aggregation (2.1-3.9 s vs 1.7-2.4 s warm at
    sf0.1, same session). :func:`band_signatures` — where the row
    kernel removes BOTH of its shuffles outright — is the shape that
    keeps the row form.
    """
    a, b = minhash_constants(num_hashes)
    sh = ensure_parallelism(df).select(
        F.col(id_col), F.explode(shingles(text_col, k)).alias("shingle")
    )
    h = (
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
        % MINHASH_PRIME
    )
    hashed = sh.select(id_col, h.alias("h"))
    mins = hashed.groupBy(id_col).agg(
        *[
            F.min((F.lit(a[j]) * F.col("h") + F.lit(b[j])) % MINHASH_PRIME).alias(
                f"m{j}"
            )
            for j in range(num_hashes)
        ]
    )
    stack = ", ".join(f"{j}L, m{j}" for j in range(num_hashes))
    return mins.select(
        id_col,
        F.expr(f"stack({num_hashes}, {stack}) AS (seed, minhash)"),
    ).select(id_col, "seed", "minhash")


def lsh_candidate_probability(s: float, bands: int, rows: int) -> float:
    """P(a pair with Jaccard ``s`` becomes an LSH candidate) under
    banded MinHash: ``1 - (1 - s^rows)^bands`` — the classic s-curve
    (Broder's minwise hashing + the banding analysis popularized by
    Mining of Massive Datasets ch. 3)."""
    return 1.0 - (1.0 - s**rows) ** bands


def lsh_band_plan(
    num_hashes: int = 16,
    threshold: float = 0.5,
    *,
    fn_weight: float = 1.0,
    fp_weight: float = 1.0,
    steps: int = 1000,
) -> dict:
    """Choose ``(bands, rows)`` for a MinHash-LSH banding at a target
    Jaccard ``threshold``: enumerates every ``rows`` with
    ``bands = num_hashes // rows`` and minimizes the weighted
    integrated s-curve error — ``fn = ∫_t^1 (1 - P(s)) ds`` (true
    pairs the banding misses) plus ``fp = ∫_0^t P(s) ds`` (junk pairs
    it surfaces). Driver-side closed-form math, no data touched: this
    is the a-priori half of tuning; ``dedup_recall_eval`` (the
    registered harness) is the measured half — plan here, verify
    there, then roll out.

    Weights encode the 100 TB trade: false positives cost verify-join
    work (raise ``fp_weight`` when the verifier is the bottleneck),
    false negatives cost recall (raise ``fn_weight`` for
    contamination/dedup-completeness work).

    Returns ``{"bands", "rows", "expected_fn", "expected_fp",
    "s50"}`` where ``s50 = (1/bands)^(1/rows)`` is the curve's
    midpoint similarity.
    """
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    best: dict | None = None
    for rows in range(1, num_hashes + 1):
        # Only exact divisors: band_signatures derives
        # rows_per_band = num_hashes // bands, so a non-divisor plan
        # (e.g. rows=3 over 16 hashes) would execute with a leftover
        # partial band — a 1-row band fires with probability s and the
        # executed s-curve would be far looser than the fn/fp numbers
        # computed here. Restricting the search keeps plan == execution.
        if num_hashes % rows != 0:
            continue
        bands = num_hashes // rows
        if bands < 1:
            continue
        fn = sum(
            1.0
            - lsh_candidate_probability(
                threshold + (1 - threshold) * (i + 0.5) / steps, bands, rows
            )
            for i in range(steps)
        ) * (1 - threshold) / steps
        fp = sum(
            lsh_candidate_probability(
                threshold * (i + 0.5) / steps, bands, rows
            )
            for i in range(steps)
        ) * threshold / steps
        cost = fn_weight * fn + fp_weight * fp
        if best is None or cost < best["_cost"]:
            best = {
                "_cost": cost,
                "bands": bands,
                "rows": rows,
                "expected_fn": round(fn, 6),
                "expected_fp": round(fp, 6),
                "s50": round((1.0 / bands) ** (1.0 / rows), 6),
            }
    assert best is not None
    best.pop("_cost")
    return best


def _resolve_bands(
    num_hashes: int, bands: int | str, threshold: float | None
) -> int:
    """Resolve a ``bands`` argument that may be ``"auto"``.

    ``bands="auto"`` delegates to :func:`lsh_band_plan` at the given
    Jaccard ``threshold`` (default 0.5 when unspecified), closing the
    loop the round-6 organic-fixture measurement exposed: the fixed
    ``bands=4`` default recalls only 0.155 of true t=0.2 pairs, while
    the planner's 8x2 recommendation measures 0.686 — but nothing
    connected them, so a caller had to know to invoke the planner and
    thread ``bands=`` through by hand. With ``"auto"`` the operator
    itself picks the banding matched to the threshold the caller
    actually cares about. Explicit integer ``bands`` stays untouched
    (registered oracle entries pin their banding and must not move).
    """
    if bands == "auto":
        return lsh_band_plan(num_hashes, 0.5 if threshold is None else threshold)[
            "bands"
        ]
    if isinstance(bands, str):
        raise ValueError(f"bands must be an int or 'auto', got {bands!r}")
    if threshold is not None:
        raise ValueError(
            "threshold= is only meaningful with bands='auto'; with an "
            "explicit bands it would silently not apply"
        )
    return bands


def band_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_hashes: int = 16,
    bands: int | str = 4,
    threshold: float | None = None,
    k: int = 3,
) -> DataFrame:
    """Per-document LSH band signatures ``(id, band, band_sig)``.

    Each band digests ``num_hashes // bands`` consecutive minhash rows
    into one md5 key; docs sharing ANY band key are near-dup
    candidates. This is the persistable unit of a corpus dedup index:
    at scale, write this frame partitioned/bucketed by
    ``(band, band_sig)`` once, then join incoming batches against it
    (see :func:`incremental_dedup`) without re-hashing the corpus.

    ``bands="auto"`` picks the banding via :func:`lsh_band_plan` at
    ``threshold`` (see :func:`_resolve_bands`).

    r13 shape (guide §2.4 — remove shuffles outright): built from the
    per-row kernel (:func:`shingle_hashes` behind an ``evaluate_once``
    barrier + :func:`band_sigs_from_hashes` + ``posexplode``) instead
    of the explode → groupBy(id) minima → stack → groupBy(id, band)
    collect_list chain — ZERO shuffles where the old build paid two
    full exchanges of exploded rows per use. Values are bit-identical
    (same shingle hash, same universal-hash constants, same
    sorted-minima digest — the parity the row/batch pytest pins);
    docs with no shingles are absent on both paths (NULL band array
    is dropped by ``posexplode``, exploded empty arrays never emitted
    rows).
    """
    from datacamp_etl_spark.operators.spread import evaluate_once

    bands = _resolve_bands(num_hashes, bands, threshold)
    base = evaluate_once(
        ensure_parallelism(df).select(F.col(id_col), F.col(text_col)),
        {"__h": shingle_hashes(F.col(text_col), k)},
    )
    # SECOND barrier on the sig array: a generator expression is not
    # whole-stage-codegen'd, so posexplode(band_sigs_from_hashes(...))
    # inline evaluates the 16-transform kernel interpreted (measured
    # 8.4 s vs 1.1 s warm at sf0.1); materialize the array in a
    # codegen'd projection first and posexplode the plain column.
    sigs = evaluate_once(
        base,
        {
            "__sigs": band_sigs_from_hashes(
                F.col("__h"), num_hashes=num_hashes, bands=bands
            )
        },
    )
    return sigs.select(
        F.col(id_col),
        F.posexplode("__sigs").alias("band", "band_sig"),
    )


def incremental_dedup(
    batch: DataFrame,
    corpus_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_hashes: int = 16,
    bands: int | str = 4,
    threshold: float | None = None,
    k: int = 3,
) -> DataFrame:
    """Drop new-batch documents that are near-dups of an EXISTING
    corpus, returning the surviving batch rows unchanged.

    ``bands="auto"`` plans the banding from ``threshold`` via
    :func:`lsh_band_plan` — it must match the banding the persisted
    ``corpus_bands`` index was built with, so pass the same
    ``bands``/``threshold`` used at index-build time.

    ``corpus_bands`` is a band-signature index (the output shape of
    :func:`band_signatures` — at 100 TB a precomputed table bucketed
    by ``(band, band_sig)``, not recomputed per batch). The batch's
    band signatures LEFT SEMI join the index, and matched ids
    anti-join out of the batch.

    Scale shape: the corpus is touched only through an equi-join on
    its bucketed key — no corpus re-scan of text, no pair
    enumeration. Unlike :func:`lsh_candidate_pairs`, a mega-bucket
    needs no cap here: the semi join emits at most one hit per batch
    band row regardless of how many corpus docs share the key, so a
    degenerate band key costs a skewed-but-bounded probe (AQE
    skew-split handles it), never an n^2 blowup.
    """
    bands = _resolve_bands(num_hashes, bands, threshold)
    bb = band_signatures(
        batch, id_col, text_col, num_hashes=num_hashes, bands=bands, k=k
    )
    hit_ids = (
        bb.join(corpus_bands, on=["band", "band_sig"], how="left_semi")
        .select(id_col)
        .distinct()
    )
    return batch.join(hit_ids, on=id_col, how="left_anti")


def band_index_append(
    corpus_bands: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_hashes: int = 16,
    bands: int | str = 4,
    threshold: float | None = None,
    k: int = 3,
    generation: int = 1,
) -> DataFrame:
    """Append a new batch to a persisted band-signature index,
    stamping each appended row with ``generation`` (existing rows
    without a ``generation`` column are the base build, generation 0)
    — the MinHash twin of ``ann_index.ann_index_append``'s
    frozen-quantizer append. The "quantizer" here is the deterministic
    minhash seed family, so consistency only requires passing the SAME
    ``num_hashes``/``bands``/``k`` (or ``threshold``) the base index
    was built with; there is nothing to retrain, but the index still
    DRIFTS: new content concentrating in existing buckets degrades the
    incremental-dedup probe exactly like cell drift degrades an IVF
    probe. Track it with :func:`band_index_stats` and rebuild when the
    appended share grows past policy.

    Returns the unioned index ``(id, band, band_sig, generation)``;
    at scale, write the appended slice to the same bucketed table
    instead of materializing the union.
    """
    bands = _resolve_bands(num_hashes, bands, threshold)
    base = corpus_bands
    if "generation" not in base.columns:
        base = base.withColumn("generation", F.lit(0))
    bb = band_signatures(
        batch, id_col, text_col, num_hashes=num_hashes, bands=bands, k=k
    ).withColumn("generation", F.lit(generation))
    return base.select(id_col, "band", "band_sig", "generation").unionByName(
        bb.select(id_col, "band", "band_sig", "generation")
    )


def band_index_stats(
    corpus_bands: DataFrame,
    *,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Staleness / drift report over a persisted band-signature index
    — the rebuild trigger for :func:`incremental_dedup`, and the
    direct twin of ``ann_index.ann_index_cell_stats``: per band, the
    base-build posting count (generation 0), the appended count
    (generation > 0), the total's exact share in millionths, plus the
    bucket-shape gauges the probe cost actually depends on — distinct
    bucket count, the largest bucket, and how many buckets exceed
    ``max_bucket_size`` (the cap :func:`lsh_candidate_pairs` drops
    at). Appends piling into few, ever-larger buckets mean the corpus
    has drifted onto degenerate band keys: incremental-dedup probes
    get more skewed and pair recall decays — rebuild with a different
    banding (or raise ``num_hashes``) when ``n_over_cap`` or the
    appended share crosses policy.

    Input without a ``generation`` column is treated as all-base.
    One aggregated pass over the (id, band, band_sig) postings
    (groupBy bucket, then groupBy band — both map-side combined); the
    grand total is a 1-row scalar broadcast onto the <= ``bands``-row
    per-band table. Returns ``(band, n_base, n_appended, n_total,
    share_ppm, n_buckets, max_bucket, n_over_cap)`` ordered by band.
    """
    idx = corpus_bands
    if "generation" not in idx.columns:
        idx = idx.withColumn("generation", F.lit(0))
    per_bucket = idx.groupBy("band", "band_sig").agg(
        F.sum(F.when(F.col("generation") == 0, 1).otherwise(0)).alias(
            "__b"
        ),
        F.sum(F.when(F.col("generation") > 0, 1).otherwise(0)).alias(
            "__a"
        ),
        F.count("*").alias("__n"),
    )
    # NOT pinned (r13 measurement): per_band feeds both the output
    # projection and the grand-total scalar — the plan SHOWS the
    # posting lineage twice — but AQE's runtime exchange reuse already
    # deduplicates the identical per-bucket Exchange, so a scoped_cache
    # here measured neutral (probe: one-chain 1.6-2.0 s vs full query
    # 2.2-2.4 s at sf0.1; a pin moved the warm number nowhere).
    per_band = per_bucket.groupBy("band").agg(
        F.sum("__b").alias("n_base"),
        F.sum("__a").alias("n_appended"),
        F.sum("__n").alias("n_total"),
        F.count("*").alias("n_buckets"),
        F.max("__n").alias("max_bucket"),
        F.sum(
            F.when(F.col("__n") > max_bucket_size, 1).otherwise(0)
        ).alias("n_over_cap"),
    )
    total = per_band.agg(F.sum("n_total").alias("__grand"))
    return (
        per_band.crossJoin(F.broadcast(total))
        .select(
            F.col("band").cast("int").alias("band"),
            F.col("n_base").cast("long").alias("n_base"),
            F.col("n_appended").cast("long").alias("n_appended"),
            F.col("n_total").cast("long").alias("n_total"),
            # integer DIV: the exact floor both engines compute
            # identically (same convention as ann_index_cell_stats)
            F.expr("(1000000 * n_total) DIV __grand")
            .cast("long")
            .alias("share_ppm"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("max_bucket").cast("long").alias("max_bucket"),
            F.col("n_over_cap").cast("long").alias("n_over_cap"),
        )
        .orderBy("band")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_hashes: int = 16,
    bands: int | str = 4,
    threshold: float | None = None,
    k: int = 3,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """LSH banding: docs sharing any band of their MinHash signature
    become a candidate pair ``(id_a, id_b)`` with ``id_a < id_b``.

    ``bands="auto"`` picks the banding from the Jaccard ``threshold``
    you actually target, via :func:`lsh_band_plan` — use this below
    t=0.5, where the historical fixed default (4 bands x 4 rows,
    s50~0.59) measures only 0.155 recall on the organic fixture while
    the planned 8x2 measures 0.686 (pinned by the registered
    ``dedup_recall_planned`` harness).

    Scale shape: signatures (num_hashes rows/doc) -> band signatures
    (bands rows/doc) -> self-equi-join on (band, band_sig). The join
    key is a 32-char digest; bucket sizes are the only skew source.

    ``max_bucket_size`` is the mega-bucket guard: a degenerate band
    key (e.g. the signature of near-empty documents) holding m docs
    would emit m^2/2 candidate pairs from ONE join key — an n^2 hot
    task no AQE split can fix at 100 TB. Buckets above the cap are
    dropped entirely (their pairs are overwhelmingly spurious: a band
    matching millions of docs carries no near-dup signal). Set
    ``None`` to disable.
    """
    bands = _resolve_bands(num_hashes, bands, threshold)
    band_sig = band_signatures(
        df, id_col, text_col, num_hashes=num_hashes, bands=bands, k=k
    )
    if max_bucket_size is not None:
        # Window count over the SAME key the candidate join shuffles
        # on: one exchange (reused by the join side) instead of the
        # agg + semi-join alternative's two.
        from pyspark.sql import Window as W

        wcnt = W.partitionBy("band", "band_sig")
        band_sig = (
            band_sig.withColumn("__n", F.count("*").over(wcnt))
            .where(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
    # Self-equi-join: both sides are the SAME relation, so broadcast
    # can never be right at scale (equal sizes) and the single-threaded
    # hash-table build it implies is slower even locally. Forcing
    # sort-merge lets Spark reuse one exchange for both sides.
    a = band_sig.hint("merge").select(
        F.col(id_col).alias("id_a"), "band", "band_sig"
    )
    b = band_sig.select(
        F.col(id_col).alias("id_b"), "band", "band_sig"
    )
    return (
        a.join(b, on=["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def dedup_recall(
    docs: DataFrame,
    *,
    threshold: float = 0.2,
    bands: int | str = 4,
    num_hashes: int = 16,
    k: int = 3,
    sample_per_stratum: int | None = None,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Recall of the LSH banding against exact Jaccard truth, as a
    1-row metrics frame ``(n_docs, n_true, n_candidates, n_hits,
    recall, ci95_halfwidth)``.

    ``sample_per_stratum`` is the corpus-scale mode: carve a
    deterministic exact-k stratified sample
    (:func:`~datacamp_etl_spark.operators.mixture.stratified_sample_exact_k`
    over ``strata_col``) and measure recall WITHIN the sample. This is
    a valid estimator of full-corpus pair recall because LSH banding
    is pairwise: whether docs a and b share a band signature depends
    only on their own texts, never on the rest of the corpus — so a
    pair's hit/miss outcome inside the sample equals its outcome in
    the full run (the one divergence: the ``max_bucket_size``
    mega-bucket cap sees smaller buckets in the sample, but capped
    buckets carry no near-dup signal by that guard's own contract).
    Cost drops from sum(df²) over the corpus to sum(df²) over the
    sample — at a doc sampling fraction p the exact-truth branch
    shrinks ~p², which is what makes the harness runnable at corpus
    scale (VERDICT r6 #3: 29 s on organic sf1 full vs the sampled
    stratum).

    ``ci95_halfwidth`` is the binomial 95 % normal-approximation
    half-width ``1.96 * sqrt(r(1-r)/n_true)``, treating each sampled
    true pair as a hit/miss Bernoulli. Caveat: pairs inside a near-dup
    cluster share documents, so outcomes are positively correlated and
    the half-width UNDERSTATES the real uncertainty somewhat (organic
    sf1 measurement: true value ~1.2 half-widths from the estimate) —
    read it as a floor, not an exact interval. Both ``recall`` and the
    half-width are NULL when the sample holds zero true pairs (enlarge
    the sample).

    ``bands="auto"`` plans the banding from ``threshold`` via
    :func:`lsh_band_plan`; an explicit integer pins it (the registered
    harness entries pin theirs so oracles don't move).
    """
    if sample_per_stratum is not None:
        from datacamp_etl_spark.operators.mixture import (
            stratified_sample_exact_k,
        )

        # Pin the sample: the md5-rank sampling machinery would
        # otherwise re-run for every consumer below (docs count, the
        # exact-truth chain, the LSH chain).
        docs = scoped_cache(
            stratified_sample_exact_k(
                docs, strata_col, sample_per_stratum, id_col=id_col
            )
        )
    # Cache both pair sets: each feeds its own count AND the hits
    # semi-join — without the pin the full shingle->minhash->band chain
    # (cand) and the exact-Jaccard chain (exact) execute TWICE inside
    # the one assembled plan (4 aggregate branches below). Both
    # relations are pair lists (two longs per row), bounded by the
    # candidate volume the harness exists to report on.
    exact = scoped_cache(
        ngram_jaccard_pairs(
            docs, id_col=id_col, text_col=text_col, threshold=threshold, k=k
        ).select("id_a", "id_b")
    )
    cand = scoped_cache(
        lsh_candidate_pairs(
            docs,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold if bands == "auto" else None,
            k=k,
        )
    )
    hits = exact.join(cand, ["id_a", "id_b"], "left_semi")
    r = F.col("n_hits").cast("double") / F.col("n_true")
    nonzero = F.col("n_true") > 0
    return (
        docs.agg(F.count("*").alias("n_docs"))
        .crossJoin(exact.agg(F.count("*").alias("n_true")))
        .crossJoin(cand.agg(F.count("*").alias("n_candidates")))
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
        .select(
            F.col("n_docs").cast("long"),
            F.col("n_true").cast("long"),
            F.col("n_candidates").cast("long"),
            F.col("n_hits").cast("long"),
            F.when(nonzero, F.round(r, 6)).alias("recall"),
            F.when(
                nonzero,
                F.round(
                    F.lit(1.96)
                    * F.sqrt(r * (F.lit(1.0) - r) / F.col("n_true")),
                    6,
                ),
            ).alias("ci95_halfwidth"),
        )
    )


# ---------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    strategy: str = "auto",
    max_expand_rows: int = 100_000,
) -> DataFrame:
    """Pairs with shingle-set Jaccard >= threshold:
    ``(id_a, id_b, n_common, n_union, jaccard)``.

    Three execution strategies, measured head-to-head at sf0.1:

    - ``candidates`` given (the 100 TB path: LSH pairs in) —
      **verify-only**: candidate pairs join back to the per-doc
      shingle arrays and intersect JVM-side (``array_intersect``).
      Cost is proportional to the candidate count, never to shingle
      co-occurrence.
    - ``strategy='expand'`` — inverted-index self-join + groupBy
      intersection count. Skinny rows (id, id) through the shuffle, no
      array payloads; fastest when per-shingle document frequency is
      bounded, but a globally hot shingle costs O(df²) pairs.
    - ``strategy='prefix'`` — **prefix filtering** (PPJoin family):
      with each doc's shingles sorted by ascending global document
      frequency, a pair with J >= t must share a shingle among the
      first ``n - ceil(t*n) + 1`` of each side (pigeonhole over the
      shared total order), so only that prefix is indexed — the
      hottest shingles fall out of the index, then survivors get the
      verify-only pass. Pays off when the prefix prunes hard (high t)
      or the corpus has hot shingles; at low t the candidate set is
      nearly the full pair set and array-carry verification costs more
      than the skinny expansion (5x at sf0.1, t=0.2).

    ``'auto'`` picks ``'prefix'`` for threshold >= 0.5 else
    ``'expand'``. A length filter (``t*|A| <= |B|``) applies in both
    pair-generating strategies. The threshold compare is integer
    arithmetic (``n_common * D >= threshold*D * n_union``) so boundary
    cases are exact — no float/decimal rounding drift.

    The no-candidates ``'expand'`` path is **size-guarded** (same
    contract as ``cosine_near_dup_pairs(exact=True)``): its cost is
    sum(df²) over per-shingle document frequencies — exact but
    potentially quadratic at low thresholds — so it probes the input
    size first (an EAGER bounded ``limit(cap+1).count()`` at
    plan-construction time — the module's one exception to the
    lazy-plans contract, cost capped at the guard threshold, never a
    full scan) and raises above ``max_expand_rows``. The corpus-scale
    recipe below t=0.5 is candidates-first: generate pairs with
    ``lsh_candidate_pairs`` (tune bands/rows with the
    ``dedup_recall_eval`` harness), then pass them via ``candidates=``
    for verify-only cost proportional to the candidate count. Raise
    ``max_expand_rows`` explicitly to force the exact plan anyway.
    """
    thr_num = int(round(threshold * 10000))
    if strategy == "auto":
        strategy = "prefix" if threshold >= 0.5 else "expand"
    if strategy not in ("expand", "prefix"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if candidates is None and strategy == "expand":
        # Deliberately EAGER (the module's one plan-construction-time
        # action, noted per contract): the guard must fire before the
        # quadratic plan is ever launched. Bounded, not a full scan —
        # limit(cap+1) short-circuits via CollectLimit's incremental
        # partition draining, so on a 100 TB input this touches a
        # handful of row groups instead of counting every row.
        n = df.limit(max_expand_rows + 1).count()
        if n > max_expand_rows:
            raise ValueError(
                f"ngram_jaccard_pairs(strategy='expand') on >{max_expand_rows} rows: "
                f"the inverted-index self-join costs sum(df²) and can "
                f"go quadratic at low thresholds; pass candidates= "
                f"(generate with lsh_candidate_pairs, tune recall with "
                f"dedup_recall_eval) or raise max_expand_rows "
                f"(currently {max_expand_rows}) to force the exact plan"
            )

    if candidates is None and strategy == "expand":
        # Cache the exploded shingle index: it has THREE consumers
        # (both self-join sides + the per-doc size agg), and without
        # materialization each runs the normalize/shingle kernel again
        # (measured 2x total cost at sf0.1). Materializing the index
        # once is the standard trade at scale too — MEMORY_AND_DISK
        # spills, and a 100 TB pipeline would stage this very relation
        # to parquet before the join anyway.
        # PIN the cached index's partitioning BY THE JOIN KEY: the
        # cached hash partitioning on `shingle` is the self-join's
        # required distribution on BOTH sides, so the join plans with
        # ZERO exchanges and — the real point — AQE's byte-based
        # coalescing never sees an exchange to shrink. Without the
        # pin, a few-MB skinny index coalesces to a handful of tasks
        # and one task inherits many hot shingles' df² join output
        # (observed on the organic sf1 fixture: the same query swung
        # 52 s ↔ 138 s run-to-run on a single straggler task — the
        # simhash AQE-blindspot lesson from round 5, same fix).
        spark = df.sparkSession
        width = max(
            spark.sparkContext.defaultParallelism,
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        )
        sh = scoped_cache(
            ensure_parallelism(df)
            .select(
                F.col(id_col),
                F.explode(shingles(text_col, k)).alias("shingle"),
            )
            .repartition(width, "shingle")
        )
        # merge hint: self-equi-join — parallel sort + reused exchange
        # beats a single-threaded broadcast build.
        a = sh.hint("merge").select(F.col(id_col).alias("id_a"), "shingle")
        b = sh.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            a.join(b, on="shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_common"))
        )
        # sizes derive from the cached index (shingles() is already
        # distinct per doc); zero-shingle docs are absent on BOTH
        # paths, so results are identical to a fresh size scan.
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
        sz_a = sizes.select(
            F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")
        )
        sz_b = sizes.select(
            F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")
        )
        scored = inter.join(sz_a, "id_a").join(sz_b, "id_b")
    else:
        # Shingle ONCE per row (evaluate_once barrier stops Catalyst
        # re-inlining the kernel into the size()), and cache: docsets
        # feeds candidate generation AND both verify sides — without
        # materialization each consumer re-runs the kernel over the
        # corpus. Same staging-table trade as the expand path.
        from datacamp_etl_spark.operators.spread import evaluate_once

        base = evaluate_once(
            ensure_parallelism(df).select(
                F.col(id_col).alias("id"), F.col(text_col).alias("__txt")
            ),
            {"sh_arr": shingles("__txt", k)},
        )
        docsets = scoped_cache(
            base.select("id", "sh_arr", F.size("sh_arr").alias("n_sh"))
            .where(F.col("n_sh") > 0)
        )
        if candidates is not None:
            cand = candidates.select("id_a", "id_b")
        else:
            sh = docsets.select(
                "id", "n_sh", F.explode("sh_arr").alias("shingle")
            )
            dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
            # prefix length: n - ceil(t*n) + 1, integer-exact
            pref_len = (
                F.col("n_sh")
                - F.floor((F.col("n_sh") * thr_num + 9999) / 10000)
                + 1
            )
            w = Window.partitionBy("id").orderBy("df", "shingle")
            pref = (
                sh.join(dfreq, "shingle")
                .withColumn("__pos", F.row_number().over(w))
                .where(F.col("__pos") <= pref_len)
                .select("id", "n_sh", "shingle")
            )
            a = pref.select(
                F.col("id").alias("id_a"),
                F.col("n_sh").alias("n_a"),
                "shingle",
            )
            b = pref.select(
                F.col("id").alias("id_b"),
                F.col("n_sh").alias("n_b"),
                "shingle",
            )
            cand = (
                a.join(b, on="shingle")
                .where(F.col("id_a") < F.col("id_b"))
                # length filter: J>=t forces t*|A| <= |B| and vice versa
                .where(F.col("n_b") * 10000 >= F.col("n_a") * thr_num)
                .where(F.col("n_a") * 10000 >= F.col("n_b") * thr_num)
                .select("id_a", "id_b")
                .distinct()
            )
        sets_a = docsets.select(
            F.col("id").alias("id_a"),
            F.col("sh_arr").alias("__sh_a"),
            F.col("n_sh").alias("n_a"),
        )
        sets_b = docsets.select(
            F.col("id").alias("id_b"),
            F.col("sh_arr").alias("__sh_b"),
            F.col("n_sh").alias("n_b"),
        )
        scored = (
            cand.join(sets_a, "id_a")
            .join(sets_b, "id_b")
            .withColumn(
                "n_common", F.size(F.array_intersect("__sh_a", "__sh_b"))
            )
        )

    return (
        scored.withColumn(
            "n_union", F.col("n_a") + F.col("n_b") - F.col("n_common")
        )
        .where(F.col("n_common") * 10000 >= F.col("n_union") * thr_num)
        .withColumn(
            "jaccard",
            (
                F.col("n_common").cast("decimal(18,2)") / F.col("n_union")
            ).cast("decimal(18,4)"),
        )
        .select("id_a", "id_b", "n_common", "n_union", "jaccard")
    )


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 md5 hex chars x 4 bits; fits BIGINT in any engine
_HEX = "0123456789abcdef"


def _simhash_bits(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document signature bits: ``(id, bit, bitval)``.

    Token hash bits come from the first 15 hex chars of md5(token):
    bit (4*p + b) of the hash is bit b of hex char p. All arithmetic is
    on values <= 15 (exact in every engine — no 64-bit shifts, which
    decimal/double math can't do exactly). Signature bit = majority
    vote over distinct tokens.
    """
    toks = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(normalize_text(text_col), " "))).alias("tok"),
    )
    pos = F.explode(F.sequence(F.lit(0), F.lit(14))).alias("p")
    chars = toks.select(id_col, F.md5("tok").alias("h"), pos).select(
        id_col,
        "p",
        (F.instr(F.lit(_HEX), F.substring(F.col("h"), F.col("p") + 1, 1)) - 1).alias(
            "hexv"
        ),
    )
    # Pre-aggregate on (id, p, hexv) BEFORE the x4 bit expansion: at
    # most 16 hexv values x 15 positions per doc survive, so the bit
    # explode runs over ~240 rows/doc instead of 15x(distinct tokens).
    hex_counts = chars.groupBy(id_col, "p", "hexv").agg(
        F.count("*").alias("n")
    )
    b = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("b")
    contrib = hex_counts.select(id_col, "p", "hexv", "n", b).select(
        id_col,
        (F.col("p") * 4 + F.col("b")).alias("bit"),
        (
            (
                2
                * (F.floor(F.col("hexv") / F.pow(F.lit(2.0), F.col("b"))).cast("int") % 2)
                - 1
            )
            * F.col("n")
        ).alias("c"),
    )
    return (
        contrib.groupBy(id_col, "bit")
        .agg(F.sum("c").alias("s"))
        .select(
            id_col, "bit", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)).alias("bitval")
        )
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash per document: ``(id, simhash)`` with simhash as
    BIGINT.

    Fast path: ONE row per distinct token (md5 hex folded to a packed
    60-bit long via conv), then 60 parallel bit-popcount aggregates in
    a single groupBy — no explode, map-side combine, one shuffle of 61
    longs per doc. Majority vote per bit = ``2*popcount > n_tokens``
    (ties -> 0, matching the ±1-sum formulation in
    ``_simhash_bits``, which stays as the row-shaped reference
    implementation — signature values are identical).

    Bit numbering parity: ``_simhash_bits`` defines signature bit
    ``4p + b`` as bit ``b`` of the p-th hex CHAR (p=0 leftmost), while
    the conv-packed long has the leftmost char in its TOP nibble — so
    signature bit k reads packed bit ``4*(14 - k//4) + k%4``.
    """
    toks = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(normalize_text(text_col), " "))
        ).alias("tok"),
    )
    packed = toks.select(
        id_col,
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    pops = packed.groupBy(id_col).agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                F.expr(f"shiftrightunsigned(h, {4 * (14 - k // 4) + k % 4}) & 1L")
            ).alias(f"s{k}")
            for k in range(SIMHASH_BITS)
        ],
    )
    # shiftleft literals, NOT pow()+cast: Spark's double->decimal cast
    # goes through the shortest string repr and corrupts 2^58, 2^59.
    sim = None
    for k in range(SIMHASH_BITS):
        term = F.when(2 * F.col(f"s{k}") > F.col("n"), F.lit(1 << k)).otherwise(
            F.lit(0)
        )
        sim = term if sim is None else sim + term
    return pops.select(id_col, sim.cast("long").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= ``max_hamming``:
    ``(id_a, id_b, hamming)``.

    Blocking: split the 60-bit signature into ``bands`` segments; by
    pigeonhole, any pair with hamming distance < bands shares at least
    one exact segment -> per-segment equi-join. Verification is
    ``bit_count(xor)`` on the packed BIGINT signatures — one integer
    op per candidate, no per-bit join.

    Exact-signature collapse: the banded join runs over DISTINCT
    signatures, not documents — hamming distance is a function of the
    signatures alone, so documents sharing a signature are
    interchangeable in candidate generation. On template-heavy
    corpora that is the difference between quadratic-in-documents and
    quadratic-in-distinct-signatures candidate work (sf1: sum(df^2)
    363M over documents vs 81M over the 37,364 distinct signatures —
    the hot segment bucket holds 11,643 docs but only 4,498 sigs).
    Verified signature pairs then expand back through the members
    relation (that expansion IS the output), and same-signature
    documents pair up directly at hamming 0.
    """
    seg_bits = SIMHASH_BITS // bands
    # Hash-spread the signature table BEFORE caching: the signature
    # aggregate's output is tiny in BYTES (50k rows of two longs at
    # sf1), so AQE's byte-based coalescing folds it to ONE partition —
    # and every downstream stage (segment explode, candidate join,
    # verify) inherits that layout because the small side broadcasts.
    # Bytes-based coalescing is blind to JOIN-OUTPUT cost: a hot
    # segment bucket (11.6k docs sharing one 15-bit segment at sf1)
    # makes the probe side emit ~df^2 rows, and that CPU burned on a
    # single core (measured 331 s in one task; ~10 s spread). The
    # explicit partition count pins the layout against AQE.
    sc = df.sparkSession.sparkContext
    sig = scoped_cache(
        simhash(df, id_col, text_col).repartition(
            sc.defaultParallelism, F.col(id_col)
        )
    )

    dsig = sig.select("simhash").distinct().repartition(
        sc.defaultParallelism, F.col("simhash")
    )
    segs = dsig.select(
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "simhash",
    ).select(
        "simhash",
        "band",
        F.expr(f"shiftrightunsigned(simhash, band * {seg_bits}) % {1 << seg_bits}").alias(
            "seg"
        ),
    )
    # No merge hint here (unlike lsh_candidate_pairs): segs comes off
    # the small distinct-signature relation (bands rows/sig of 3
    # ints), so the local broadcast build is cheap — and broadcast is
    # the SKEW-SAFE shape for this join: a hot segment's df^2 probe
    # output is emitted across all a-side partitions instead of
    # landing on the single reducer that owns the hot key (AQE
    # skew-join can't help: it splits by shuffle BYTES, and a 15-bit
    # segment bucket is kilobytes in, quadratic out). At cluster
    # scale, where segs outgrows broadcast, salt the hot segments
    # (operators/skew.py) before the equi-join.
    a = segs.select(F.col("simhash").alias("sim_a"), "band", "seg")
    b = segs.select(F.col("simhash").alias("sim_b"), "band", "seg")
    sig_pairs = (
        a.join(b, on=["band", "seg"])
        .where(F.col("sim_a") < F.col("sim_b"))
        .select("sim_a", "sim_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .where(F.col("hamming") <= max_hamming)
    )

    m_a = sig.select(F.col(id_col).alias("ida"), F.col("simhash").alias("sim_a"))
    m_b = sig.select(F.col(id_col).alias("idb"), F.col("simhash").alias("sim_b"))
    cross = (
        sig_pairs.join(m_a, "sim_a")
        .join(m_b, "sim_b")
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            "hamming",
        )
    )
    intra = (
        m_a.join(
            m_b, (F.col("sim_a") == F.col("sim_b")) & (F.col("ida") < F.col("idb"))
        )
        .select(
            F.col("ida").alias("id_a"),
            F.col("idb").alias("id_b"),
            F.lit(0).alias("hamming"),
        )
    )
    return cross.unionByName(intra).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# ---------------------------------------------------------------------
# Span-level (C4/CCNet-style "line") dedup
# ---------------------------------------------------------------------

def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    span: int = 3,
) -> DataFrame:
    """Corpus-wide repeated-span removal (the C4 "three-sentence" /
    CCNet paragraph dedup, over fixed-size token spans since the
    corpus has no line structure): split each document's token stream
    into non-overlapping ``span``-token windows, drop every window
    whose exact text occurs earlier in the corpus (global keep-first
    by ``(doc_id, span index)``), and reassemble the survivors.

    Returns one row per input document:
    ``(id_col, n_spans, n_kept, dedup_text)`` — ``dedup_text`` is ''
    when every span was dropped or the document was empty.

    Scale shape: explode to (id, idx, md5(span)) — never the raw
    span text twice — then the keep-first decision is a map-side-
    combinable ``min(struct(id, idx))`` per fingerprint JOINED back on
    the fingerprint (not a window: a hot span — boilerplate repeated
    a billion times — would make one window partition a straggler,
    while groupBy-min partial-aggregates it away). Reassembly shuffles
    once more on id. Three narrow shuffles total, all on hashes/ids.
    """
    toks = tokens(text_col)
    # One tokenizer evaluation for the whole operator: `base` feeds
    # both the span expansion and the per-doc span counts (previously
    # `counts` re-ran the regex tokenizer over the corpus), and `inst`
    # feeds both the keep-first aggregate and the join back — without
    # materialization each consumer re-runs the slice/concat/md5
    # kernel (2x the operator's CPU at sf1).
    base = scoped_cache(
        ensure_parallelism(df).select(
            F.col(id_col).alias("id"), toks.alias("__toks")
        )
    )
    nonempty = base.where(F.size("__toks") > 0)
    n_spans = F.ceil(F.size("__toks") / F.lit(span)).cast("int")
    inst = scoped_cache(
        nonempty.withColumn("idx", F.explode(F.sequence(F.lit(0), n_spans - 1)))
        .select(
            "id",
            "idx",
            F.concat_ws(
                " ", F.slice("__toks", F.col("idx") * span + 1, span)
            ).alias("span_text"),
        )
        .withColumn("fp", F.md5("span_text"))
    )
    first = inst.groupBy("fp").agg(
        F.min(F.struct("id", "idx")).alias("__first")
    )
    kept = (
        inst.join(first, "fp")
        .where(
            (F.col("id") == F.col("__first.id"))
            & (F.col("idx") == F.col("__first.idx"))
        )
        .select("id", "idx", "span_text")
    )
    reassembled = kept.groupBy("id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "span_text"))),
                lambda s: s["span_text"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    counts = base.select(
        "id",
        F.ceil(F.size("__toks") / F.lit(span)).cast("long").alias("n_spans"),
    )
    return (
        counts.join(reassembled, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_spans",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
        )
    )


# ---------------------------------------------------------------------
# Asymmetric containment (sub-document / quote detection)
# ---------------------------------------------------------------------

def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    threshold: float = 0.8,
    strategy: str = "auto",
) -> DataFrame:
    """Directed near-CONTAINMENT pairs: ``(id_a, id_b, n_common, n_a)``
    where at least ``threshold`` of A's distinct ``k``-shingles also
    appear in B — the asymmetric signal Jaccard misses: a short
    document quoted inside a much longer one scores near-zero Jaccard
    (union is dominated by B) but containment ~1. The standard
    operator for quote/subset/boilerplate-inclusion detection.

    Two strategies (both exact; threshold compares are integer
    arithmetic, no float drift; directed, self-pairs never emit):

    - ``'expand'`` (default): inverted-index self-join on shared
      shingles — skinny (id, id) rows through the shuffle, one count
      aggregation, A-side size join. Measured faster on dense corpora
      (small vocabularies, heavy shingle co-occurrence: 5.5 s vs
      7.7 s at sf0.1), where every shingle is hot and the prefix
      prune buys little.
    - ``'prefix'``: the asymmetric PPJoin filter — containment >= t
      needs overlap ``alpha = ceil(t * n_a)``, so by pigeonhole any
      ``n_a - alpha + 1`` shingles of A must hit B; only that prefix
      of A (its globally RAREST shingles, so hot boilerplate shingles
      fall out of the index) is posted, B stays fully indexed, and
      survivors verify with one ``array_intersect``. Wins on
      realistic text whose document-frequency distribution has a long
      rare tail — the 100 TB shape when the corpus isn't degenerate.

    ``'auto'`` (default) picks ``'prefix'`` for threshold >= 0.5 else
    ``'expand'`` — the same rule as :func:`ngram_jaccard_pairs`. The
    crossover is empirical: at sf0.1 expand won narrowly (5.5 s vs
    7.7 s — small corpus, dense co-occurrence), but at sf1 the expand
    self-join emits sum(df^2) = 262M candidate rows for 501k outputs
    while the t=0.8 prefix posts only ~0.2n+1 rare shingles per doc
    (32.6 s vs 78.1 s measured) — and that gap widens with corpus
    scale, so the high-threshold default must be the prefix plan.
    """
    thr_num = int(round(threshold * 10000))
    if strategy == "auto":
        strategy = "prefix" if threshold >= 0.5 else "expand"
    if strategy not in ("expand", "prefix"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "expand":
        sh = scoped_cache(
            ensure_parallelism(df).select(
                F.col(id_col),
                F.explode(shingles(text_col, k)).alias("shingle"),
            )
        )
        a = sh.select(F.col(id_col).alias("id_a"), "shingle")
        b = sh.hint("merge").select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("id_a") != F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_common"))
        )
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_a"))
        return (
            inter.join(
                sizes.select(F.col(id_col).alias("id_a"), "n_a"), "id_a"
            )
            .where(F.col("n_common") * 10000 >= F.lit(thr_num) * F.col("n_a"))
            .select("id_a", "id_b", "n_common", "n_a")
        )

    from datacamp_etl_spark.operators.spread import evaluate_once

    base = evaluate_once(
        ensure_parallelism(df).select(
            F.col(id_col).alias("id"), F.col(text_col).alias("__txt")
        ),
        {"sh_arr": shingles("__txt", k)},
    )
    docsets = scoped_cache(
        base.select("id", "sh_arr", F.size("sh_arr").alias("n_sh"))
        .where(F.col("n_sh") > 0)
    )
    sh = docsets.select("id", "n_sh", F.explode("sh_arr").alias("shingle"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    # A-side prefix: the doc's (n_a - ceil(t*n_a) + 1) rarest shingles
    # in the global (df, shingle) total order. alpha in INTEGER
    # arithmetic — float ceil(threshold * n) rounds above the exact
    # product for some (threshold, n) (0.55*100 -> 55.000...01 ->
    # ceil 56), shortening the prefix by one and silently dropping
    # qualifying pairs the verify filter (also integer) would admit.
    alpha = F.floor(
        (F.col("n_sh") * thr_num + 9999) / 10000
    ).cast("long")
    pref_len = F.col("n_sh") - alpha + 1
    w = Window.partitionBy("id").orderBy("df", "shingle")
    # Every doc's shingles positioned in the global df order ONCE:
    # the A prefix is a filter of this relation, and the B side keeps
    # its position so the join can apply PPJoin+'s POSITIONAL filter.
    # For a shared shingle at positions (i, j) of the two df-sorted
    # sets, every further shared shingle sits after BOTH — so overlap
    # <= 1 + min(n_a - i, n_b - j), and a qualifying pair's FIRST
    # shared shingle (which the prefix theorem guarantees is posted)
    # must pass `1 + min(...) >= alpha`. Exact — no qualifying pair
    # is lost — and it prunes pairs meeting through a shingle too
    # deep in B's order for n_b - j to reach alpha (sf1: 28.2M raw
    # candidates -> 16.2M for 501k qualifying pairs).
    shpos = scoped_cache(
        sh.join(dfreq, "shingle").withColumn("__rn", F.row_number().over(w))
    )
    pref = (
        shpos.withColumn("__alpha", alpha)
        .where(F.col("__rn") <= pref_len)
        .select(
            F.col("id").alias("id_a"),
            "shingle",
            F.col("n_sh").alias("__na"),
            F.col("__rn").alias("__ra"),
            "__alpha",
        )
    )
    posted = shpos.select(
        F.col("id").alias("id_b"),
        "shingle",
        F.col("n_sh").alias("__nb"),
        F.col("__rn").alias("__rb"),
    )
    cand = (
        pref.join(posted, "shingle")
        .where(F.col("id_a") != F.col("id_b"))
        .where(
            F.least(
                F.col("__na") - F.col("__ra"), F.col("__nb") - F.col("__rb")
            )
            + 1
            >= F.col("__alpha")
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # Verify on INTEGER arrays, not the shingle strings: the
    # candidate:output ratio is ~32:1 here, so the per-pair
    # array_intersect dominates the operator, and hashing/comparing
    # 25-byte strings costs a multiple of longs. The dictionary is
    # EXACT (a unique id per distinct shingle — not a hash that could
    # collide and inflate n_common past the threshold);
    # monotonically_increasing_id is nondeterministic across
    # re-evaluations, so the dict is localCheckpoint-pinned before
    # both verify sides consume it (same hazard as ids.py).
    sdict = (
        sh.select("shingle")
        .distinct()
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    doc_ints = scoped_cache(
        sh.join(sdict, "shingle")
        .groupBy("id")
        .agg(
            F.collect_list("__mid").alias("__ints"),
            F.first("n_sh").alias("n_sh"),
        )
    )
    sa = doc_ints.select(
        F.col("id").alias("id_a"),
        F.col("__ints").alias("__sa"),
        F.col("n_sh").alias("n_a"),
    )
    sb = doc_ints.select(
        F.col("id").alias("id_b"), F.col("__ints").alias("__sb")
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "n_common", F.size(F.array_intersect("__sa", "__sb")).cast("long")
        )
        .where(F.col("n_common") * 10000 >= F.lit(thr_num) * F.col("n_a"))
        .select("id_a", "id_b", "n_common", "n_a")
    )


# ---------------------------------------------------------------------
# Exact substring dedup (Lee et al. 2022)
# ---------------------------------------------------------------------

def substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 10,
) -> DataFrame:
    """Exact substring deduplication: every maximal token span whose
    text occurs VERBATIM in >= 2 distinct documents, at span length
    >= ``min_tokens`` — the Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better", arXiv:2107.06499) capability
    that MinHash/SimHash cannot express (they score whole documents;
    this finds the shared passages themselves).

    Suffix arrays (the paper's tool) are a single-machine structure;
    the distributed shape is k-gram anchoring with ``k = min_tokens``:

    1. every token position emits the md5 of its k-token window
       (anchor) — a map-side projection, no shuffle;
    2. an anchor duplicated across >= 2 distinct docs marks its k-token
       interval as shared text (groupBy anchor hash — map-side
       partial-agg absorbs hot boilerplate anchors, then a semi-join
       back; anchors only ever meet in their own hash bucket, NEVER
       all-pairs);
    3. per document, overlapping/touching duplicated intervals merge
       into maximal spans (gaps-and-islands over positions — the
       window is partitioned by doc id, so skew is bounded by document
       length, not corpus size);
    4. each merged span is re-verified and labeled by the md5 of its
       own text (``cluster``), so content-identical maximal spans
       carry the same cluster key across documents.

    Any two docs sharing a verbatim passage of >= k tokens share ALL
    its length-k sub-windows, so anchor recall is exact (no
    probabilistic miss, unlike MinHash). A span longer than k is
    reported once, merged, not once per anchor.

    Returns ``(id_col, span_start, span_len, cluster)``, one row per
    maximal duplicated span; ``span_start`` is a 0-based token offset
    into the normalized token stream.
    """
    if min_tokens < 2:
        raise ValueError("min_tokens must be >= 2")
    k = min_tokens
    toks = tokens(text_col)
    base = scoped_cache(
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), toks.alias("__toks"))
        .where(F.size("__toks") >= k)
    )
    # (id, pos, anchor-hash) for pos in [0, n-k]; slice() is 1-based
    grams = F.transform(
        F.sequence(F.lit(0), F.size("__toks") - k),
        lambda i: F.md5(F.array_join(F.slice("__toks", i + 1, k), " ")),
    )
    anchors = base.select(
        "id", F.posexplode(grams).alias("pos", "__h")
    )
    dup_h = (
        anchors.groupBy("__h")
        .agg(F.count_distinct("id").alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("__h")
    )
    dup_anchors = anchors.join(dup_h, "__h", "left_semi")
    # gaps-and-islands: intervals [pos, pos+k) merge while the next
    # duplicated position starts within (or touching) the previous
    # interval, i.e. pos - prev <= k
    w = Window.partitionBy("id").orderBy("pos")
    islands = dup_anchors.select(
        "id",
        "pos",
        F.sum(
            F.when(
                F.col("pos") - F.lag("pos", 1, -k - 1).over(w) > k, 1
            ).otherwise(0)
        )
        .over(w)
        .alias("__island"),
    )
    spans = islands.groupBy("id", "__island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + k - F.min("pos")).alias("span_len"),
    )
    return (
        spans.join(base, "id")
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_len",
            F.md5(
                F.array_join(
                    F.slice(
                        "__toks", F.col("span_start") + 1, F.col("span_len")
                    ),
                    " ",
                )
            ).alias("cluster"),
        )
    )


def duplicate_text_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 10,
) -> DataFrame:
    """Per-document fraction of tokens inside cross-document verbatim
    spans — the quality-filter signal the Lee et al. 2022 pipeline
    derives from exact substring dedup (a doc that is 80% shared
    boilerplate is a removal candidate even if no single whole-doc
    near-dup exists). Composes :func:`substring_dedup`: its maximal
    spans are non-overlapping per doc by construction (the island
    merge), so ``sum(span_len)`` is exactly the covered token count.

    Returns ``(id_col, n_tokens, dup_tokens, dup_fraction)`` for
    EVERY input document (zero-token docs report 0.0 — never NULL,
    so a downstream ``dup_fraction < t`` filter keeps them instead of
    silently dropping). Fraction rounded to the repo-wide 6 decimals.
    """
    spans = substring_dedup(
        df, id_col, text_col, min_tokens=min_tokens
    )
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_len").alias("__dup")
    )
    base = df.select(
        F.col(id_col), F.size(tokens(text_col)).alias("n_tokens")
    )
    dup = F.coalesce(F.col("__dup"), F.lit(0))
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            dup.cast("long").alias("dup_tokens"),
            F.round(
                F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                    dup / F.col("n_tokens")
                ),
                6,
            ).alias("dup_fraction"),
        )
    )


def intra_doc_repeats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 10,
) -> DataFrame:
    """WITHIN-document repetition detection — the Lee et al. 2022
    (arXiv:2107.06499) intra-doc variant of :func:`substring_dedup`:
    maximal token spans whose content verbatim-repeats EARLIER text of
    the SAME document, at span length >= ``min_tokens``. Generated
    pages and scraped boilerplate often repeat a template inside one
    document; whole-doc near-dup scoring never sees it, and cross-doc
    substring dedup explicitly requires >= 2 documents.

    Same anchor machinery as :func:`substring_dedup`, keyed by
    (document, k-gram hash) instead of the hash alone:

    1. every token position emits the md5 of its k-token window;
    2. a position is REPEATED iff the same window content occurred at
       a smaller position of the same document (min-over-(id, hash)
       window — keep-FIRST semantics; the shuffle key is (id, hash),
       so skew is bounded by one document's anchor count, and anchors
       never leave their document);
    3. repeated positions merge into maximal spans per document
       (gaps-and-islands, window partitioned by id).

    Contract note: "repeated" is decided per WINDOW START — a span
    covers ``[start, last_repeated_start + k)``. For periodic text
    (``(A)*m``, ``|A| <= k``) every window start past the leading
    period duplicates the start ``|A|`` positions earlier, so all but
    the first period (plus the rotations inside the first window) is
    reported — aggressive, but exact and deterministic: the fixed
    point of keep-first removal.

    Returns ``(id_col, span_start, span_len, cluster)``, one row per
    maximal repeated span, ``cluster`` = md5 of the span's own text
    (same key space as substring_dedup, so cross- and intra-doc span
    tables union cleanly).
    """
    if min_tokens < 2:
        raise ValueError("min_tokens must be >= 2")
    k = min_tokens
    toks = tokens(text_col)
    base = scoped_cache(
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), toks.alias("__toks"))
        .where(F.size("__toks") >= k)
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("__toks") - k),
        lambda i: F.md5(F.array_join(F.slice("__toks", i + 1, k), " ")),
    )
    anchors = base.select("id", F.posexplode(grams).alias("pos", "__h"))
    wh = Window.partitionBy("id", "__h")
    rep = anchors.select(
        "id", "pos", F.min("pos").over(wh).alias("__mn")
    ).where(F.col("pos") > F.col("__mn"))
    w = Window.partitionBy("id").orderBy("pos")
    islands = rep.select(
        "id",
        "pos",
        F.sum(
            F.when(
                F.col("pos") - F.lag("pos", 1, -k - 1).over(w) > k, 1
            ).otherwise(0)
        )
        .over(w)
        .alias("__island"),
    )
    spans = islands.groupBy("id", "__island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + k - F.min("pos")).alias("span_len"),
    )
    return spans.join(base, "id").select(
        F.col("id").alias(id_col),
        "span_start",
        "span_len",
        F.md5(
            F.array_join(
                F.slice(
                    "__toks", F.col("span_start") + 1, F.col("span_len")
                ),
                " ",
            )
        ).alias("cluster"),
    )


def intra_doc_repeat_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 10,
) -> DataFrame:
    """Per-document fraction of tokens inside WITHIN-doc repeated
    spans — the intra-doc counterpart of
    :func:`duplicate_text_fraction`, and the filter signal for
    template-stuffed or generation-looped documents. Composes
    :func:`intra_doc_repeats` (maximal islands are non-overlapping
    per doc, so ``sum(span_len)`` is exact coverage); EVERY input
    document reports — zero-token and repeat-free docs emit 0.0,
    never NULL."""
    spans = intra_doc_repeats(df, id_col, text_col, min_tokens=min_tokens)
    per_doc = spans.groupBy(id_col).agg(F.sum("span_len").alias("__rep"))
    base = df.select(
        F.col(id_col), F.size(tokens(text_col)).alias("n_tokens")
    )
    rep = F.coalesce(F.col("__rep"), F.lit(0))
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        rep.cast("long").alias("repeat_tokens"),
        F.round(
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                rep / F.col("n_tokens")
            ),
            6,
        ).alias("repeat_fraction"),
    )


def remove_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut token ranges out of each document's normalized token
    stream — the APPLY half of span-level dedup (Lee et al. 2022 cut
    the duplicated text; finding spans without removing them fixes
    nothing). ``spans`` carries ``(id_col, span_start, span_len)``
    rows (0-based token offsets, e.g. from :func:`substring_dedup` or
    :func:`intra_doc_repeats` — whose per-doc islands are
    non-overlapping by construction).

    Returns ``(id_col, n_tokens, n_removed, cleaned_text)`` for EVERY
    input document (span-free docs report 0 removed and their
    normalized text unchanged).

    Scale shape: spans aggregate to ONE array per document (bounded by
    document length), broadcast-join back, and the cut itself is a
    higher-order-function filter over the token array — pure JVM
    expressions, no UDF, no extra shuffle beyond the per-doc span
    groupBy."""
    from datacamp_etl_spark.operators.spread import evaluate_once

    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_len")).alias("__spans")
    )
    # materialize the tokenization ONCE per row behind a projection
    # barrier — n_tokens, the filter, and n_removed all read it, and
    # CollapseProject would otherwise re-run the normalize regex per
    # reference
    base = evaluate_once(docs, {"__toks": tokens(text_col)})
    joined = base.join(sp, id_col, "left").withColumn(
        "__spans", F.coalesce("__spans", F.array())
    )
    indexed = F.transform(
        F.col("__toks"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            "__spans",
            lambda r: (s["i"] >= r["span_start"])
            & (s["i"] < r["span_start"] + r["span_len"]),
        ),
    )
    return joined.select(
        id_col,
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(kept, lambda s: s["t"]), " "
        ).alias("cleaned_text"),
    )


def substring_dedup_apply(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 10,
) -> DataFrame:
    """End-to-end exact substring dedup (Lee et al. 2022 find + CUT):
    detect cross-document verbatim spans with
    :func:`substring_dedup`, keep each span cluster's FIRST occurrence
    (smallest ``(doc_id, span_start)`` — deterministic on any engine),
    and :func:`remove_spans` every other occurrence from its
    document's token stream.

    Returns ``(id_col, n_tokens, n_removed, cleaned_text)`` for every
    document. The keep-first ranking is a window partitioned by the
    span's content cluster (fine-grained key — a cluster holds one row
    per occurrence, so skew is bounded by a single passage's
    duplication count, the quantity this operator exists to bound)."""
    spans = substring_dedup(df, id_col, text_col, min_tokens=min_tokens)
    w = Window.partitionBy("cluster").orderBy(id_col, "span_start")
    removable = (
        spans.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .select(id_col, "span_start", "span_len")
    )
    return remove_spans(df, removable, id_col, text_col)


def source_minhash_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    *,
    num_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """Corpus-overlap matrix: estimated shingle-set Jaccard between
    every pair of GROUPS (sources/dumps/snapshots), from one MinHash
    pass — the before-you-merge diagnostic for "how much of dataset B
    is already in dataset A?" (the same set-resemblance estimator as
    doc-level MinHash, Broder 1997, lifted to the union-of-shingles of
    each group; a group's signature is the element-wise min over its
    documents' shingle hashes, which :func:`minhash_signature` computes
    directly when keyed by the group column).

    Returns ``(source_a, source_b, est_jaccard)`` for ``a < b`` pairs,
    ``est_jaccard`` = fraction of the ``num_hashes`` seeds whose group
    minima collide (exact multiple of 1/num_hashes — float-safe).

    Scale shape: the corpus is touched ONCE (shingle + single groupBy
    keyed by the group — map-side combine collapses each partition to
    |groups| x num_hashes partial minima before the exchange); the
    pairwise compare runs on |groups| x num_hashes rows, broadcast-size
    by construction. Never an all-pairs join over documents.
    """
    # the signature table is bounded (|groups| x num_hashes) but its
    # lineage is the full corpus pass — cache it so the self-join's
    # two sides don't each rescan the corpus
    sig = scoped_cache(
        minhash_signature(
            df, id_col=group_col, text_col=text_col, num_hashes=num_hashes, k=k
        )
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.seed") == F.col("b.seed"))
            & (F.col(f"a.{group_col}") < F.col(f"b.{group_col}")),
        )
        .groupBy(
            F.col(f"a.{group_col}").alias("source_a"),
            F.col(f"b.{group_col}").alias("source_b"),
        )
        .agg(
            F.round(
                F.sum((F.col("a.minhash") == F.col("b.minhash")).cast("int"))
                / F.lit(float(num_hashes)),
                6,
            ).alias("est_jaccard")
        )
    )


def shingle_hashes(text_col: Column | str, k: int = 3) -> Column:
    """``array<long>`` of the md5-folded 60-bit shingle hashes of one
    row's text — the per-row form of :func:`minhash_signature`'s
    shingle hashing (identical fold, identical prime reduction)."""
    return F.transform(
        shingles(text_col, k),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % MINHASH_PRIME,
    )


def band_sigs_from_hashes(
    h_col: Column,
    *,
    num_hashes: int = 16,
    bands: int = 4,
) -> Column:
    """Band keys from a PRE-MATERIALIZED shingle-hash array (the
    output of :func:`shingle_hashes`): the ``num_hashes`` universal-
    hash minima and the ``bands`` sorted-minima md5 digests are cheap
    integer/string ops over the array — the expensive md5-per-shingle
    work must already sit in ``h_col``.

    Split from the hashing on purpose: Catalyst's CollapseProject
    inlines a projected expression into every downstream use, so
    composing hashing + minima in ONE column recomputes the md5 fold
    ``num_hashes`` times per shingle (measured 10x slower than the
    batch path at sf0.1). Materialize ``h_col`` behind a projection
    barrier first — :func:`streaming_near_dup_filter` uses
    ``spread.evaluate_once`` for exactly this.
    """
    a, b = minhash_constants(num_hashes)
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands
    mins = [
        F.array_min(
            F.transform(
                h_col, lambda x: (F.lit(a[j]) * x + F.lit(b[j])) % MINHASH_PRIME
            )
        )
        for j in range(num_hashes)
    ]
    sigs = []
    for bi in range(bands):
        band = F.array(*mins[bi * rows_per_band : (bi + 1) * rows_per_band])
        sigs.append(
            F.md5(
                F.array_join(
                    F.transform(F.array_sort(band), lambda x: x.cast("string")),
                    "|",
                )
            )
        )
    return F.when(F.size(h_col) > 0, F.array(*sigs))


def row_band_signatures(
    text_col: Column | str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> Column:
    """LSH band keys computed entirely WITHIN the row — an
    ``array<string>`` of ``bands`` md5 band signatures, value-identical
    to :func:`band_signatures`' ``band_sig`` column (same shingle
    hash, same universal-hash constants, same sorted-minhash digest),
    but built from higher-order array functions instead of
    explode + groupBy. Aggregation-free, hence legal in a STREAMING
    projection and zero-shuffle in batch.

    PERFORMANCE CAVEAT: as a single inline Column, CollapseProject
    duplicates the md5-per-shingle work into all ``num_hashes``
    minima (~10x the batch path's cost). For anything beyond one-off
    parity checks, materialize :func:`shingle_hashes` behind
    ``spread.evaluate_once`` and apply :func:`band_sigs_from_hashes`
    — the decomposition :func:`streaming_near_dup_filter` uses.
    Measured with the barrier (sf1, 50k docs): 1.9 s vs the
    explode+groupBy :func:`band_signatures`'s 13.2 s — the zero-
    shuffle row form wins whenever rows can stay rows; keep
    ``band_signatures`` for producing the exploded ``(id, band, sig)``
    index shape itself.

    Documents with no shingles (< k tokens) return NULL — never a
    band key — so empty docs cannot collide with each other.
    """
    return band_sigs_from_hashes(
        shingle_hashes(text_col, k), num_hashes=num_hashes, bands=bands
    )


def streaming_near_dup_filter(
    stream: DataFrame,
    corpus_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Streaming near-dup gate: pass through only the stream documents
    whose LSH band keys collide with NO row of the persisted corpus
    band index (the streaming analog of :func:`incremental_dedup`).

    Entirely STATELESS: band keys come from
    :func:`row_band_signatures` (a pure projection), and each band is
    checked with one stream-static LEFT OUTER equi-join against the
    distinct corpus keys for that band — no streaming aggregation, no
    watermark, no state store. A document is dropped iff any of its
    ``bands`` keys hits the index; NULL keys (< k tokens) match
    nothing and pass through.

    Scale shape: ``bands`` equi-joins against index slices that are
    distinct-deduped (so left-outer can never multiply stream rows);
    at 100 TB persist the index partitioned by band and bucketed by
    band_sig so each probe is a co-located hash lookup. Works
    identically on a batch frame (the joins are plain equi-joins).
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    from datacamp_etl_spark.operators.spread import evaluate_once

    # materialize the md5 shingle hashes ONCE per row behind a
    # projection barrier, then derive the 16 minima from the array —
    # inlining both in one column makes CollapseProject recompute the
    # md5 fold num_hashes times per shingle (measured 10x slower)
    hashed = evaluate_once(
        stream, {"__harr": shingle_hashes(F.col(text_col), k)}
    )
    out = hashed.withColumn(
        "__sigs",
        band_sigs_from_hashes(
            F.col("__harr"), num_hashes=num_hashes, bands=bands
        ),
    ).drop("__harr")
    hit_cols = []
    for bi in range(bands):
        # the static side is re-read on EVERY micro-batch: cache each
        # band's distinct key slice so a long-running stream doesn't
        # re-scan + re-dedup the full corpus index per trigger (at
        # scale, additionally persist the index pre-deduplicated and
        # partitioned by band so this slice is a pruned read)
        idx = scoped_cache(
            corpus_bands.where(F.col("band") == bi)
            .select(F.col("band_sig").alias(f"__k{bi}"))
            .distinct()
            .withColumn(f"__hit{bi}", F.lit(1))
        )
        out = out.join(
            idx, out["__sigs"][bi] == F.col(f"__k{bi}"), "left"
        ).drop(f"__k{bi}")
        hit_cols.append(f"__hit{bi}")
    keep = F.lit(True)
    for c in hit_cols:
        keep = keep & F.col(c).isNull()
    return out.where(keep).drop("__sigs", *hit_cols)
