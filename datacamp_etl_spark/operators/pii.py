"""PII detection and redaction for training-data pipelines [EXT].

Before text lands in a pretraining corpus, pipelines scan for (and
usually redact) personally identifying strings: email addresses, IP
addresses, phone-like digit runs. Both operators here are pure
per-row column kernels — ``regexp_extract_all`` / ``regexp_replace``
on the JVM, zero shuffles, zero UDFs — so at 100 TB they run inside
the scan stage and compose freely with the quality/dedup passes.

The patterns deliberately stick to ASCII character classes and
constructs with identical semantics in Java regex (Spark) and RE2
(DuckDB oracle): no lookaround, no backreferences, word boundaries
only next to ASCII. Counting uses non-overlapping leftmost matches in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "PII_TOKENS",
    "CARD_CANDIDATE_RE",
    "pii_scan",
    "pii_redact",
    "luhn_scan",
    "redact_valid_cards",
]

#: kind -> regex. Order matters for redaction (emails first so their
#: digit runs can't later match the phone pattern).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d() -]{6,}\d",
}

#: kind -> replacement token used by :func:`pii_redact`.
PII_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}


def pii_scan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document PII hit counts: one ``n_<kind>`` column per
    pattern plus the total. Counts are non-overlapping leftmost
    matches on the RAW text (each pattern scans independently).
    """
    pats = patterns or PII_PATTERNS
    c = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(c, F.lit(p), 0))
        .cast("bigint")
        .alias(f"n_{kind}")
        for kind, p in pats.items()
    ]
    out = df.select(F.col(id_col), *counts)
    total = None
    for kind in pats:
        col = F.col(f"n_{kind}")
        total = col if total is None else total + col
    return out.withColumn("n_pii", total.cast("bigint"))


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    *,
    patterns: dict[str, str] | None = None,
    tokens: dict[str, str] | None = None,
) -> DataFrame:
    """Replace every PII match with its kind token, in ``patterns``
    order (emails first — replacement tokens contain no digits, so a
    redacted email can never re-match the phone pattern). All other
    columns pass through unchanged; the text column is replaced in
    place.
    """
    pats = patterns or PII_PATTERNS
    toks = tokens or PII_TOKENS
    c = F.col(text_col)
    for kind, p in pats.items():
        c = F.regexp_replace(c, p, toks[kind])
    return df.withColumn(text_col, c)


#: Candidate payment-card pattern: 13-19 digits allowing single
#: space/dash separators. ASCII-only, identical in Java regex and RE2.
CARD_CANDIDATE_RE = r"\b(?:\d[ -]?){12,18}\d\b"


def luhn_scan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Checksum-validated payment-card detection: digit-run candidates
    (13-19 digits, space/dash separators allowed) are stripped to
    digits and validated with the Luhn mod-10 checksum — the standard
    fix for regex-only card scanning, whose false-positive rate on
    arbitrary digit runs (~90% of random 16-digit strings fail Luhn)
    makes unvalidated counts useless as a redaction trigger.

    Returns ``(id_col, n_candidates, n_valid)`` for EVERY row. Pure
    per-row JVM expression work — regexp extraction plus nested
    higher-order functions (the checksum is an ``aggregate`` over
    ``sequence(1, length)``); zero shuffles, zero UDFs, composes into
    the scan stage at any scale like the rest of the PII battery.
    """
    cand = F.regexp_extract_all(
        F.col(text_col), F.lit(CARD_CANDIDATE_RE), 0
    )
    digs = F.filter(
        F.transform(
            cand, lambda c: F.regexp_replace(c, F.lit("[^0-9]"), F.lit(""))
        ),
        lambda d: (F.length(d) >= 13) & (F.length(d) <= 19),
    )

    def luhn_total(d):
        def term(acc, i):
            digit = F.ascii(F.substring(d, i, F.lit(1))) - F.lit(48)
            doubled = digit * 2 - F.when(digit > 4, 9).otherwise(0)
            return acc + F.when(
                ((F.length(d) - i) % 2) == 1, doubled
            ).otherwise(digit)

        return F.aggregate(
            F.sequence(F.lit(1), F.length(d)), F.lit(0), term
        )

    valid = F.filter(digs, lambda d: luhn_total(d) % 10 == 0)
    return df.select(
        F.col(id_col),
        F.size(digs).cast("bigint").alias("n_candidates"),
        F.size(valid).cast("bigint").alias("n_valid"),
    )


def redact_valid_cards(
    df: DataFrame,
    text_col: str = "text",
    *,
    token: str = "<CARD>",
) -> DataFrame:
    """Redact ONLY checksum-validated card numbers — the apply half
    of :func:`luhn_scan`: blanket-masking every 13-19-digit run
    destroys order ids, ISBNs and timestamps; masking only Luhn-valid
    runs removes the actual liability at a ~10x lower false-positive
    cost. Candidates that validate are replaced (every word-boundary
    occurrence of the exact matched string) with ``token``, in
    extraction order. The replacement is ``\\b``-anchored — a plain
    literal replace would also rewrite a valid card string occurring
    as a SUBSTRING of a longer non-candidate digit run elsewhere in
    the text (e.g. inside a 20-digit identifier), corrupting non-card
    data; the boundary anchor confines redaction to standalone
    occurrences, which is also exactly what the ``\\b``-delimited
    extraction pattern matched. Candidates contain only digits,
    spaces and dashes, so splicing them into the pattern needs no
    regex escaping, and the same pattern replays verbatim in RE2
    (the DuckDB oracle).

    Same execution class as the rest of the battery: regexp extract +
    nested-HOF checksum + an ``aggregate`` fold of anchored
    ``regexp_replace`` calls — per-row JVM expressions, no shuffle,
    no UDF. Adds ``n_redacted`` (validated candidate instances from
    extraction; each standalone occurrence is one extraction hit, so
    the count equals replaced sites) next to the rewritten column.
    """
    cand = F.regexp_extract_all(
        F.col(text_col), F.lit(CARD_CANDIDATE_RE), 0
    )

    def luhn_total(d):
        def term(acc, i):
            digit = F.ascii(F.substring(d, i, F.lit(1))) - F.lit(48)
            doubled = digit * 2 - F.when(digit > 4, 9).otherwise(0)
            return acc + F.when(
                ((F.length(d) - i) % 2) == 1, doubled
            ).otherwise(digit)

        return F.aggregate(
            F.sequence(F.lit(1), F.length(d)), F.lit(0), term
        )

    def is_valid(c):
        d = F.regexp_replace(c, F.lit("[^0-9]"), F.lit(""))
        return (
            (F.length(d) >= 13)
            & (F.length(d) <= 19)
            & (luhn_total(d) % 10 == 0)
        )

    valid = F.filter(cand, is_valid)
    red = F.aggregate(
        valid,
        F.col(text_col),
        lambda acc, c: F.regexp_replace(
            acc, F.concat(F.lit("\\b"), c, F.lit("\\b")), F.lit(token)
        ),
    )
    return df.withColumn("n_redacted", F.size(valid).cast("bigint")) \
             .withColumn(text_col, red)
