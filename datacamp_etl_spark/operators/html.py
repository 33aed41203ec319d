"""HTML -> text extraction [EXT] — regex tag strip + block-level
link-density boilerplate cut (trafilatura / jusText-lite).

Every quality/dedup operator downstream assumes clean text, but a
real crawl pipeline's first data-plane stage is boilerplate
stripping. This is that stage, built the house way: a FIXED, ordered
rule list of pure JVM regex/HOF column expressions — zero UDFs, zero
shuffles, a scan-stage kernel that composes in front of the
Gopher/C4/dedup chain at any scale — and every rule is replayable in
ANSI SQL (RE2-safe patterns only: no backreferences, no lookaround),
so the whole extraction is value-gated against the DuckDB oracle
exactly like ``pii.pii_redact``.

Rule order (the contract — reordering changes results):

1. strip comments ``<!-- ... -->`` (content dropped);
2. strip ``<head>...</head>`` (title/meta are not body text), then
   ``<script>``/``<style>``/``<noscript>``/``<template>`` blocks
   WITH their content (one RE2-safe pattern per tag — a
   backreference form ``<(script|style)>.*?</\\1>`` would not replay
   on RE2 engines);
3. replace block-level tags (p, div, br, li, headings, table parts,
   semantic sections, ...) with a newline — the block boundary;
4. split into blocks; per block: strip remaining inline tags to
   spaces, collapse whitespace, and compute the LINK DENSITY =
   anchor-text chars / text chars (anchor text via the group match
   of ``<a ...>(...)</a>``). Blocks that are empty or whose density
   exceeds ``max_link_density_ppm`` (exact integer-ppm compare — no
   float ratio) are dropped: nav bars, footers, link farms;
5. join surviving blocks with newlines;
6. decode HTML entities LAST (so ``&lt;tag&gt;`` can never become a
   strippable tag), with ``&amp;`` decoded after every other entity
   (decoding it first would cascade ``&amp;lt;`` -> ``&lt;`` ->
   ``<``).

Reference parity anchor: the reference has no HTML surface (its
sources are CSV/XLS, lib/etl/download_manager.rb); this is an [EXT]
north-star operator in the curation family (VERDICT r11 missing #1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["html_extract", "html_outlinks", "ENTITY_DECODE_ORDER"]

#: stripped WITH their content, in this order (all RE2-safe)
CONTENT_STRIP_PATTERNS: tuple[str, ...] = (
    r"(?s)<!--.*?-->",
    r"(?is)<head\b[^>]*>.*?</head>",
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?is)<noscript\b[^>]*>.*?</noscript>",
    r"(?is)<template\b[^>]*>.*?</template>",
)

#: open/close forms of these become block boundaries
BLOCK_TAG_PATTERN = (
    r"(?i)</?(p|div|br|hr|li|ul|ol|dl|dt|dd|h[1-6]|table|thead|tbody|"
    r"tfoot|tr|td|th|section|article|aside|header|footer|nav|"
    r"blockquote|pre|form|figure|figcaption|main)\b[^>]*>"
)

_A_TEXT = r"(?is)<a\b[^>]*>(.*?)</a>"
_ANY_TAG = r"<[^>]*>"
_WS = r"\s+"

#: decode order is part of the contract: ``&amp;`` LAST
ENTITY_DECODE_ORDER: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _block_text(b: Column) -> Column:
    """Visible text of one block: inline tags -> spaces, whitespace
    collapsed, trimmed."""
    t = F.regexp_replace(b, _ANY_TAG, " ")
    return F.trim(F.regexp_replace(t, _WS, " "))


def _anchor_text(b: Column) -> Column:
    """Concatenated anchor-link text of one block (group matches of
    the ``<a>`` pattern, inner tags stripped, collapsed)."""
    joined = F.array_join(
        F.regexp_extract_all(b, F.lit(_A_TEXT), 1), ""
    )
    t = F.regexp_replace(joined, _ANY_TAG, " ")
    return F.trim(F.regexp_replace(t, _WS, " "))


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    *,
    max_link_density_ppm: int = 500_000,
) -> DataFrame:
    """Extract main text from an HTML column (see module docstring
    for the fixed rule order). Adds ``out_col``; all other columns
    pass through. Per-row expression work only — composes into the
    scan stage, nothing shuffles, filters on the input still push
    down to the source scan.

    ``max_link_density_ppm``: a block is boilerplate when
    ``anchor_chars * 1_000_000 > max_link_density_ppm * text_chars``
    (exact integer compare; default 0.5 — jusText's classic nav/
    footer threshold).
    """
    if not 0 <= max_link_density_ppm <= 1_000_000:
        raise ValueError("max_link_density_ppm must be in [0, 1e6]")
    c = F.col(html_col)
    for pat in CONTENT_STRIP_PATTERNS:
        c = F.regexp_replace(c, pat, "")
    c = F.regexp_replace(c, BLOCK_TAG_PATTERN, "\n")
    blocks = F.split(c, r"\n+")
    keep = lambda b: (F.length(_block_text(b)) > 0) & (  # noqa: E731
        F.length(_anchor_text(b)) * F.lit(1_000_000)
        <= F.lit(int(max_link_density_ppm)) * F.length(_block_text(b))
    )
    text = F.array_join(
        F.transform(F.filter(blocks, keep), _block_text), "\n"
    )
    for ent, repl in ENTITY_DECODE_ORDER:
        text = F.replace(text, F.lit(ent), F.lit(repl))
    return df.withColumn(out_col, text)


#: double-quoted href attribute + the anchor's inner text, as two
#: group matches of ONE pattern (RE2-safe: no backreferences)
_A_HREF_TEXT = r'(?is)<a\b[^>]*\shref\s*=\s*"([^"]*)"[^>]*>(.*?)</a>'

#: scheme://host prefix of an absolute URL (group 1 = authority)
_URL_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def html_outlinks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Outlink extraction — the crawl-graph feed that pairs with
    :func:`html_extract`'s text feed: one row per ``<a href="...">``
    anchor with the link target, its lowercased target HOST (empty
    string for relative/internal links — no authority component) and
    the anchor text (inner tags stripped, whitespace collapsed). The
    (doc -> host) edges drive frontier prioritization, host-graph
    PageRank and link-spam signals downstream.

    Zero-UDF plan: href and anchor text are the two group matches of
    ONE RE2-safe pattern, extracted with two ``regexp_extract_all``
    passes (same match sequence by construction) and zipped
    positionally — scan-stage expression work, one explode, nothing
    shuffles. Anchors without an href (or with single-quoted ones —
    out of the fixed contract) are not emitted. Returns
    ``(id_col, href, host, anchor_text)``.
    """
    c = F.col(html_col)
    # strip comments and script/style first so commented-out or
    # scripted markup can't emit links (same rule order as
    # html_extract's content strip)
    for pat in CONTENT_STRIP_PATTERNS:
        c = F.regexp_replace(c, pat, "")
    hrefs = F.regexp_extract_all(c, F.lit(_A_HREF_TEXT), 1)
    texts = F.regexp_extract_all(c, F.lit(_A_HREF_TEXT), 2)
    pair = F.explode(F.arrays_zip(hrefs.alias("href"), texts.alias("txt")))
    out = df.select(F.col(id_col), pair.alias("__a")).select(
        id_col,
        F.col("__a.href").alias("href"),
        F.lower(
            F.regexp_extract(F.col("__a.href"), _URL_HOST, 1)
        ).alias("host"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("__a.txt"), _ANY_TAG, " "),
                _WS,
                " ",
            )
        ).alias("anchor_text"),
    )
    return out
