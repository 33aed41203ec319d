"""URL canonicalization + host-level curation [EXT].

Crawl-scale corpora key nearly everything on the URL: exact-dup
detection needs a canonical form (the same page arrives as
``HTTP://WWW.Example.COM:80/a?utm_source=x&b=1#frag`` and
``http://www.example.com/a?b=1``), and per-host caps/stats need a
canonical host column. The reference's download layer stops at the
fetch-side URL rules (filename-before-``?``, ``user_info``
round-trip — ``download_manager.rb:236-250``); this module adds the
data-plane half a crawl-curation pipeline needs.

Canonicalization contract (the standard safe subset — RFC 3986 §6
syntax-based normalization plus tracking-parameter removal; nothing
that changes page identity like path case or param-value edits):

1. trim surrounding whitespace, drop the ``#fragment``;
2. lowercase the scheme and the host (ONLY those — path/query stay
   case-sensitive per RFC 3986); userinfo is preserved verbatim;
3. drop the default port (``:80`` for http, ``:443`` for https; any
   other port is kept);
4. empty path becomes ``/``;
5. split the query on ``&``, drop empty params and known tracking
   params (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``,
   ``mc_eid``, ``igshid``, ``spm``), SORT the survivors
   byte-lexicographically, rejoin; an empty survivor set drops the
   ``?`` entirely;
6. reassemble ``scheme://userinfo@host[:port]path[?query]``.

Rows that do not match the ``scheme://authority`` shape canonicalize
to NULL (callers filter or route to a quarantine) — the explicit
guard also papers over the engines' no-match disagreement (Spark
``regexp_extract`` returns ``''``, DuckDB NULL).

Execution shape: every function here is a pure per-row JVM
regex/higher-order-function expression — zero UDFs, zero shuffles;
canonicalization fuses into whatever scan feeds it at any scale.
``host_stats`` is one aggregated shuffle on the host key;
``host_cap`` composes :func:`curation.cap_per_group` over the
derived host column (rank-k per key, no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAM_RE",
    "canonicalize_url",
    "url_host",
    "url_path",
    "url_path_template",
    "template_stats",
    "parse_robots",
    "crawl_allowed",
    "host_stats",
]

#: Params dropped during canonicalization: the common client-side
#: tracking/campaign keys (Google Analytics utm_*, Google/Facebook/
#: Microsoft click ids, Mailchimp, Instagram, Alibaba spm). Matched
#: against the full ``key=value`` token; ASCII-only, identical in
#: Java regex and RE2.
TRACKING_PARAM_RE = (
    r"^(utm_[^=&]*|gclid|fbclid|msclkid|mc_eid|igshid|spm)(=.*)?$"
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"


def _canon_parts(url: Column | str):
    s = F.trim(F.col(url) if isinstance(url, str) else url)
    s = F.regexp_replace(s, "#.*", "")  # fragment off first
    scheme = F.lower(F.regexp_extract(s, _SCHEME_RE, 1))
    auth = F.regexp_extract(s, _AUTH_RE, 1)
    userinfo = F.regexp_extract(auth, "^(.*@)", 1)  # kept verbatim
    hostport = F.regexp_replace(auth, "^.*@", "")
    host = F.lower(F.regexp_replace(hostport, ":[0-9]*$", ""))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    return s, scheme, userinfo, host, port


def url_host(url: Column | str) -> Column:
    """Canonical (lowercased, port-stripped) host of a URL; NULL when
    the value does not look like ``scheme://authority``."""
    s, _scheme, _ui, host, _port = _canon_parts(url)
    return F.when(s.rlike(_SCHEME_RE), host)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL string per the module contract; NULL for
    non-URL-shaped input."""
    s, scheme, userinfo, host, port = _canon_parts(url)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.regexp_extract(s, _PATH_RE, 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    raw_q = F.regexp_extract(s, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(raw_q, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    q_join = F.array_join(kept, "&")
    q_part = F.when(q_join == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), q_join)
    )
    return F.when(
        s.rlike(_SCHEME_RE),
        F.concat(
            scheme, F.lit("://"), userinfo, host, port_part, path, q_part
        ),
    )


def host_stats(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-host crawl profile: total URL rows, distinct canonical
    URLs (the dedup-relevant count) and the host's exact ppm share of
    all URL-shaped rows — the pre-flight that decides per-host caps
    and surfaces crawler traps (one host dominating the corpus, or a
    distinct-to-total ratio near 1 on a host that should be
    template-heavy). One aggregated shuffle on the host key; the
    grand total is a 1-row scalar broadcast onto the bounded per-host
    table."""
    rows = df.select(
        url_host(url_col).alias("host"),
        canonicalize_url(url_col).alias("__canon"),
    ).where(F.col("host").isNotNull())
    per_host = rows.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("__canon").alias("n_distinct"),
    )
    total = per_host.agg(F.sum("n_urls").alias("__grand"))
    return per_host.crossJoin(F.broadcast(total)).select(
        "host",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.expr("(1000000 * n_urls) DIV __grand")
        .cast("long")
        .alias("share_ppm"),
    )


def url_path(url: Column | str) -> Column:
    """Raw path of a URL-shaped value (fragment stripped, empty path
    normalized to ``/``); NULL for non-URL-shaped input. Path case and
    percent-encoding are preserved (RFC 3986: path is case-sensitive
    and robots matching — RFC 9309 §2.2.2 — compares octets)."""
    s = F.trim(F.col(url) if isinstance(url, str) else url)
    s = F.regexp_replace(s, "#.*", "")
    raw = F.regexp_extract(s, _PATH_RE, 1)
    return F.when(
        s.rlike(_SCHEME_RE),
        F.when(raw == "", F.lit("/")).otherwise(raw),
    )


def url_path_template(url: Column | str) -> Column:
    """Structural path template: hex-alphabet runs of >= 8 chars
    collapse to ``{h}`` (session ids, content hashes) FIRST, then
    digit runs to ``{n}`` (ids, dates, pagination) — hex before
    digits because a digit run is also a hex run. An all-digit run of
    >= 8 chars therefore reads ``{h}``, deliberately: RE2 (the
    oracle's engine) has no lookahead to demand a letter, and an
    identifier that long is an identifier under either label. Two RE2-safe ``regexp_replace``
    passes over :func:`url_path`; byte-identical in Java regex and
    DuckDB RE2. The template is the unit of crawler-trap detection:
    calendars, session-keyed paths and infinite pagination all
    collapse to ONE template whose URL population explodes while its
    canonical-URL population stays ~fully distinct."""
    p = url_path(url)
    p = F.regexp_replace(p, "[0-9a-fA-F]{8,}", "{h}")
    return F.regexp_replace(p, "[0-9]+", "{n}")


def template_stats(
    df: DataFrame,
    url_col: str = "url",
    *,
    trap_min_urls: int = 100,
    trap_min_distinct_ppm: int = 990_000,
) -> DataFrame:
    """Crawler-trap detection table: per (host, path template) —
    URL rows, distinct canonical URLs, the exact millionth
    distinct-to-total ratio, and the trap verdict (a template with
    many URLs that are almost all distinct enumerates an unbounded
    space: calendars, session ids, faceted search). The flip side of
    :func:`host_stats`'s host-level view; thresholds are exact
    integer compares so the verdict replays bit-identically in any
    engine. One aggregated (map-side-combined) shuffle on the
    bounded (host, template) key."""
    rows = df.select(
        url_host(url_col).alias("host"),
        url_path_template(url_col).alias("template"),
        canonicalize_url(url_col).alias("__canon"),
    ).where(F.col("host").isNotNull())
    agg = rows.groupBy("host", "template").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("__canon").alias("n_distinct"),
    )
    distinct_ppm = F.expr("(1000000 * n_distinct) DIV n_urls")
    return agg.select(
        "host",
        "template",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        distinct_ppm.cast("long").alias("distinct_ppm"),
        (
            (F.col("n_urls") >= F.lit(trap_min_urls))
            & (distinct_ppm >= F.lit(trap_min_distinct_ppm))
        ).alias("is_trap"),
    )


def parse_robots(
    robots_df: DataFrame,
    *,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt texts into the rule table governing ``agent``
    (RFC 9309 subset): one row per applicable Allow/Disallow rule —
    ``(host, path_prefix, is_allow, prefix_len)``.

    Semantics implemented (the prefix-match core of RFC 9309 §2.2;
    ``*``/``$`` wildcards are NOT interpreted — prefixes only, the
    documented safe subset):

    - lines split on newline; ``#`` comments stripped; field names
      case-insensitive, values trimmed;
    - consecutive ``User-agent`` lines form ONE group header
      (§2.2.1); a ``User-agent`` line whose previous kept line is
      not a ``User-agent`` starts a new group;
    - a group applies to ``agent`` when its header names the agent
      token exactly (case-insensitive) or ``*`` — but if ANY group
      on the host names the agent exactly, the ``*`` groups are
      ignored (most-specific-group rule, §2.2.1);
    - empty-value ``Allow``/``Disallow`` lines carry no restriction
      and are dropped (§2.2.2).

    Execution shape: split + posexplode (one row per line), two
    bounded windows partitioned by host (robots.txt is capped at
    500 KiB by the RFC — a per-host window over its lines is
    bounded input by contract), one aggregate per group for the
    header match, one per host for the most-specific-group rule.
    Zero UDFs."""
    agent_lc = agent.lower()
    lines = robots_df.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("line_no", "line"),
    ).select(
        "host",
        "line_no",
        F.trim(F.regexp_replace("line", "#.*", "")).alias("line"),
    )
    fields = lines.select(
        "host",
        "line_no",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)).alias(
            "field"
        ),
        F.trim(
            F.regexp_extract("line", r"^[A-Za-z-]+\s*:\s*(.*)$", 1)
        ).alias("value"),
    ).where(F.col("field").isin("user-agent", "allow", "disallow"))
    w = W.partitionBy("host").orderBy("line_no")
    grouped = fields.withColumn(
        "group_id",
        F.sum(
            F.when(
                (F.col("field") == "user-agent")
                & (
                    F.coalesce(F.lag("field").over(w), F.lit(""))
                    != "user-agent"
                ),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    headers = grouped.where(F.col("field") == "user-agent").groupBy(
        "host", "group_id"
    ).agg(
        F.max(
            F.when(F.lower(F.col("value")) == agent_lc, 1).otherwise(0)
        ).alias("names_agent"),
        F.max(F.when(F.col("value") == "*", 1).otherwise(0)).alias(
            "names_star"
        ),
    )
    specific = headers.groupBy("host").agg(
        F.max("names_agent").alias("host_has_specific")
    )
    applicable = headers.join(specific, "host").where(
        (F.col("names_agent") == 1)
        | (
            (F.col("host_has_specific") == 0)
            & (F.col("names_star") == 1)
        )
    )
    rules = grouped.where(
        F.col("field").isin("allow", "disallow") & (F.col("value") != "")
    )
    return rules.join(
        applicable.select("host", "group_id"), ["host", "group_id"]
    ).select(
        "host",
        F.col("value").alias("path_prefix"),
        (F.col("field") == "allow").alias("is_allow"),
        F.length("value").cast("long").alias("prefix_len"),
    )


def crawl_allowed(
    urls_df: DataFrame,
    rules_df: DataFrame,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Gate URLs against a parsed robots rule table
    (:func:`parse_robots`): per URL — longest matching prefix wins;
    on a length tie ``Allow`` wins (RFC 9309 §2.2.2 least-restrictive
    tiebreak); no matching rule (or no rules for the host at all)
    means allowed.

    Scale shape: ONE equi-join on the host key (rules broadcast by
    default — the rule table is bounded by hosts x rule lines, tiny
    next to a URL corpus; set ``broadcast_rules=False`` to let AQE
    pick when gating against a rules table of crawl-frontier size)
    followed by one aggregated max-struct per URL — no window over
    the unbounded URL stream, so the gate also composes into a
    foreachBatch crawl frontier."""
    u = urls_df.select(
        F.col(id_col).alias("__id"),
        F.col(url_col).alias("url"),
        url_host(url_col).alias("host"),
        url_path(url_col).alias("path"),
    )
    r = rules_df.select(
        F.col("host").alias("__rhost"),
        "path_prefix",
        "is_allow",
        "prefix_len",
    )
    if broadcast_rules:
        r = F.broadcast(r)
    joined = u.join(
        r,
        (u.host == r.__rhost)
        & F.col("path").startswith(F.col("path_prefix")),
        "left",
    )
    best = joined.groupBy("__id", "url", "host", "path").agg(
        F.max(
            F.when(
                F.col("path_prefix").isNotNull(),
                F.struct(
                    F.col("prefix_len"),
                    F.col("is_allow"),
                    F.col("path_prefix"),
                ),
            )
        ).alias("m")
    )
    return best.select(
        F.col("__id").alias(id_col),
        "url",
        "host",
        "path",
        F.coalesce(F.col("m.is_allow"), F.lit(True)).alias("allowed"),
        F.col("m.path_prefix").alias("matched_prefix"),
    )
