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
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAM_RE",
    "canonicalize_url",
    "url_host",
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
