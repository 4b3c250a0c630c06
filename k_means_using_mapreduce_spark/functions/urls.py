"""URL canonicalization expression builders — crawl-pipeline keys.

Web-scale training corpora dedupe and group by URL long before any
content hash: the same page is crawled with and without ``www.``, with
tracking parameters (``utm_*``, ``gclid``), with fragments, with
reordered query strings. Canonicalizing first collapses those crawl
artifacts so URL-level dedup (cheap, exact) absorbs most duplication
before content-level dedup (operators/dedup.py) ever runs.

Everything here is built from `pyspark.sql.functions` regexp/array
expressions — JVM-side, whole-stage-codegen, no Python UDFs — and each
builder has a DuckDB-expressible twin in contracts/url_queries.py.
Regex patterns stay in the RE2-compatible subset (no lookaround) so
Java regex (Spark) and RE2 (DuckDB) agree.

The reference has no string functions at all (SURVEY.md §2); this
module is pure extension surface, same charter as functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Query parameters that identify a crawl/campaign, not a resource.
#: Matched as a prefix regex against ``name=value`` strings.
TRACKING_PARAM_RE = "^(utm_|fbclid=|gclid=|msclkid=|ref=|mc_cid=|mc_eid=)"

#: Two-level public suffixes for the naive registered-domain rule.
#: Deliberately a small deterministic list (a full public-suffix list
#: is a data file, not an algorithm change) — documented limitation.
TWO_LEVEL_SUFFIXES = ["co.uk", "com.au", "co.jp", "com.br", "co.in"]

_SCHEME = "^[a-zA-Z][a-zA-Z0-9+.-]*://"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(col: Column | str) -> Column:
    """Lowercased host: authority up to the first ``/``, ``?`` or
    ``#``, port and leading ``www.`` stripped; '' when the value has
    no ``scheme://`` prefix (relative URLs have no authority)."""
    host = F.lower(F.regexp_extract(_c(col), _SCHEME + "([^/?#]+)", 1))
    host = F.regexp_replace(host, ":[0-9]+$", "")  # port
    return F.regexp_replace(host, r"^www\.", "")


def url_path(col: Column | str) -> Column:
    """Normalized path: the segment after the authority up to ``?`` or
    ``#``, repeated slashes collapsed, trailing slashes stripped, and
    the empty path normalized to ``/``."""
    path = F.regexp_extract(_c(col), _SCHEME + "[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, "//+", "/")
    path = F.regexp_replace(path, "/+$", "")
    return F.when(path == "", F.lit("/")).otherwise(path)


def url_query_canonical(col: Column | str) -> Column:
    """Canonical query string: the part between ``?`` and ``#`` split
    on ``&``, tracking parameters and empty segments dropped, the
    rest SORTED (param order never distinguishes resources) and
    re-joined; '' when nothing survives."""
    raw = F.regexp_extract(_c(col), r"\?([^#]*)", 1)
    parts = F.split(raw, "&")
    kept = F.filter(
        parts, lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)
    )
    return F.array_join(F.array_sort(kept), "&")


def canonical_url(col: Column | str) -> Column:
    """Scheme-insensitive canonical form: ``https://`` + normalized
    host + normalized path + sorted filtered query (fragment always
    dropped). NULL input stays NULL; a URL with no parseable host
    canonicalizes to NULL (nothing to key on) rather than a
    ``https:///...`` artifact."""
    host = url_host(col)
    q = url_query_canonical(col)
    full = F.concat(
        F.lit("https://"),
        host,
        url_path(col),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(host == "", F.lit(None)).otherwise(full)


def registered_domain(col: Column | str) -> Column:
    """Registered (pay-level) domain of a URL: the last two host
    labels, or three when the last two are a known two-level public
    suffix (``example.co.uk``). NULL for hostless input. The suffix
    list is the small deterministic TWO_LEVEL_SUFFIXES, not the full
    public-suffix database — swap in the real list as a broadcast
    lookup table when available."""
    host = url_host(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    is_two_level = last2.isin(TWO_LEVEL_SUFFIXES)
    dom = (
        F.when(n <= 1, host)
        .when((n >= 3) & is_two_level, F.concat_ws(".", F.element_at(labels, -3), last2))
        .otherwise(last2)
    )
    return F.when(host == "", F.lit(None)).otherwise(dom)
