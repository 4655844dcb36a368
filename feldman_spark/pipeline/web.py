"""URL operators for crawl curation (beyond reference).

The front half of a Common Crawl pipeline (``io/warc.py`` →
``pipeline/text.py::strip_html``) keys everything downstream on URLs:
per-domain caps, blocklist filtering, and URL-level dedup all need the
same canonical form, and a crawl re-visits the same page as
``http://Example.com/a?utm_source=x`` and ``https://example.com/a`` —
textually distinct, semantically one document.

Everything here is a row-local regexp/array column expression in
whole-stage codegen — zero shuffles, zero UDFs, and digit-for-digit
portable to the DuckDB oracle. Deliberately NOT ``parse_url()``: the
regex cascade is engine-portable and handles the crawl's malformed tail
(missing scheme, userinfo, stray ports) by yielding empty strings
instead of errors. The scheme is consumed by a mandatory
``regexp_replace`` BEFORE authority/path extraction — an optional
``(scheme://)?`` prefix inside one big extract is ambiguous and
backtracks differently across regex engines (an authority-only URL
would re-parse its own scheme as a path).

Scale shape: normalization is free at any size (pure projection). The
usual consumers are ``pipeline/sampling.py::cap_per_group`` (one shuffle
on the domain) and ``ops/joins.py::anti_join`` against a broadcast
blocklist — both already 100 TB-shaped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["url_parts", "normalize_url", "registered_domain"]

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
# applied to the scheme-stripped remainder:
_HOST_RE = r"^(?:[^/@?#]*@)?([^/:?#]+)"
_PORT_RE = r"^(?:[^/@?#]*@)?[^/:?#]*:(\d+)"
_PATH_RE = r"^(?:[^/@?#]*@)?[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"
# default tracking params every crawl normalizer strips
_TRACKING_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def _rest(u: Column) -> Column:
    """The URL with its scheme consumed — unambiguous authority start."""
    return F.regexp_replace(u, _SCHEME_RE, "")


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of the host — the per-domain grouping key for
    caps and stats. (A full public-suffix-list lookup would broadcast the
    PSL as a map; two labels is the deterministic, dependency-free form
    and what matters for cap_per_group is only that the key is stable.)
    """
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Split a URL column into scheme / host / domain / path / query
    columns (empty string for absent parts, crawl-tolerant)."""
    u = F.col(url_col)
    rest = _rest(u)
    host = F.lower(F.regexp_extract(rest, _HOST_RE, 1))
    return df.withColumns({
        "scheme": F.lower(F.regexp_extract(u, _SCHEME_RE, 1)),
        "host": host,
        "domain": registered_domain(host),
        "path": F.regexp_extract(rest, _PATH_RE, 1),
        "query": F.regexp_extract(u, _QUERY_RE, 1),
    })


def normalize_url(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Canonicalize a URL for dedup/grouping: lowercase scheme+host, strip
    the fragment and userinfo, drop default ports (:80 http / :443
    https), drop tracking query params (utm_*, fbclid, gclid, msclkid,
    ref), sort the surviving params (order never distinguishes
    documents), collapse an empty path to ``/`` and drop a now-empty
    ``?``. Path and param VALUES keep their case — they are
    case-significant on real servers.
    """
    u = F.col(url_col)
    rest = _rest(u)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(rest, _HOST_RE, 1))
    port = F.regexp_extract(rest, _PORT_RE, 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(rest, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    return df.withColumn(
        out_col,
        F.concat(
            scheme, F.lit("://"), host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            F.when(path == "", F.lit("/")).otherwise(path),
            F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
        ),
    )
