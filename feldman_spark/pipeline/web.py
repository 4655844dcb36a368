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

import functools
from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_parts",
    "normalize_url",
    "registered_domain",
    "host_suffixes",
    "blocklist_filter",
    "parse_robots",
    "compile_robots_rules",
    "robots_allowed",
    "robots_filter",
]

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


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host, most-specific first
    (``a.b.example.com`` → ``[a.b.example.com, b.example.com,
    example.com, com]``) — the expansion that turns "blocked domain OR
    any subdomain of it" into a plain EQUALITY match: a host is blocked
    iff any of its suffixes appears in the blocklist. Row-local array
    codegen; a host has ≤ a handful of labels, so the expansion is
    O(labels), not O(blocklist)."""
    labels = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )


def blocklist_filter(
    df: DataFrame,
    blocked: Union[Sequence[str], DataFrame],
    host_col: str = "host",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every row whose host is a blocked domain or a subdomain of
    one — the crawl-curation domain blocklist (robots/manual-ban lists).

    Two shapes, both suffix-equality (never a ``LIKE '%...'`` scan or a
    nested-loop join):

    * ``blocked`` as a Python sequence (config-sized lists, the common
      case): compiled into a literal array, matched row-locally with
      ``arrays_overlap`` over :func:`host_suffixes` — zero joins, zero
      shuffles, the filter rides the scan.
    * ``blocked`` as a single-column DataFrame (million-entry curated
      lists): each row explodes into its suffix chain, inner-joins the
      broadcast blocklist to a distinct hit-id set, and the result is a
      LEFT ANTI join of the input against those ids — two broadcast hash
      joins, corpus never shuffles.
    """
    host = F.lower(F.col(host_col))
    if isinstance(blocked, DataFrame):
        bcol = blocked.columns[0]
        b = blocked.select(F.lower(F.col(bcol)).alias("_suf")).distinct()
        hits = (
            df.select(F.col(id_col),
                      F.explode(host_suffixes(host)).alias("_suf"))
            .join(F.broadcast(b), "_suf")
            .select(id_col).distinct()
        )
        return df.join(F.broadcast(hits), id_col, "left_anti")
    arr = F.array(*[F.lit(str(x).lower()) for x in blocked])
    return df.filter(~F.arrays_overlap(host_suffixes(host), arr))


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


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309) — crawl-permission evaluation
# ---------------------------------------------------------------------------

def parse_robots(txt: str, user_agent: str = "*"):
    """Parse a robots.txt body and return the rule list for
    ``user_agent`` per RFC 9309 group selection: the group whose
    ``User-agent`` product token is the LONGEST case-insensitive prefix
    of ``user_agent`` wins; the ``*`` group is the fallback; multiple
    ``User-agent`` lines stack onto one group. Returns a list of
    ``(allow: bool, pattern: str)`` rules (empty list = everything
    allowed). Unknown directives and comments are ignored, per spec."""
    groups = []          # (agents, rules)
    agents, rules, in_rules = [], [], False
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_rules:     # a new group starts after rules were seen
                groups.append((agents, rules))
                agents, rules, in_rules = [], [], False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if val or key == "disallow":
                # empty Disallow == allow everything (a no-op rule);
                # keep it out of the list so longest-match stays clean
                if val:
                    rules.append((key == "allow", val))
    if agents or rules:
        groups.append((agents, rules))
    ua = (user_agent or "*").lower()
    best_len, best_rules = -1, []
    star_rules = None
    for ags, rls in groups:
        for a in ags:
            if a == "*":
                if star_rules is None:
                    star_rules = rls
            elif ua.startswith(a) and len(a) > best_len:
                best_len, best_rules = len(a), rls
    if best_len >= 0:
        return list(best_rules)
    return list(star_rules or [])


@functools.lru_cache(maxsize=65536)
def _compile_robots_pattern(pattern: str):
    """Compile an RFC 9309 pattern (literal octets, ``*`` any sequence,
    trailing ``$`` anchors the end; prefix match otherwise) to a
    ``re.Pattern``. Compiled once per distinct pattern (lru_cache) so
    the hot matching loop never touches the regex compiler."""
    import re as _re

    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = ".*".join(_re.escape(part) for part in pattern.split("*"))
    return _re.compile("^" + rx + ("$" if anchored else ""))


def compile_robots_rules(rules):
    """Precompile :func:`parse_robots` output to ``(allow, pattern_len,
    compiled_match)`` triples — the form :func:`robots_allowed` and
    :func:`robots_filter` evaluate, so a host's rule list compiles once
    and matches thousands of its pages regex-compiler-free."""
    return [(allow, len(p), _compile_robots_pattern(p).match)
            for allow, p in rules]


def robots_allowed(path: str, rules) -> bool:
    """Evaluate a URL target against robots rules: the longest-pattern
    match wins; an Allow beats a Disallow of equal length; no match =
    allowed (RFC 9309 §2.2.2). ``path`` should include the query string
    (``/search?q=x``) — reference evaluators (google/robotstxt) match
    path + '?' + query, so patterns like ``Disallow: /*?sessionid=``
    work. Accepts raw ``(allow, pattern)`` pairs from
    :func:`parse_robots` or precompiled triples from
    :func:`compile_robots_rules`."""
    if not path.startswith("/"):
        path = "/" + path
    best_len, verdict = -1, True
    for rule in rules:
        if len(rule) == 2:
            allow, pattern = rule
            plen, match = len(pattern), _compile_robots_pattern(pattern).match
        else:
            allow, plen, match = rule
        if match(path):
            if plen > best_len or (plen == best_len and allow):
                best_len, verdict = plen, allow
    return verdict


def robots_filter(
    pages: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
    user_agent: str = "*",
    out_col: str = "crawl_allowed",
) -> DataFrame:
    """Annotate pages with RFC 9309 crawl permission: join each page to
    its host's robots.txt and evaluate the page path against the
    ``user_agent`` group. Returns the pages frame + ``out_col``
    boolean (hosts with no robots row allow everything).

    Pages are matched on path + '?' + query (google/robotstxt
    semantics), so ``Disallow: /*?sessionid=`` works.

    Scale shape: the robots table is hosts-sized (small side — Catalyst
    broadcasts it under AQE; hint it if your host list is huge), the
    join is host-keyed, and evaluation is an Arrow-batched
    ``mapInPandas``. Each distinct ``(host, robots body)`` PAIR parses
    and regex-compiles its rules once per task (memo keyed by the pair,
    so dirty crawls with duplicate host rows carrying different bodies
    stay deterministic per row), with the rules PRECEDENCE-SORTED —
    longest pattern first, Allow before Disallow at equal length — so
    per-page evaluation is first-``.match``-wins and short-circuits
    after ~2 C-level regex calls instead of scanning the whole rule
    list (RFC 9309's longest-match/Allow-ties semantics are exactly
    this sort order). A fully pandas-``str.match``-vectorized variant
    was built and MEASURED SLOWER (1.7-2.8x on a 1M-page crawl,
    interleaved or host-clustered): pandas applies a regex per element
    in a Python-level loop internally, so "vectorization" adds batch
    bookkeeping without removing the per-element regex cost — numbers
    in docs/SCALING.md. Page text never moves."""
    from typing import Iterator

    import pandas as pd

    from pyspark.sql.types import BooleanType, StructField, StructType

    rest = F.regexp_replace(F.col(url_col), _SCHEME_RE, "")
    host = F.lower(F.regexp_extract(rest, _HOST_RE, 1))
    query = F.regexp_extract(F.col(url_col), _QUERY_RE, 1)
    # RFC 9309 evaluators match path + '?' + query, not the bare path
    path = F.concat(
        F.regexp_extract(rest, _PATH_RE, 1),
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")))
    joined = (
        pages.withColumn("_h", host).withColumn("_p", path)
        .join(robots.select(F.lower(F.col(host_col)).alias("_h"),
                            F.col(robots_col).alias("_robots")),
              "_h", "left")
    )
    schema = StructType(list(joined.schema.fields)
                        + [StructField(out_col, BooleanType(), True)])

    def run(batches: "Iterator[pd.DataFrame]"):
        # memo keyed by (host, body): one parse+compile per distinct
        # robots body per host across the task's batches; value is
        # precedence-sorted (allow, match_method) pairs — longest
        # pattern first, Allow before Disallow at equal length, so the
        # FIRST match is the RFC 9309 winner and the loop breaks there
        cache: dict = {}
        for pdf in batches:
            out = pdf.copy()
            verdicts = []
            for h, txt, p in zip(pdf["_h"], pdf["_robots"], pdf["_p"]):
                if txt is None:
                    verdicts.append(True)
                    continue
                rules = cache.get((h, txt))
                if rules is None:
                    rules = sorted(
                        ((allow, len(pt), _compile_robots_pattern(pt).match)
                         for allow, pt in parse_robots(txt, user_agent)),
                        key=lambda t: (-t[1], not t[0]))
                    rules = [(allow, match) for allow, _plen, match in rules]
                    cache[(h, txt)] = rules
                if not p:
                    p = "/"
                elif not p.startswith("/"):
                    p = "/" + p
                for allow, match in rules:
                    if match(p):
                        verdicts.append(allow)
                        break
                else:
                    verdicts.append(True)   # no match = allowed
            out[out_col] = verdicts
            yield out

    return (joined.mapInPandas(run, schema=schema)
            .drop("_h", "_p", "_robots"))
