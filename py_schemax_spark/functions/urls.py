r"""URL feature extraction — pure codegen'd regexp expressions.

Crawl curation constantly slices by URL structure (scheme allowlists,
host-level sampling, path-depth heuristics for hub-vs-content pages,
query-parameter count as a spam/faceted-navigation signal). These are
all plain column expressions: they fuse into whatever scan projection
the caller already runs — zero extra passes, zero Python.

Every pattern is lookaround-free so Java regex (engine) and RE2
(DuckDB oracle) agree byte-for-byte. Two portability details are
deliberate: end-of-string anchors use ``\z`` (Java ``$`` matches
before a trailing newline, RE2 ``$`` does not — ``\z`` means
end-of-text in both), and the query matcher requires its ``?`` to
precede any ``#`` so fragment-embedded question marks (SPA hash
routes like ``/app#/x?y=1``) don't report phantom parameters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_scheme(url: Column) -> Column:
    """Lowercased scheme ('' when the value isn't a URL)."""
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))


def url_host(url: Column) -> Column:
    """Authority host: userinfo ('user:pass@') and port stripped,
    lowercased ('' when absent) — 'https://u:p@Ex.org:8080/x' →
    'ex.org'. Stripping userinfo also keeps credentials out of
    host-level groupBys."""
    auth = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    host = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(host, r":\d+\z", ""))


def url_path(url: Column) -> Column:
    """Path component ('' when absent)."""
    return F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )


def url_path_depth(url: Column) -> Column:
    """Number of non-empty path segments ('/a/b/' → 2)."""
    return F.regexp_count(url_path(url), F.lit(r"/[^/]+"))


def url_query_param_count(url: Column) -> Column:
    """Number of non-empty '&'-separated query parameters (a '?'
    inside the fragment is NOT a query)."""
    q = F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)
    return F.regexp_count(q, F.lit(r"[^&]+"))


def url_tld(url: Column) -> Column:
    """Last dot-separated host label ('' for dotless/absent hosts).
    A heuristic, not the public-suffix list — 'co.uk' reports 'uk'."""
    return F.regexp_extract(url_host(url), r"\.([A-Za-z0-9-]+)\z", 1)


def url_features(
    df: DataFrame, url_col: str = "url", key_col: str | None = None
) -> DataFrame:
    """One-projection URL profile:
    ``([key,] scheme, host, path_depth, n_params, tld)``."""
    u = F.col(url_col)
    cols = [] if key_col is None else [F.col(key_col)]
    return df.select(
        *cols,
        url_scheme(u).alias("scheme"),
        url_host(u).alias("host"),
        url_path_depth(u).alias("path_depth"),
        url_query_param_count(u).alias("n_params"),
        url_tld(u).alias("tld"),
    )
