"""HTML structure profiling — markup-density quality signals.

Curation pipelines filter crawled pages on structural signals before
any text-quality model runs: script-heavy pages, link farms
(boilerplate navigation), and markup-dominated pages with little
visible text. This operator computes those signals as pure codegen'd
regexp projections over the ``html`` payload — zero shuffles, fuses
into the scan, and (like ``url_features``) every pattern is
lookaround-free so Java regex and the RE2-based SQL oracle agree.

Signals (all integer-exact):

- ``html_bytes`` — payload size in bytes;
- ``n_tags`` — opening/self-closing tags (``<[a-zA-Z][^>]*>``);
- ``n_links`` — anchor tags;
- ``n_scripts`` — script tags (case-insensitive via explicit classes);
- ``text_bp`` — visible-text bytes (markup stripped) as basis points
  of total bytes: the text-to-markup ratio that separates content
  pages from chrome.

This is a lexical profile, not an HTML parse: malformed markup counts
approximately, which is exactly what a 10^12-page pre-filter wants
(the real parser runs only on pages that survive). Null html → all
null signals (the corrupt-payload path reports through extraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lookaround-free, RE2-compatible patterns (shared verbatim with the
# SQL oracle via import)
TAG_RE = r"<[a-zA-Z][^>]*>"
LINK_RE = r"<[aA][ \t\n\r\f>]"
SCRIPT_RE = r"<[sS][cC][rR][iI][pP][tT][ \t\n\r\f>]"
STRIP_RE = r"<[^>]*>"


def html_profile(
    df: DataFrame,
    html_col: str = "html",
    key_col: str = "url",
) -> DataFrame:
    """Per-page markup profile
    ``(key_col, html_bytes, n_tags, n_links, n_scripts, text_bp)``.
    ``html_col`` may be binary (decoded as UTF-8) or string."""
    src = df.schema[html_col].dataType.typeName()
    h = (
        F.decode(F.col(html_col), "UTF-8")
        if src == "binary"
        else F.col(html_col)
    )
    staged = df.select(
        F.col(key_col),
        h.alias("_h"),
        F.regexp_replace(h, STRIP_RE, "").alias("_stripped"),
    )
    return staged.select(
        F.col(key_col),
        F.octet_length("_h").alias("html_bytes"),
        F.regexp_count("_h", F.lit(TAG_RE)).alias("n_tags"),
        F.regexp_count("_h", F.lit(LINK_RE)).alias("n_links"),
        F.regexp_count("_h", F.lit(SCRIPT_RE)).alias("n_scripts"),
        F.when(
            F.octet_length("_h") > 0,
            # `div` = exact integral division (a floored double
            # quotient can sit a ULP off an integer boundary); the
            # bigint cast BEFORE the x10000 — octet_length is 32-bit
            # and a >214KB stripped text would wrap the int multiply
            F.expr(
                "(10000 * cast(octet_length(_stripped) as bigint))"
                " div octet_length(_h)"
            ),
        ).alias("text_bp"),
    )


# metadata extraction patterns — lookaround-free, case-insensitivity
# via explicit classes (shared verbatim with the SQL oracle);
# attribute order varies in the wild, so name/content (and
# rel/href) are tried in BOTH orders and coalesced
TITLE_RE = r"<[tT][iI][tT][lL][eE][^>]*>([^<]*)"
META_DESC_NC_RE = (
    r"""<[mM][eE][tT][aA][^>]*[nN][aA][mM][eE][ \t]*=[ \t]*"""
    r"""["']description["'][^>]*[cC][oO][nN][tT][eE][nN][tT]"""
    r"""[ \t]*=[ \t]*["']([^"']*)"""
)
META_DESC_CN_RE = (
    r"""<[mM][eE][tT][aA][^>]*[cC][oO][nN][tT][eE][nN][tT]"""
    r"""[ \t]*=[ \t]*["']([^"']*)["'][^>]*[nN][aA][mM][eE]"""
    r"""[ \t]*=[ \t]*["']description["']"""
)
CANONICAL_RH_RE = (
    r"""<[lL][iI][nN][kK][^>]*[rR][eE][lL][ \t]*=[ \t]*"""
    r"""["']canonical["'][^>]*[hH][rR][eE][fF][ \t]*=[ \t]*"""
    r"""["']([^"']*)"""
)
CANONICAL_HR_RE = (
    r"""<[lL][iI][nN][kK][^>]*[hH][rR][eE][fF][ \t]*=[ \t]*"""
    r"""["']([^"']*)["'][^>]*[rR][eE][lL][ \t]*=[ \t]*"""
    r"""["']canonical["']"""
)
HTML_LANG_RE = (
    r"""<[hH][tT][mM][lL][^>]*[lL][aA][nN][gG][ \t]*=[ \t]*"""
    r"""["']([^"']*)"""
)


def html_metadata(
    df: DataFrame,
    html_col: str = "html",
    key_col: str = "url",
) -> DataFrame:
    """Document metadata from raw markup: ``(key_col, title,
    meta_description, canonical_url, html_lang)`` — the fields a crawl
    index keeps per page (dedup joins on ``canonical_url``; lang
    routing cross-checks ``html_lang`` against the detector).

    Pure codegen'd ``regexp_extract`` projection over the (cast)
    payload — zero shuffles, fuses into the scan, binary or string
    input. First match wins (matching lexical-profile semantics: this
    is a pre-filter, not an HTML parser); absent fields are NULL, not
    ``''``, so downstream null-rate stats see them."""
    h = F.col(html_col).cast("string")

    def _first(*pats: str) -> F.Column:
        out = None
        for p in pats:
            x = F.nullif(F.regexp_extract(h, p, 1), F.lit(""))
            out = x if out is None else F.coalesce(out, x)
        return out

    return df.select(
        F.col(key_col),
        _first(TITLE_RE).alias("title"),
        _first(META_DESC_NC_RE, META_DESC_CN_RE).alias(
            "meta_description"
        ),
        _first(CANONICAL_RH_RE, CANONICAL_HR_RE).alias("canonical_url"),
        _first(HTML_LANG_RE).alias("html_lang"),
    )
