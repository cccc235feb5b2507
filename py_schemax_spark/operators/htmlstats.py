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
