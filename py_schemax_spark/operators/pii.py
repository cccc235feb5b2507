"""PII detection and redaction for training-data pipelines.

Regex-based scanners for the classic web-text PII classes (email,
IPv4, international-format phone), as pure JVM expressions
(``regexp_count`` / chained ``regexp_replace``) — codegen'd, zero
Python in the hot path, so a PII pass rides the same scan as the
other per-document signals at ~zero marginal cost.

The patterns deliberately avoid lookaround so the SAME pattern text
runs under both Java regex (Spark) and RE2 (the DuckDB oracle) with
identical leftmost-first, greedy-quantifier semantics. Redaction is
order-dependent (an email's domain can look like a dotted quad), so
``redact_pii`` fixes the order email → IPv4 → phone and the scan
counts are computed on the ORIGINAL text.

Scale note: this is a projection — no shuffle, no state; it belongs
inside the validation scan's whole-stage-codegen span alongside the
constraint predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern/placeholder pairs, applied in this order. No lookaround
# (RE2-compatible); word boundaries are plain ``\b`` (ASCII in RE2,
# equivalent here since every pattern edge is ASCII).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]\d{3}[ -]\d{3,4}[ -]\d{3,4}\b", "<PHONE>"),
]


def pii_count(c: Column, kind: str) -> Column:
    """Count of non-overlapping matches of one PII class in ``c``."""
    pat = next(p for k, p, _ in PII_PATTERNS if k == kind)
    return F.regexp_count(c, F.lit(pat))


def redact_pii(c: Column) -> Column:
    """``c`` with every PII match replaced by its class placeholder,
    applied in ``PII_PATTERNS`` order (email first — its domain part
    could otherwise be partially consumed by the IPv4 rule)."""
    out = c
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_scan(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII report: match count per class (on the original
    text), plus length and md5 of the redacted text — the md5 lets a
    byte-exact oracle check the full redaction output without hauling
    document bodies through the comparison."""
    c = F.col(text_col)
    red = redact_pii(c)
    return df.select(
        F.col(key_col),
        pii_count(c, "email").cast("long").alias("n_email"),
        pii_count(c, "ipv4").cast("long").alias("n_ipv4"),
        pii_count(c, "phone").cast("long").alias("n_phone"),
        F.length(red).cast("long").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )
