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


# candidate card numbers: 13-19 digits, optionally space/dash
# separated in groups (the common 4-4-4-4 print form)
CARD_CANDIDATE_RE = r"\b\d[\d -]{11,21}\d\b"


def luhn_valid(c: Column) -> Column:
    """Luhn (mod-10) checksum verdict for a candidate card-number
    string — THE precision upgrade for card-number PII: the
    13-19-digit regex alone flags timestamps, ids, and phone numbers,
    while only ~1 in 10 random digit strings passes Luhn. Null for
    inputs without 13-19 digits after separator stripping.

    Pure JVM higher-order expressions (digits → reverse → indexed
    double-every-second → aggregate), folded ONCE over a materialized
    array per the SURVEY §7 interpreted-HOF rule — no Python, no
    shuffle; rides the validation scan."""
    digits = F.regexp_replace(c, r"[^0-9]", "")
    n = F.length(digits)
    # rightmost digit is position 0: reverse, then double odd indexes
    arr = F.reverse(F.regexp_extract_all(digits, F.lit(r"\d"), 0))

    def _lhn(d: Column, i: Column) -> Column:
        v = d.cast("int")
        dbl = v * 2
        # doubled digit with digit-sum fold (14 -> 5, 18 -> 9)
        return F.when(
            i % 2 == 1, dbl - F.when(dbl > 9, F.lit(9)).otherwise(F.lit(0))
        ).otherwise(v)

    summed = F.aggregate(
        F.transform(arr, _lhn), F.lit(0), lambda acc, x: acc + x
    )
    return F.when(
        n.between(13, 19), summed % 10 == 0
    ).otherwise(F.lit(None).cast("boolean"))


def card_scan(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Per-document card-number report: regex candidates vs
    Luhn-VALIDATED hits — ``(key, n_candidates, n_valid_cards)``.
    Redaction policy upstream should key on ``n_valid_cards`` (drop/
    redact) vs ``n_candidates`` alone (mostly false positives).

    One projection: candidates extracted in-row
    (``regexp_extract_all``), each checksummed by the folded HOF —
    zero exchanges, plan-compatible with the validation scan."""
    c = F.col(text_col)
    # null text -> zero candidates (a missing body is not card PII)
    cands = F.coalesce(
        F.regexp_extract_all(c, F.lit(CARD_CANDIDATE_RE), 0),
        F.array().cast("array<string>"),
    )
    # materialize the array ONCE (SURVEY §7: HOFs over computed
    # children re-evaluate per element)
    base = df.select(F.col(key_col), cands.alias("_cands"))
    valid = F.filter(
        F.col("_cands"), lambda x: F.coalesce(luhn_valid(x), F.lit(False))
    )
    return base.select(
        key_col,
        F.size("_cands").cast("int").alias("n_candidates"),
        F.size(valid).cast("int").alias("n_valid_cards"),
    )
