"""Unicode text normalization (pre-tokenization cleanup).

Web-extracted text mixes composed and decomposed Unicode forms
('café' appears both as U+00E9 and as 'e'+U+0301), carries stray
control characters from broken encodings, and pads words with
tab/space runs. Every downstream operator in this engine that keys on
exact strings — exact dedup, line dedup, shingles, token n-grams —
treats those as *different* documents, so corpus pipelines normalize
first (CCNet and C4 both canonicalize whitespace; Unicode TR#15
defines NFC as the interchange form). No reference analogue (the
reference validates schema files, not corpora); part of the north
star's training-pipeline toolkit.

Contract — a fixed four-step rewrite chosen so a SQL engine with
RE2 + utf8proc (DuckDB: ``nfc_normalize``) reproduces it
byte-for-byte, in this exact order:

1. **NFC** canonical composition of the raw text;
2. strip control characters ``[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]``
   (C0 minus tab/newline/CR/formfeed, plus DEL);
3. collapse horizontal-whitespace runs ``[ \\t]+`` to one space
   (newlines survive — line structure feeds line-level dedup);
4. trim leading/trailing ``[ \\t\\n\\r\\f]`` runs, anchored with
   ``\\A``/``\\z`` — NOT ``^``/``$``: Java's ``$`` also matches
   *before* a final line terminator even without MULTILINE, RE2's
   does not, so dollar-anchored trims disagree on texts ending in
   a newline. ``\\A``/``\\z`` mean the same thing in both engines.

Null text stays null at every step.

Scale shape: steps 2-4 are codegen'd JVM ``regexp_replace`` fused
into the scan projection. Step 1 is the one step Spark has no
built-in for — an Arrow-batched UDF, with a per-value
``str.isascii()`` short-circuit (C-speed scan, no allocation) so the
dominant ASCII web text pays no normalization work and non-ASCII
rows pay one ``unicodedata.normalize`` each. The plan is a pure
projection: one ArrowEvalPython stage, zero exchanges
(plan-asserted in tests).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

# shared with the SQL oracle (RE2 and Java regex read these the same:
# two-digit hex escapes, explicit classes, \A/\z anchors)
CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
HWS_RUN_RE = r"[ \t]+"
LEAD_WS_RE = r"\A[ \t\n\r\f]+"
TRAIL_WS_RE = r"[ \t\n\r\f]+\z"


@pandas_udf(T.StringType())
def nfc_udf(s: pd.Series) -> pd.Series:
    """NFC canonical composition, null-preserving. ASCII values are
    returned as-is (NFC is the identity on ASCII; ``isascii`` is a
    C-level scan, so mostly-ASCII corpora skip the normalizer)."""
    return s.map(
        lambda v: v
        if v is None or v.isascii()
        else unicodedata.normalize("NFC", v)
    )


def normalize_expr(c: Column) -> Column:
    """The full four-step rewrite as one column expression."""
    n = nfc_udf(c)
    n = F.regexp_replace(n, CTRL_RE, "")
    n = F.regexp_replace(n, HWS_RUN_RE, " ")
    n = F.regexp_replace(n, LEAD_WS_RE, "")
    return F.regexp_replace(n, TRAIL_WS_RE, "")


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    passthrough: bool = False,
) -> DataFrame:
    """Per-document normalized text: ``(key_col, norm_text, n_raw,
    n_norm, changed)``.

    ``n_raw``/``n_norm`` are character counts before/after (null for
    null text); ``changed`` is false for null text. ``passthrough``
    carries every input column through (still one projection)."""
    if passthrough:
        from py_schemax_spark.operators.common import (
            check_passthrough_collisions,
        )

        check_passthrough_collisions(
            df,
            ["norm_text", "n_raw", "n_norm", "changed"],
            "normalize_text",
        )
    c = F.col(text_col)
    norm = normalize_expr(c)
    base = list(df.columns) if passthrough else [key_col]
    return df.select(
        *[F.col(x) for x in base],
        norm.alias("norm_text"),
        F.length(c).alias("n_raw"),
        F.length(norm).alias("n_norm"),
        F.coalesce(norm != c, F.lit(False)).alias("changed"),
    )


def normalize_py(v: str | None) -> str | None:
    """Driver-side python twin of :func:`normalize_expr` (tests)."""
    import re

    if v is None:
        return None
    n = v if v.isascii() else unicodedata.normalize("NFC", v)
    n = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", n)
    n = re.sub(r"[ \t]+", " ", n)
    n = re.sub(r"\A[ \t\n\r\f]+", "", n)
    return re.sub(r"[ \t\n\r\f]+\Z", "", n)
