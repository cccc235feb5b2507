"""Deterministic text extraction from html payloads.

The per-row invariant of the engine (BASELINE.json input_hint): the
text extracted from ``html`` must be BYTE-identical to the stored
``text`` column for every url. Extraction runs as an Arrow-batched
pandas UDF over the binary column — never per-row Python (the
reference's per-document Pydantic walk is exactly what we are
replacing; SURVEY.md §2.4).

Byte-identity across the Arrow boundary is achieved by operating on
``bytes`` and decoding/encoding UTF-8 explicitly — we never rely on
pandas object coercion (SURVEY.md §7 hard-point (b)).

``extract_text_py`` is the single-process pure-Python reference
implementation; pytest asserts UDF(html) == reference(html) == text.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Fixed reversible template (FIXTURES.md §1): html is rendered from
# text, so extraction has a known byte-exact inverse.
_PRE = b"<html><head><title>d</title></head><body><article>"
_POST = b"</article></body></html>"

# minimal HTML escaping — order matters (& first on escape, last on unescape)
_ESCAPES = [(b"&", b"&amp;"), (b"<", b"&lt;"), (b">", b"&gt;")]


def render_html_py(text: Optional[str]) -> Optional[bytes]:
    """Pure-Python renderer (inverse of extraction); used by datagen
    tests to cross-check the JVM-side renderer expression."""
    if text is None:
        return None
    body = text.encode("utf-8")
    for raw, esc in _ESCAPES:
        body = body.replace(raw, esc)
    return _PRE + body + _POST


def render_html_expr(text_col: Column) -> Column:
    """JVM-side renderer: same bytes as ``render_html_py``, built from
    codegen'd string functions so datagen needs no Python at scale."""
    body = text_col
    for raw, esc in _ESCAPES:
        body = F.replace(body, F.lit(raw.decode()), F.lit(esc.decode()))
    html = F.concat(
        F.lit(_PRE.decode()), body, F.lit(_POST.decode())
    )
    return F.encode(html, "UTF-8")


def extract_text_py(html: Optional[bytes]) -> Optional[str]:
    """Single-process reference extractor: bytes in, str out.

    Returns None for unparseable payloads (missing markers / bad UTF-8)
    — the corrupt-record path (analogue of parse_error,
    reference validator.py:71-84).
    """
    if html is None:
        return None
    i = html.find(_PRE)
    j = html.rfind(_POST)
    if i < 0 or j < 0 or j < i + len(_PRE):
        return None
    body = html[i + len(_PRE): j]
    for raw, esc in reversed(_ESCAPES):
        body = body.replace(esc, raw)
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        return None


def _extract_series(html: pd.Series) -> pd.Series:
    """Batch extraction with a pyarrow-vectorized fast path: rows whose
    payload starts with the template prefix and ends with the suffix
    (the overwhelmingly common case) are sliced, unescaped, and
    UTF-8-validated entirely in Arrow C kernels — zero per-row Python.
    Non-conforming rows (corrupt blobs, junk-wrapped templates, nulls)
    fall back to ``extract_text_py`` individually, so the result is
    byte-identical to the pure-Python reference for EVERY input
    (pytest asserts this equivalence)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        arr = pa.array(html, type=pa.binary())
    except Exception:
        return html.map(extract_text_py, na_action="ignore")
    ok = pc.and_kleene(
        pc.starts_with(arr, pattern=_PRE), pc.ends_with(arr, pattern=_POST)
    )
    ok = pc.and_kleene(
        ok, pc.greater_equal(pc.binary_length(arr), len(_PRE) + len(_POST))
    )
    ok = pc.fill_null(ok, False)
    body = pc.if_else(
        ok,
        pc.binary_slice(arr, start=len(_PRE), stop=-len(_POST)),
        pa.scalar(b"", type=pa.binary()),
    )
    try:
        s = pc.cast(body, pa.string())
    except Exception:
        # invalid UTF-8 inside a conforming template — rare; the
        # per-row path returns None for exactly those rows
        return html.map(extract_text_py, na_action="ignore")
    # unescape in reverse render order (&amp; LAST, see _ESCAPES)
    for raw, esc in reversed(_ESCAPES):
        s = pc.replace_substring(
            s, pattern=esc.decode(), replacement=raw.decode()
        )
    out = s.to_pandas()
    ok_np = ok.to_numpy(zero_copy_only=False)
    if not ok_np.all():
        vals = html.to_numpy(dtype=object)
        for i in np.nonzero(~ok_np)[0]:
            out.iloc[i] = extract_text_py(vals[i])
    return out


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction: one Python invocation per record
    batch; the template fast path runs in pyarrow C kernels (see
    ``_extract_series``), per-row Python only for non-conforming
    payloads."""
    return _extract_series(html)


@pandas_udf(T.StringType())
def extract_mismatch_udf(html: pd.Series, text: pd.Series) -> pd.Series:
    """Extraction-invariant check with the compare INSIDE the batch:
    returns null when ``extract(html)`` byte-equals ``text`` (the
    overwhelmingly common case), else the observed extracted value
    (``<unextractable>`` for corrupt payloads).

    Returning ~1 null byte per clean row instead of shipping every
    extracted string back through Arrow for a JVM-side compare halves
    the Arrow traffic of the dominant python stage; the violation
    text survives only for the rare mismatching row. Extraction AND
    the equality compare are vectorized (Arrow kernels + pandas);
    per-row Python touches only non-conforming or mismatching rows."""
    import numpy as np

    ex = _extract_series(html)
    eq = (ex == text) | (ex.isna() & text.isna())
    n = len(ex)
    res: list = [None] * n
    if not bool(eq.all()):
        ex_np = ex.to_numpy(dtype=object)
        for i in np.nonzero(~eq.to_numpy(dtype=bool))[0]:
            e = ex_np[i]
            res[i] = e if e is not None else "<unextractable>"
    return pd.Series(res, dtype=object)
