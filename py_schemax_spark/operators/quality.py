"""Rule-based document quality filters: Gopher rules and C4 heuristics.

The published web-corpus curation recipes (Gopher, Rae et al. 2021
§A1.1; C4, Raffel et al. 2020 §2.2) filter pages on cheap lexical
signals before any model-based scoring. This operator computes those
signals as pure codegen'd regexp projections — zero shuffles, fusing
into the validation scan like ``textstats``/``htmlstats`` — plus the
per-rule pass flags and a combined keep/drop verdict.

Contract notes (the cross-engine rules SURVEY §7 established):

- tokens are maximal runs of non-[ \\t\\n\\r\\f] (the explicit class
  identical in Java regex, RE2, and Python);
- every ratio is integer-exact basis points (``(10000 * num) div den``)
  so a ULP cannot move a rule boundary between engines;
- line-anchored counts avoid ``$``/``(?m)`` (whose terminator sets
  differ between Java regex and RE2) via the sentinel-newline trick:
  count ``\\n``-delimited shapes over ``'\\n' || text || '\\n'``;
- no lookarounds (RE2 oracle compatibility); the alpha-word count
  exploits greedy-match semantics instead: within one whitespace-free
  run, ``W*[a-zA-Z]W*`` (W = non-space) matches exactly once iff the
  run contains an ASCII letter, and never crosses whitespace.

Reference parity: the reference validates metadata only
(`py_schemax/validate.py`); document-quality filtering is engine-new
surface for the web-corpus north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- shared lookaround-free patterns (imported by the SQL oracle) ----
WORD_RE = r"[^ \t\n\r\f]+"
WS_CHAR_RE = r"[ \t\n\r\f]"
# leading class EXCLUDES letters so the greedy prefix never has to
# backtrack to surrender the required [a-zA-Z] char (Java regex; RE2
# is linear either way and matches the same extents)
ALPHA_WORD_RE = r"[^ \t\n\r\fa-zA-Z]*[a-zA-Z][^ \t\n\r\f]*"
SYMBOL_RE = r"#|\.\.\.|…"
BULLET_LINE_RE = r"\n[ \t]*[-*•‣▪]"
ELLIPSIS_LINE_RE = r"(\.\.\.|…)[ \t]*\n"
SENTENCE_RE = r"[.!?]+"
TERMINAL_LINE_RE = r"""[.!?"'][ \t]*\n"""

# Gopher §A1.1 "must contain ≥2 of" stop set.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# C4 §2.2 drop phrases (page-level, case-insensitive).
C4_BAD_PHRASES = ["lorem ipsum", "terms of use", "privacy policy", "uses cookies"]


def _div_bp(num: Column, den: Column) -> Column:
    """Integer-exact basis points: floor(1e4·num/den); null when the
    denominator is 0 (no words / no lines) or the text is null."""
    return F.when(
        den > 0, F.floor((num.cast("long") * 10000) / den).cast("long")
    )


def _sentinel_lines(c: Column) -> Column:
    """Text wrapped in sentinel newlines so line-start/line-end shapes
    are plain ``\\n``-adjacent matches (no ``$`` semantics drift)."""
    return F.concat(F.lit("\n"), c, F.lit("\n"))


def gopher_profile(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len_x100: int = 300,
    max_mean_word_len_x100: int = 1000,
    max_symbol_bp: int = 1000,
    max_bullet_bp: int = 9000,
    max_ellipsis_bp: int = 3000,
    min_alpha_bp: int = 8000,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality-rule signals + per-rule flags + combined verdict.

    Output columns (one row per input row; null text → null signals,
    ``gopher_pass = false``):

    ``(key, n_words, mean_word_len_x100, symbol_bp, n_lines,
    bullet_bp, ellipsis_bp, alpha_bp, stop_hits,
    flag_word_count, flag_word_len, flag_symbol, flag_bullet,
    flag_ellipsis, flag_alpha, flag_stopword, gopher_pass)``

    Thresholds are the published defaults (50–100k words, mean word
    length 3–10 chars, ≤10% symbol-to-word, ≤90% bullet lines, ≤30%
    ellipsis lines, ≥80% alpha words, ≥2 stop words), overridable.
    One projection, all codegen'd regexp arithmetic: at 10^12 docs
    this runs in the scan stage with zero exchange.
    """
    c = F.col(text_col)
    lc = F.lower(c)
    n_words = F.regexp_count(c, F.lit(WORD_RE))
    # long BEFORE the ×100: a >21M-char doc would wrap 32-bit here
    word_chars = F.length(F.regexp_replace(c, WS_CHAR_RE, "")).cast("long")
    n_symbols = F.regexp_count(c, F.lit(SYMBOL_RE))
    sent = _sentinel_lines(c)
    # lines = '\n'-delimited segments of the raw text (empty text = 1)
    n_lines = F.regexp_count(c, F.lit(r"\n")) + F.lit(1)
    bullet_lines = F.regexp_count(sent, F.lit(BULLET_LINE_RE))
    ellipsis_lines = F.regexp_count(sent, F.lit(ELLIPSIS_LINE_RE))
    alpha_words = F.regexp_count(c, F.lit(ALPHA_WORD_RE))
    # stop hits: per-word equality against the Gopher stop set — the
    # same alternation trick as textstats.stopword_hits but bounded by
    # word chars on both sides WITHOUT lookarounds: count words whose
    # entire run equals a stop word by matching the run and testing
    # membership is not regexp-able lookaround-free, so split/filter
    # semantics are delegated to one codegen'd count per stop word:
    # a stop word w occurs as a whole token exactly when it appears
    # with whitespace (or string edge) on both sides — equivalently in
    # the sentinel-padded, space-normalized text ' '||t||' ' as ' w '.
    # Overlap caveat ('of of'): single-space normalization keeps
    # adjacent hits one space apart, so count matches of ' w' followed
    # by a space we do NOT consume — instead count in a doubled-space
    # rendering where every token is flanked by its own spaces.
    padded = F.concat(
        F.lit(" "),
        F.regexp_replace(F.trim(lc), r"[ \t\n\r\f]+", "  "),
        F.lit(" "),
    )
    stop_hits = None
    for w in GOPHER_STOPWORDS:
        hit = F.regexp_count(padded, F.lit(rf" {w} "))
        stop_hits = hit if stop_hits is None else stop_hits + hit

    mwl = F.when(n_words > 0, F.floor(word_chars * 100 / n_words)).cast("long")
    symbol_bp = _div_bp(n_symbols, n_words)
    bullet_bp = _div_bp(bullet_lines, n_lines)
    ellipsis_bp = _div_bp(ellipsis_lines, n_lines)
    alpha_bp = _div_bp(alpha_words, n_words)

    flags = {
        "flag_word_count": (n_words >= min_words) & (n_words <= max_words),
        "flag_word_len": (mwl >= min_mean_word_len_x100)
        & (mwl <= max_mean_word_len_x100),
        "flag_symbol": symbol_bp <= max_symbol_bp,
        "flag_bullet": bullet_bp <= max_bullet_bp,
        "flag_ellipsis": ellipsis_bp <= max_ellipsis_bp,
        "flag_alpha": alpha_bp >= min_alpha_bp,
        "flag_stopword": stop_hits >= min_stop_hits,
    }
    flag_cols = [
        F.coalesce(v, F.lit(False)).alias(k) for k, v in flags.items()
    ]
    gopher_pass = None
    for v in flags.values():
        cv = F.coalesce(v, F.lit(False))
        gopher_pass = cv if gopher_pass is None else gopher_pass & cv

    return df.select(
        F.col(key_col),
        n_words.cast("long").alias("n_words"),
        mwl.alias("mean_word_len_x100"),
        symbol_bp.alias("symbol_bp"),
        F.when(c.isNotNull(), n_lines).cast("long").alias("n_lines"),
        bullet_bp.alias("bullet_bp"),
        ellipsis_bp.alias("ellipsis_bp"),
        alpha_bp.alias("alpha_bp"),
        F.when(c.isNotNull(), stop_hits).cast("long").alias("stop_hits"),
        *flag_cols,
        gopher_pass.alias("gopher_pass"),
    )


def c4_profile(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style page filters as one codegen'd projection.

    ``(key, n_sentences, terminal_line_bp, has_lorem_ipsum, has_curly,
    has_javascript, has_bad_phrase, c4_keep)`` — drop pages with
    ``{``/``}`` (leaked code), the word "javascript" (noscript
    warnings), "lorem ipsum", policy boilerplate phrases, or fewer
    than ``min_sentences`` terminal-punctuation sentences.
    ``terminal_line_bp`` is the share of lines ending in terminal
    punctuation (C4's line-level keep rule) in basis points — a
    doc-level roll-up so the filter stays a projection; the line-level
    transform itself is ``operators/lines.py``.
    """
    c = F.col(text_col)
    lc = F.lower(c)
    sent = _sentinel_lines(c)
    n_sentences = F.regexp_count(c, F.lit(SENTENCE_RE))
    n_lines = F.regexp_count(c, F.lit(r"\n")) + F.lit(1)
    terminal_lines = F.regexp_count(sent, F.lit(TERMINAL_LINE_RE))
    has_lorem = lc.contains("lorem ipsum")
    has_curly = c.contains("{") | c.contains("}")
    # whole-token "javascript" via the padded-token trick (see above)
    padded = F.concat(
        F.lit(" "),
        F.regexp_replace(F.trim(lc), r"[ \t\n\r\f]+", "  "),
        F.lit(" "),
    )
    has_js = F.regexp_count(padded, F.lit(" javascript ")) > 0
    bad = None
    for p in C4_BAD_PHRASES:
        h = lc.contains(p)
        bad = h if bad is None else bad | h
    keep = (
        F.coalesce(~has_lorem, F.lit(False))
        & F.coalesce(~has_curly, F.lit(False))
        & F.coalesce(~has_js, F.lit(False))
        & F.coalesce(~bad, F.lit(False))
        & F.coalesce(n_sentences >= min_sentences, F.lit(False))
    )
    return df.select(
        F.col(key_col),
        n_sentences.cast("long").alias("n_sentences"),
        _div_bp(terminal_lines, n_lines).alias("terminal_line_bp"),
        has_lorem.alias("has_lorem_ipsum"),
        has_curly.alias("has_curly"),
        has_js.alias("has_javascript"),
        bad.alias("has_bad_phrase"),
        keep.alias("c4_keep"),
    )
