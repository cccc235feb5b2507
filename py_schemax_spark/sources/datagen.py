"""Deterministic synthetic pages-table generator (FIXTURES.md §1).

Target shape is the authoritative input_hint from BASELINE.json:
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — Common-Crawl-style.

Everything is generated DISTRIBUTIVELY from ``spark.range(n)`` with
JVM-side expressions only (xxhash64-derived pseudo-randomness — no
wall-clock, no Python RNG, no driver-side materialization), so the
same generator that makes 1k pytest rows would make 10^12 rows on a
cluster without a driver bottleneck. Seeded violation injection:

- duplicate urls (~0.5%) with differing warc_ts → uniqueness checks,
  attribution deterministic via warc_ts
- null text (~1%) and empty text (~2%) → nullable / min_length
- invalid lang codes (~0.2%) → referential anti-join vs lang_dim
- corrupt html blobs (~0.1%) → extraction parse-error path
- Zipf-ish hot-domain skew → exercises salting / AQE skew handling

``html`` is rendered from ``text`` by the fixed reversible template in
``functions/extraction.py``, so extraction has a known byte-exact
inverse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from py_schemax_spark.functions.extraction import render_html_expr

# ISO-639-1 codes for the lang dimension (valid domain of pages.lang)
LANGS = [
    ("en", "English"), ("de", "German"), ("fr", "French"), ("es", "Spanish"),
    ("it", "Italian"), ("pt", "Portuguese"), ("nl", "Dutch"), ("pl", "Polish"),
    ("ru", "Russian"), ("ja", "Japanese"), ("zh", "Chinese"), ("ko", "Korean"),
    ("ar", "Arabic"), ("tr", "Turkish"), ("sv", "Swedish"), ("da", "Danish"),
    ("fi", "Finnish"), ("no", "Norwegian"), ("cs", "Czech"), ("el", "Greek"),
    ("he", "Hebrew"), ("hi", "Hindi"), ("th", "Thai"), ("vi", "Vietnamese"),
]

# word vocabulary incl. multibyte UTF-8 (byte-identity across Arrow —
# SURVEY.md §7 hard-point (b) — must be exercised, not avoided)
_VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "data",
    "spark", "page", "crawl", "web", "text", "html", "café", "naïve",
    "über", "straße", "日本語", "中文", "한국어", "Ελληνικά", "עברית",
    "signal", "noise", "token", "corpus", "shard", "batch", "quality",
    "filter", "dedup", "index", "graph", "vector", "résumé", "piñata",
]

_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z, fixed (no wall-clock)


def _h(seed_tag: int, *cols: Column) -> Column:
    """Deterministic 64-bit hash stream, one per seed_tag."""
    return F.xxhash64(F.lit(seed_tag), *cols)


def _u01(seed_tag: int, *cols: Column) -> Column:
    """Deterministic uniform [0,1) derived from the hash stream."""
    return (F.pmod(_h(seed_tag, *cols), F.lit(1_000_000))) / F.lit(1_000_000.0)


def gen_pages(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_domains: int = 500,
    dup_rate: float = 0.005,
    null_text_rate: float = 0.01,
    empty_text_rate: float = 0.02,
    bad_lang_rate: float = 0.002,
    corrupt_html_rate: float = 0.001,
    clean: bool = False,
    num_partitions: int | None = None,
    words_scale: int = 1,
) -> DataFrame:
    """Deterministic pages DataFrame. ``clean=True`` disables all
    violation injection (used to build drift baselines / golden runs).

    ``words_scale`` repeats each document's base sentence N times —
    used by the scaling benchmark to generate realistically-sized web
    pages (real Common-Crawl documents are KBs, not the ~250-byte test
    default) without changing the violation mix.
    """
    if clean:
        dup_rate = null_text_rate = empty_text_rate = 0.0
        bad_lang_rate = corrupt_html_rate = 0.0
    df = spark.range(0, n_rows, 1, num_partitions or spark.sparkContext.defaultParallelism)
    idc = F.col("id")
    s = seed * 1000  # namespace the hash streams per seed

    # duplicate injection: a duplicate row reuses the PREVIOUS id's url
    # (so the pair shares a url but differs in warc_ts; the later one —
    # larger warc_ts — is the violation, per reference validator.py:207-220)
    is_dup = (_u01(s + 1, idc) < dup_rate) & (idc > 0)
    base_id = F.when(is_dup, idc - 1).otherwise(idc)

    # Zipf-ish domain skew: u^3 concentrates mass near domain 0
    dom_idx = F.floor(F.pow(_u01(s + 2, base_id), F.lit(3.0)) * n_domains)
    domain = F.concat(F.lit("site"), dom_idx.cast("string"), F.lit(".example.com"))
    url = F.concat(
        F.lit("https://"), domain, F.lit("/p/"), base_id.cast("string")
    )

    # timestamps stride across days (drives day-partitioned layout);
    # duplicates get a strictly later ts than their base row
    warc_ts = F.timestamp_seconds(
        F.lit(_EPOCH_2024) + base_id * F.lit(97)
        + F.when(is_dup, F.lit(40_000)).otherwise(F.lit(0))
    )

    # text: deterministic token sequence from the vocab, length ~3..60
    # words with a heavy tail (~2% long docs)
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    n_words = (
        F.lit(3)
        + F.pmod(_h(s + 3, idc), F.lit(40))
        + F.when(_u01(s + 4, idc) < 0.02, F.lit(150)).otherwise(F.lit(0))
    )
    words = F.transform(
        F.sequence(F.lit(1), n_words.cast("int")),
        lambda i: F.element_at(vocab, (F.pmod(_h(s + 5, idc, i), F.lit(len(_VOCAB))) + 1).cast("int")),
    )
    text = F.concat_ws(" ", words)
    if words_scale > 1:
        # cheap length scaling: one string repeat, not a words_scale×
        # bigger HOF (the word-builder transform re-evaluates its
        # sequence child per element — quadratic — so growing n_words
        # directly would explode datagen cost)
        text = F.rtrim(F.repeat(F.concat(text, F.lit(" ")), words_scale))
    text = F.when(_u01(s + 6, idc) < null_text_rate, F.lit(None)).otherwise(
        F.when(_u01(s + 7, idc) < empty_text_rate, F.lit("")).otherwise(text)
    )

    # lang: valid ISO code, with seeded invalid codes
    lang_arr = F.array(*[F.lit(code) for code, _ in LANGS])
    lang = F.element_at(
        lang_arr, (F.pmod(_h(s + 8, idc), F.lit(len(LANGS))) + 1).cast("int")
    )
    lang = F.when(_u01(s + 9, idc) < bad_lang_rate, F.lit("zz")).otherwise(lang)

    # html rendered from text; seeded corrupt blobs break the template
    html = render_html_expr(text)
    html = F.when(
        _u01(s + 10, idc) < corrupt_html_rate,
        F.encode(F.lit("\x00corrupt\x00"), "UTF-8"),
    ).otherwise(html)

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def gen_lang_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(LANGS, ["lang", "lang_name"])


def gen_domain_dim(spark: SparkSession, n_domains: int = 500) -> DataFrame:
    """Domain dimension, deliberately missing every 13th generated
    domain (FIXTURES.md §2) so referential checks have violations."""
    rows = [
        (f"site{i}.example.com", "general" if i % 3 else "news")
        for i in range(n_domains)
        if i % 13 != 0
    ]
    return spark.createDataFrame(rows, ["domain", "category"])


def write_pages(
    spark: SparkSession,
    path: str,
    n_rows: int,
    seed: int = 42,
    partition_by_day: bool = True,
    **kwargs,
) -> None:
    """Materialize pages as parquet, day-partitioned like the Iceberg
    layout the engine targets (``days(warc_ts)`` — partition pruning +
    per-partition verdicts key off this)."""
    df = gen_pages(spark, n_rows, seed=seed, **kwargs)
    if partition_by_day:
        (
            df.withColumn("day", F.to_date("warc_ts"))
            .repartition("day")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(path)
        )
    else:
        df.write.mode("overwrite").parquet(path)
