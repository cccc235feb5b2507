"""Dedup-ladder benchmark on realistically-sized, realistically-DIVERSE
documents.

The per-round headline bench (bench.py) times the dedup queries over
the driver testdata (~250-byte docs drawn from a 38-word vocabulary).
That vocabulary is fine for validation benchmarks but DEGENERATE for
LSH: byte-5-gram Jaccard between two unrelated 38-word-vocab docs is
~0.5, so minhash banding collides nearly everything (measured: 204M
candidate pairs from 200k docs — 1% of ALL pairs). Real web corpora
are the opposite regime: unrelated pages share almost no shingles and
near-duplicate structure is sparse but CLUSTERED (boilerplate pages).

This tool benchmarks that regime:

  corpus   N docs whose words are md5(doc_id, k) hex strings —
           effectively an unbounded vocabulary, so unrelated docs
           have Jaccard ~0 (like real crawl text)
  planted  1) a boilerplate cluster: every (N/HOT)-th doc's text is
              one fixed ~2 KB page (HOT identical docs — the hot-LSH-
              bucket case the round-3 population caps exist for)
           2) near-dup families: doc i with i % 89 == 1 copies doc
              i-1's words plus one extra word (Jaccard ≈ 0.98 — what
              the jaccard verify stage is for)

ladder stages, each timed as a full materialization:
  minhash   minhash_lsh_candidates  capped vs UNCAPPED
  simhash   simhash_near_duplicates capped vs UNCAPPED
  jaccard   ngram_jaccard_pairs over the capped minhash candidates
  ann       all_pairs_above_blocked over deterministic synthetic
            embeddings (ANN_ROWS rows — all-pairs is O(n²) by
            definition, so it gets its own, smaller n)

With HOT > cap the capped runs drop the boilerplate bucket (surfacing
the dropped volume in the log) and emit only the near-dup families;
the uncapped "before" runs pay the full C(HOT,2) pair explosion —
the measured before/after for the round-3 cap work.

Prints one JSON line; per-stage rows print as they finish.

Env knobs:
  LADDER_ROWS        (default 2_000_000)
  LADDER_WORDS_SCALE (default 8 → ~60 words ≈ 2 KB docs)
  LADDER_HOT_DOCS    (default 20_000 planted identical docs; 0 = none)
  LADDER_CAP         (default 10_000 — the operators' default cap)
  LADDER_ANN_ROWS    (default 100_000)
  LADDER_UNCAPPED    (default 1; 0 skips the uncapped "before" runs)
  SPARK_GRAFT_CPUS   (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROWS = int(os.environ.get("LADDER_ROWS", "2000000"))
WORDS = int(os.environ.get("LADDER_WORDS_SCALE", "8"))
HOT = int(os.environ.get("LADDER_HOT_DOCS", "20000"))
CAP = int(os.environ.get("LADDER_CAP", "10000"))
ANN_ROWS = int(os.environ.get("LADDER_ANN_ROWS", "100000"))
RUN_UNCAPPED = os.environ.get("LADDER_UNCAPPED", "1") != "0"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# one fixed ~2 KB boilerplate page (think: a cookie-consent /
# navigation-chrome page that a crawler captured millions of times)
_BOILER = (
    "cookie consent privacy policy terms of service all rights reserved "
    "navigation home about contact sitemap subscribe newsletter follow "
    "us on social media copyright twenty twenty four "
) * 16


def ladder_docs(spark, n_rows: int, words_scale: int, hot: int):
    """Deterministic diverse corpus: ``7*words_scale + 4`` md5-hex
    words per doc (~33 B each → ~2 KB at words_scale=8). Pure
    codegen'd expressions — no Python anywhere in datagen."""
    from pyspark.sql import functions as F

    n_words = 7 * words_scale + 4
    idc = F.col("id")
    is_near = (F.pmod(idc, F.lit(89)) == 1) & (idc > 0)
    base = F.when(is_near, idc - 1).otherwise(idc)
    words = [
        F.md5(F.concat_ws("-", base.cast("string"), F.lit(str(k))))
        for k in range(n_words)
    ]
    text = F.concat_ws(" ", *words)
    # near-dup: neighbour's words + one extra → Jaccard ≈ 0.98
    text = F.when(
        is_near,
        F.concat(text, F.lit(" "), F.md5(F.concat(idc.cast("string"), F.lit("x")))),
    ).otherwise(text)
    if hot > 0:
        every = max(1, n_rows // hot)
        text = F.when(
            F.pmod(idc, F.lit(every)) == 0, F.lit(_BOILER)
        ).otherwise(text)
    return spark.range(0, n_rows, 1, CPUS * 2).select(
        idc.alias("doc_id"), text.alias("text")
    )


def _timed(label: str, fn, trials: int = 2):
    """Best-of-N: the first execution of each stage pays one-time
    session costs (codegen, python-worker spin-up, JIT) that a
    long-lived production job never re-pays — measured on the pilot
    run as a 6x swing between a cold first stage and a warm identical
    re-run. Each ``fn`` MUST release the operator's persisted
    intermediates before returning (inside the timed window), so trial
    2 re-runs the full pipeline from the parquet scan instead of
    reusing trial 1's cached buckets."""
    best, out = float("inf"), None
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:34s} {best:8.2f} s   {out:,}")
    return best, out


def main() -> None:
    from pyspark.sql import functions as F

    from py_schemax_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        release_all_intermediates,
        simhash_near_duplicates,
    )
    from py_schemax_spark.operators.similarity import all_pairs_above_blocked
    from py_schemax_spark.session import get_spark
    from py_schemax_spark.sources.datagen import gen_pages  # noqa: F401

    spark = get_spark(
        app_name="dedup-ladder", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        # split the stored corpus into enough scan tasks that the
        # Arrow stages see full parallelism (a 2 GB corpus under the
        # 128 MB default is only ~16 splits)
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )

    import tempfile

    path = tempfile.mkdtemp(prefix=f"ladder_{ROWS}_{WORDS}_")
    print(f"generating {ROWS:,} docs (words_scale={WORDS}, "
          f"hot cluster={HOT:,}) ...")
    ladder_docs(spark, ROWS, WORDS, HOT).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    avg_len = docs.agg(F.avg(F.length("text"))).first()[0]
    print(f"corpus: {n_docs:,} docs, avg {avg_len:,.0f} bytes/doc "
          f"({n_docs * avg_len / 1e9:.2f} GB text), "
          f"{docs.rdd.getNumPartitions()} scan partitions\n")

    results: dict[str, dict] = {}

    def record(name, sec, pairs):
        results[name] = {"sec": round(sec, 2), "pairs": pairs}

    def run_then_release(make_df):
        """Materialize + release inside the timed window — see _timed."""
        n = make_df().count()
        release_all_intermediates()
        return n

    # --- minhash LSH candidates: capped (production default) ---------
    sec, n = _timed(
        f"minhash candidates cap={CAP}",
        lambda: run_then_release(
            lambda: minhash_lsh_candidates(docs, max_bucket_size=CAP)),
    )
    record("minhash_capped", sec, n)

    # --- simhash near-dups: capped -----------------------------------
    sec, n = _timed(
        f"simhash near-dups cap={CAP}",
        lambda: run_then_release(
            lambda: simhash_near_duplicates(docs, max_bucket_size=CAP)),
    )
    record("simhash_capped", sec, n)

    # --- jaccard verify over capped minhash candidates ---------------
    def _jac():
        cand = minhash_lsh_candidates(docs, max_bucket_size=CAP)
        return ngram_jaccard_pairs(
            docs, cand.select("key_a", "key_b"), threshold=0.8
        )

    sec, n = _timed(
        "ngram-jaccard verify (capped cand)",
        lambda: run_then_release(_jac),
    )
    record("jaccard_verify", sec, n)

    # --- uncapped "before" runs --------------------------------------
    if RUN_UNCAPPED:
        sec, n = _timed(
            "minhash candidates UNCAPPED",
            lambda: run_then_release(
                lambda: minhash_lsh_candidates(docs, max_bucket_size=None)),
        )
        record("minhash_uncapped", sec, n)

        sec, n = _timed(
            "simhash near-dups UNCAPPED",
            lambda: run_then_release(
                lambda: simhash_near_duplicates(docs, max_bucket_size=None)),
        )
        record("simhash_uncapped", sec, n)

    # --- blocked all-pairs over synthetic embeddings -----------------
    # deterministic 64-dim vectors from the row id (pure expression —
    # no Python in datagen); all-pairs is O(n²) so it gets its own n.
    # Unrelated uniform vectors never reach cosine 0.8, so every
    # ~997th row copies its predecessor's vector — planted duplicate
    # pairs that must surface in the result (pair-emission check, and
    # the output path is part of what's timed).
    emb = (
        spark.range(ANN_ROWS)
        .select(
            F.col("id").alias("vec_id"),
            F.when(F.col("id") % 997 == 1, F.col("id") - 1)
            .otherwise(F.col("id"))
            .alias("_seed"),
        )
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("_seed"), i), F.lit(2000))
                    .cast("double") / 1000.0 - 1.0
                ),
            ).cast("array<float>").alias("embedding"),
        )
    )
    emb_path = tempfile.mkdtemp(prefix="ladder_emb_")
    emb.write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    sec, n = _timed(
        f"blocked all-pairs n={ANN_ROWS:,} thr=0.8",
        lambda: all_pairs_above_blocked(emb, 0.8).count(),
    )
    record("ann_blocked", sec, n)

    out = {
        "metric": "dedup ladder at realistic doc size + diversity",
        "rows": n_docs,
        "avg_doc_bytes": round(avg_len, 1),
        "words_scale": WORDS,
        "hot_docs": HOT,
        "cap": CAP,
        "ann_rows": ANN_ROWS,
        "cpus": CPUS,
        "stages": results,
    }
    print("\n" + json.dumps(out))
    # drop the result where bench.py's BENCH.md renderer picks it up,
    # so full bench runs (which rewrite BENCH.md) keep the ladder table
    Path(__file__).resolve().parent.parent.joinpath(
        "LADDER_LATEST.json"
    ).write_text(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
