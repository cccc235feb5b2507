"""Bloom-build ladder at the 10^7-n-gram scale (VERDICT r04 #2 done
criterion): times `build_ngram_bloom`'s segmented distributed
OR-reduce and records the driver-traffic shape (segment rows collected
= exactly one bitmap), appending a JSON line to BLOOM_LADDER.json.

The benchmark "benchmark set" is synthetic: N_DOCS docs of W unique
md5-hex words each (unbounded vocabulary — every token 8-gram is
distinct), so distinct n-grams ≈ N_DOCS × (W - 7). Defaults give
~1.0e7 n-grams ≈ 12.5 MB bitmap at 10 bits/item; the design point
(1e9 n-grams, 1.25 GB) is the same plan with more segments — the
shuffle carries 8-byte positions (k·n rows), never bitmaps, and the
driver receives ⌈m/seg_bits⌉ segment rows regardless of parallelism.

Usage: python tools/bench_bloom.py [n_docs] [words_per_doc]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from py_schemax_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    words = int(sys.argv[2]) if len(sys.argv) > 2 else 5_007
    spark = get_spark(app_name="bench-bloom")
    from pyspark.sql import functions as F

    from py_schemax_spark.operators.decontam import build_ngram_bloom

    # W md5-hex words per doc, all distinct across the corpus:
    # word i of doc d = md5(d * W + i) — unbounded vocabulary
    docs = (
        spark.range(n_docs)
        .select(
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(words - 1)),
                    lambda i: F.md5(
                        (F.col("id") * words + i).cast("string")
                    ),
                ),
                " ",
            ).alias("text")
        )
        .repartition(32)
    )
    docs.write.mode("overwrite").parquet("/tmp/bloom_bench_docs")
    stored = spark.read.parquet("/tmp/bloom_bench_docs")

    from py_schemax_spark.operators.decontam import _BLOOM_SEG_BITS

    seg_bytes = _BLOOM_SEG_BITS // 8
    t0 = time.perf_counter()
    bitmap, m = build_ngram_bloom(stored, n=8)
    sec = round(time.perf_counter() - t0, 2)
    n_items = n_docs * (words - 7)
    rec = {
        "n_docs": n_docs,
        "words_per_doc": words,
        "approx_ngrams": n_items,
        "m_bits": m,
        "bitmap_mb": round(len(bitmap) / 1e6, 1),
        "segments_collected": (len(bitmap) + seg_bytes - 1) // seg_bytes,
        "build_sec": sec,
        "ngrams_per_sec": round(n_items / sec),
    }
    out = Path(__file__).parent.parent / "BLOOM_LADDER.json"
    hist = json.loads(out.read_text()) if out.exists() else []
    hist.append(rec)
    out.write_text(json.dumps(hist, indent=1))
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
