"""Training-pipeline operator tests: dedup family, similarity search,
text analysis, multimodal plumbing, streaming validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.operators.dedup import (
    exact_dedup_keep_first,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_bits,
    simhash_hex,
    simhash_near_duplicates,
)
from py_schemax_spark.operators.multimodal import fake_decode, image_metadata
from py_schemax_spark.operators.similarity import (
    all_pairs_above_np,
    brute_force_topk,
    lsh_topk,
    similarity_pairs_above,
)
from py_schemax_spark.operators.textstats import text_profile


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
        (3, "THE  Quick brown fox jumps over the lazy dog near the river bank"),  # dup after normalize
        (4, "the quick brown fox jumps over the lazy dog near the creek bank"),  # near dup (1 word)
        (5, "completely different content about spark dataframes and shuffles"),
        (6, "another unrelated document mentioning benchmarks and latency data"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_exact_duplicates_and_keep_first(corpus):
    groups = exact_duplicates(corpus, key_col="doc_id").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["keeper"] == 1 and g["n_copies"] == 3
    survivors = {
        r["doc_id"] for r in exact_dedup_keep_first(corpus, key_col="doc_id").collect()
    }
    assert survivors == {1, 4, 5, 6}


def test_minhash_lsh_finds_exact_and_near_dups(corpus):
    cand = minhash_lsh_candidates(
        corpus, key_col="doc_id", num_hashes=64, bands=16
    )
    pairs = {(r["key_a"], r["key_b"]) for r in cand.collect()}
    # exact dups always agree on every band
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    # near dup should collide on at least one band with 16 bands × 4 rows
    assert (1, 4) in pairs or (2, 4) in pairs
    # unrelated docs must not flood in
    assert (5, 6) not in pairs


def test_ngram_jaccard_verification(corpus):
    cand = minhash_lsh_candidates(
        corpus, key_col="doc_id", num_hashes=64, bands=16
    ).select("key_a", "key_b")
    verified = ngram_jaccard_pairs(
        corpus, cand, key_col="doc_id", threshold=0.8
    )
    rows = {(r["key_a"], r["key_b"]): r["jaccard"] for r in verified.collect()}
    assert rows[(1, 2)] == 1.0  # identical
    assert rows[(1, 3)] == 1.0  # identical after normalization
    if (1, 4) in rows:  # near-dup passes 0.8 with one word changed
        assert 0.8 <= rows[(1, 4)] < 1.0


def test_ngram_jaccard_prune_matches_unpruned(corpus):
    """The candidate-prune semi-join (the 100-TB path: shingle only
    docs that appear in candidates, not the whole corpus) must be
    result-invariant — it only removes docs the join would drop
    anyway."""
    cand = minhash_lsh_candidates(
        corpus, key_col="doc_id", num_hashes=64, bands=16
    ).select("key_a", "key_b")
    kw = dict(key_col="doc_id", threshold=0.0)
    pruned = ngram_jaccard_pairs(corpus, cand, **kw)
    full = ngram_jaccard_pairs(
        corpus, cand, prune_to_candidates=False, **kw
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(pruned) == as_set(full) and pruned.count() > 0


def test_simhash_properties(spark, corpus):
    fps = {
        r["doc_id"]: (r["hex"], r["bits"])
        for r in corpus.select(
            "doc_id",
            simhash_hex(simhash_bits(F.col("text"))).alias("hex"),
            simhash_bits(F.col("text")).alias("bits"),
        ).collect()
    }
    assert fps[1][0] == fps[2][0] == fps[3][0]  # identical content
    assert len(fps[1][0]) == 16
    # near-dup within small hamming; unrelated far apart
    def ham(a, b):
        return sum(x != y for x, y in zip(fps[a][1], fps[b][1]))

    assert ham(1, 4) <= 12
    assert ham(1, 5) > 12

    near = simhash_near_duplicates(corpus, key_col="doc_id", max_hamming=12)
    pairs = {(r["key_a"], r["key_b"]) for r in near.collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (5, 6) not in pairs


def test_simhash_packed_long_matches_bit_array(spark, corpus):
    """The packed-long fingerprint (the join/shuffle shape) must be a
    bit-exact repack of the array fingerprint: identical hex, and
    codegen'd bit_count(xor) hamming == the element-wise array
    hamming, for every doc including empty/whitespace-only text."""
    from py_schemax_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_hex_packed,
    )

    extra = spark.createDataFrame(
        [(100, " "), (101, "solitary")], ["doc_id", "text"]
    )
    docs = corpus.select("doc_id", "text").unionByName(extra)
    arr = {
        r["k"]: (r["hex"], tuple(r["fp"]))
        for r in simhash_fingerprints(docs)
        .select("k", "fp", simhash_hex(F.col("fp")).alias("hex"))
        .collect()
    }
    packed = {
        r["k"]: (r["hex"], r["fpl"])
        for r in simhash_fingerprints(docs, packed=True)
        .select("k", "fpl", simhash_hex_packed(F.col("fpl")).alias("hex"))
        .collect()
    }
    assert set(arr) == set(packed)
    for k, (hex_a, bits) in arr.items():
        hex_p, fpl = packed[k]
        assert hex_a == hex_p, k
        expect = sum(b << i for i, b in enumerate(bits))
        assert fpl & 0xFFFFFFFFFFFFFFFF == expect, k


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.normal(0, 1, (40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # 40..43: near-copies of 0..3 (tiny noise → cosine ≈ 1)
    for j in range(4):
        noisy = base[j] + rng.normal(0, 0.01, 16)
        rows.append((40 + j, [float(x) for x in noisy]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()


def test_brute_force_topk_finds_planted_neighbors(vectors):
    queries = vectors.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(vectors, queries, k=1)
    got = {r["query_id"]: r["vec_id"] for r in top.collect()}
    assert got == {0: 40, 1: 41, 2: 42, 3: 43}


def test_lsh_topk_recall_on_planted_neighbors(vectors):
    queries = vectors.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = lsh_topk(vectors, queries, dim=16, k=1, n_planes=6)
    got = {r["query_id"]: r["vec_id"] for r in top.collect()}
    # near-identical vectors share every hyperplane sign → same bucket;
    # LSH must recover all planted neighbors
    assert got == {0: 40, 1: 41, 2: 42, 3: 43}


def test_ivf_topk_recall_on_planted_neighbors(vectors):
    from py_schemax_spark.operators.similarity import ivf_topk

    queries = vectors.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # nprobe = n_lists → exhaustive probing: IVF must equal brute force
    top = ivf_topk(vectors, queries, dim=16, k=1, n_lists=4, nprobe=4)
    got = {r["query_id"]: r["vec_id"] for r in top.collect()}
    assert got == {0: 40, 1: 41, 2: 42, 3: 43}
    # near-copies land in the same list, so even nprobe=1 recovers them
    top1 = ivf_topk(vectors, queries, dim=16, k=1, n_lists=4, nprobe=1)
    got1 = {r["query_id"]: r["vec_id"] for r in top1.collect()}
    assert got1 == {0: 40, 1: 41, 2: 42, 3: 43}


def _expr_cosine(a, b):
    """Interpreted JVM-expression cosine — the semantic twin of the
    production Arrow path, kept ONLY here (round 3 removed it from the
    package: zip_with/aggregate HOFs run in Catalyst's interpreter and
    the cartesian form is O(n²))."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)

    def norm(v):
        return F.sqrt(F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, w: acc + w))

    return dot / (norm(a) * norm(b))


def _expr_pairs_above(df, threshold, id_col="vec_id", vec_col="embedding"):
    a = df.select(F.col(id_col).alias("key_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("key_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b",
                F.round(_expr_cosine(F.col("va"), F.col("vb")), 4)
                .alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def test_all_pairs_np_matches_expression_path(vectors):
    np_pairs = {
        (r["key_a"], r["key_b"]): r["sim"]
        for r in all_pairs_above_np(vectors, threshold=0.9).collect()
    }
    expr_pairs = {
        (r["key_a"], r["key_b"]): r["sim"]
        for r in _expr_pairs_above(vectors, threshold=0.9).collect()
    }
    assert set(np_pairs) == set(expr_pairs)
    assert set(np_pairs) == {(0, 40), (1, 41), (2, 42), (3, 43)}
    for k, v in expr_pairs.items():
        assert abs(np_pairs[k] - v) < 1e-3  # expr path rounds to 4
    # the public similarity_pairs_above API is now a shim over the
    # numpy strategy paths — same pairs, rounded sims
    shim_pairs = {
        (r["key_a"], r["key_b"]): r["sim"]
        for r in similarity_pairs_above(vectors, threshold=0.9).collect()
    }
    assert shim_pairs == expr_pairs


def test_text_profile_shape_and_sanity(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox, it jumps!"),
            (2, "zzz qqq xxx"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    prof = {r["doc_id"]: r.asDict() for r in text_profile(df).collect()}
    assert prof[1]["n_tokens"] == 6
    assert prof[1]["punct_ratio"] > 0
    assert prof[1]["stopword_ratio"] > 0
    assert prof[1]["lang_pred"] == "en"
    assert prof[2]["lang_pred"] == "und"
    assert prof[2]["quality"] < prof[1]["quality"] or prof[1]["quality"] > 0.3
    assert prof[3]["n_tokens"] == 0
    assert len(prof[1]["fp"]) == 32


def test_image_metadata_plumbing(spark):
    payloads = [("k1", b"\x01\x02\x03\x04payload-bytes"), ("k2", None),
                ("k3", b"other-bytes-here")]
    df = spark.createDataFrame(payloads, ["url", "html"])
    meta = {r["key"]: r.asDict() for r in image_metadata(df).collect()}
    assert set(meta) == {"k1", "k3"}  # null payload skipped
    w, h, c, px = fake_decode(payloads[0][1])
    assert meta["k1"]["width"] == w and meta["k1"]["height"] == h
    assert meta["k1"]["n_bytes"] == len(payloads[0][1])
    assert abs(meta["k1"]["mean_intensity"] - float(px.mean())) < 1e-9


def test_resize_images_plumbing(spark):
    import numpy as np

    from py_schemax_spark.operators.multimodal import (
        fake_decode,
        resize_images,
    )

    payloads = [("k1", b"\x10\x20\x30\x40image-ish-bytes"), ("k2", None)]
    df = spark.createDataFrame(payloads, ["url", "html"])
    out = {r["key"]: r.asDict() for r in resize_images(df, (4, 4)).collect()}
    assert set(out) == {"k1"}
    r = out["k1"]
    assert (r["width"], r["height"]) == (4, 4)
    w, h, c, px = fake_decode(payloads[0][1])
    img = px[: w * h * c].reshape(h, w, c)
    yi = (np.arange(4) * h) // 4
    xi = (np.arange(4) * w) // 4
    assert bytes(r["pixels"]) == img[yi][:, xi].tobytes()


def test_streaming_stateful_first_seen(spark, tmp_path):
    """applyInPandasWithState dedup: only the first occurrence of each
    url is emitted; duplicates inside the stream are suppressed."""
    import datetime as dt

    from py_schemax_spark.streaming.validate_stream import stateful_first_seen

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("u1", t0),
        ("u2", t0 + dt.timedelta(minutes=1)),
        ("u1", t0 + dt.timedelta(minutes=5)),   # dup, later
        ("u3", t0 + dt.timedelta(minutes=2)),
        ("u2", t0 + dt.timedelta(minutes=30)),  # dup, later
    ]
    src = str(tmp_path / "dedup_src")
    batch = spark.createDataFrame(rows, ["url", "warc_ts"])
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        stateful_first_seen(stream)
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["key"]: r["first_ts"]
        for r in spark.sql("SELECT * FROM first_seen").collect()
    }
    assert set(got) == {"u1", "u2", "u3"}
    assert got["u1"] == t0
    assert got["u2"] == t0 + dt.timedelta(minutes=1)


def test_streaming_windowed_violations(spark, pages_spec, tmp_path):
    """Structured Streaming: same constraints, availableNow trigger,
    memory sink; counts must match the batch run."""
    from py_schemax_spark.sources.datagen import gen_pages
    from py_schemax_spark.streaming.validate_stream import (
        windowed_violation_counts,
    )

    src = str(tmp_path / "stream_src")
    batch_df = gen_pages(spark, 1000)
    batch_df.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    counts = windowed_violation_counts(
        stream, pages_spec, window_duration="6 hours", watermark="1 hour"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("viol_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT constraint_id, sum(violation_count) AS n FROM viol_counts "
        "GROUP BY constraint_id"
    ).collect()
    stream_totals = {r["constraint_id"]: r["n"] for r in got}

    from py_schemax_spark.operators.violations import row_violations

    batch_totals = {
        r["constraint_id"]: r["count"]
        for r in row_violations(spark.read.parquet(src), pages_spec)
        .groupBy("constraint_id")
        .count()
        .collect()
    }
    assert stream_totals == batch_totals


def test_dedup_operators_null_text_safe(spark):
    """gen_pages injects null text by default — every dedup flavor must
    propagate/skip nulls instead of crashing in an Arrow batch
    (ADVICE r1)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, None),
        (4, None),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    cand = minhash_lsh_candidates(corpus, key_col="doc_id", num_hashes=16,
                                  bands=4)
    pairs = {(r["key_a"], r["key_b"]) for r in cand.collect()}
    assert pairs == {(1, 2)}
    verified = ngram_jaccard_pairs(
        corpus, cand.select("key_a", "key_b"), key_col="doc_id",
        threshold=0.5,
    )
    assert [(r["key_a"], r["key_b"]) for r in verified.collect()] == [(1, 2)]
    fps = corpus.select(
        "doc_id", simhash_bits(F.col("text")).alias("bits")
    ).collect()
    by_id = {r["doc_id"]: r["bits"] for r in fps}
    assert by_id[3] is None and by_id[4] is None
    assert by_id[1] == by_id[2] and len(by_id[1]) == 64
    near = simhash_near_duplicates(corpus, key_col="doc_id", max_hamming=3)
    assert {(r["key_a"], r["key_b"]) for r in near.collect()} == {(1, 2)}


def test_unpersist_intermediates_releases_cache(spark, corpus):
    from py_schemax_spark.operators.dedup import unpersist_intermediates

    cand = minhash_lsh_candidates(corpus, key_col="doc_id", num_hashes=16,
                                  bands=4)
    cand.count()
    cached = cand._schemax_persisted
    assert cached and all(c.storageLevel.useMemory for c in cached)
    unpersist_intermediates(cand)
    assert all(not c.storageLevel.useMemory for c in cached)
    # untracked DataFrames are a no-op
    unpersist_intermediates(corpus)


def test_all_pairs_blocked_matches_broadcast(spark, vectors):
    """The scale path (block-pair decomposition, no driver collect)
    must produce byte-identical pairs to the broadcast path."""
    from py_schemax_spark.operators.similarity import (
        _all_pairs_above_broadcast,
        all_pairs_above_blocked,
        all_pairs_above_np,
    )

    def norm(df):
        return sorted(
            (r["key_a"], r["key_b"], round(r["sim"], 9))
            for r in df.collect()
        )

    bc = norm(_all_pairs_above_broadcast(vectors, 0.5))
    bl = norm(all_pairs_above_blocked(vectors, 0.5, n_blocks=3))
    assert bc == bl and len(bc) > 0
    # the gate routes big corpora to the blocked path
    gated = norm(all_pairs_above_np(vectors, 0.5, max_broadcast_rows=1))
    assert gated == bc


def test_lsh_multi_table_recall_dominates_single(spark, vectors):
    """T independent plane tables can only ADD candidates: recall vs
    brute force is monotone in n_tables, and every T=1 result pair
    survives in T=3 (superset-of-candidates refinement)."""
    from py_schemax_spark.operators.similarity import brute_force_topk, lsh_topk

    q = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(vectors, q, k=5).collect()
    }

    def pairs(n_tables):
        return {
            (r["query_id"], r["vec_id"])
            for r in lsh_topk(vectors, q, dim=16, k=5, n_planes=6,
                              n_tables=n_tables).collect()
        }

    p1, p3 = pairs(1), pairs(3)
    recall1 = len(p1 & exact) / len(exact)
    recall3 = len(p3 & exact) / len(exact)
    assert recall3 >= recall1
    assert len(p3) >= len(p1)


def test_all_pairs_blocked_exactly_once_across_configs(spark):
    """Property sweep: across corpus sizes / dims / block counts /
    thresholds (including below -1 = every pair), the blocked
    decomposition
    emits each unordered pair EXACTLY once and matches the broadcast
    path bit-for-bit."""
    import numpy as np

    from py_schemax_spark.operators.similarity import (
        _all_pairs_above_broadcast,
        all_pairs_above_blocked,
    )

    for seed, n, dim, blocks, thr in [
        (1, 80, 4, 2, 0.3),
        (2, 120, 12, 5, 0.6),
        (3, 40, 8, 7, -1.1),  # every pair must appear exactly once
        (4, 30, 6, 1, 0.2),   # single block = one self-pair group
    ]:
        rng = np.random.default_rng(seed)
        rows = [(i, [float(x) for x in rng.normal(0, 1, dim)])
                for i in range(n)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        bc = sorted(
            (r["key_a"], r["key_b"], round(r["sim"], 9))
            for r in _all_pairs_above_broadcast(df, thr).collect()
        )
        bl = sorted(
            (r["key_a"], r["key_b"], round(r["sim"], 9))
            for r in all_pairs_above_blocked(df, thr,
                                             n_blocks=blocks).collect()
        )
        assert bc == bl, (seed, n, dim, blocks, thr)
        if thr < -1.0:
            assert len(bl) == n * (n - 1) // 2


def test_similarity_paths_null_embedding_safe(spark):
    """Null embeddings are dropped (not crashed on) by every
    similarity strategy — a pages-style corpus always has null rows."""
    import numpy as np

    from py_schemax_spark.operators.similarity import (
        _all_pairs_above_broadcast,
        all_pairs_above_blocked,
        brute_force_topk,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 4)]) for i in range(20)]
    rows += [(98, None), (99, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bc = _all_pairs_above_broadcast(df, -1.1).count()
    bl = all_pairs_above_blocked(df, -1.1, n_blocks=3).count()
    assert bc == bl == 20 * 19 // 2
    q = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert brute_force_topk(df, q, k=3).count() == 6
    # null QUERY vectors are dropped (round-3 ADVICE: the query side was
    # unhardened — a null qvec crashed the driver-side np.array build)
    q_with_null = df.filter(
        (F.col("vec_id") < 2) | (F.col("vec_id") == 99)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    assert brute_force_topk(df, q_with_null, k=3).count() == 6
    # an all-null / empty query set short-circuits to an empty frame
    # with the contract schema
    empty = brute_force_topk(
        df, df.filter(F.col("vec_id") == 99).select(
            F.col("vec_id").alias("query_id"), "embedding"), k=3)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "query_id", "vec_id", "sim", "rank"]


def test_ngram_jaccard_byte_oracle_multibyte_parity(spark):
    """The DuckDB oracle shingles hex(encode(text)) 10-grams ≡ the
    engine's byte 5-grams — must agree on multibyte ('café'), short
    (<5 char), and empty texts, not just the ASCII corpus (round-3
    ADVICE fix)."""
    import duckdb

    texts = [
        (0, "the naïve café piñata résumé text goes on and on"),
        (1, "the naïve café piñata résumé text goes on and off"),
        (2, "ab"),                    # short → zero-padded single window
        (3, "ab"),                    # identical short pair → jaccard 1
        (4, ""),                      # empty → single all-zero window
        (5, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    cand_rows = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    cand = spark.createDataFrame(cand_rows, "key_a long, key_b long")
    got = {
        (r["key_a"], r["key_b"]): (r["n_inter"], r["n_union"])
        for r in ngram_jaccard_pairs(
            df, cand, text_col="text", key_col="doc_id", threshold=0.0
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", texts)
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    want_rows = con.execute(f"""
        WITH d AS (
          SELECT doc_id,
                 rpad(hex(encode({norm})),
                      CAST(greatest(strlen({norm}) * 2, 10) AS INTEGER), '0') AS h,
                 greatest(strlen({norm}) - 4, 1) AS nw
          FROM docs
        ),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, nw + 1),
                     i -> substr(h, 2*i - 1, 10))) AS s
          FROM d
        )
        SELECT a.doc_id, b.doc_id,
               len(list_intersect(a.s, b.s)),
               len(list_distinct(list_concat(a.s, b.s)))
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    """).fetchall()
    want = {(a, b): (ni, nu) for a, b, ni, nu in want_rows}
    assert got == want
    # sanity on the planted structure: identical pairs are exact matches
    assert got[(2, 3)][0] == got[(2, 3)][1]
    assert got[(4, 5)][0] == got[(4, 5)][1]


def test_lsh_bucket_cap_bounds_boilerplate_pairs(spark):
    """Round-3 scale guard: a planted boilerplate bucket (many docs
    with IDENTICAL text → same bucket in every band) must not emit its
    O(b²) pair set when capped; small buckets are untouched, so a twin
    pair with its own distinct text still surfaces. AQE splits the
    shuffle of a hot bucket but cannot reduce pair OUTPUT — only the
    cap can."""
    boiler = "click here to accept cookies and continue to the site " * 4
    twin = "an entirely different document about volcanic geology " * 4
    rows = [(i, boiler) for i in range(300)]
    rows += [(1000, twin), (1001, twin)]
    rows += [(2000 + i, f"unique filler document number {i} " * 8)
             for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_lsh_candidates(
        df, key_col="doc_id", num_hashes=64, bands=16, max_bucket_size=50
    )
    pairs = {(r["key_a"], r["key_b"]) for r in capped.collect()}
    # the planted 300-doc bucket (44,850 pairs) is fully excluded
    assert not any(a < 300 and b < 300 for a, b in pairs)
    # a small (2-doc) bucket is untouched by the cap
    assert (1000, 1001) in pairs
    assert len(pairs) < 300  # bounded output, not O(b²)

    uncapped = minhash_lsh_candidates(
        df, key_col="doc_id", num_hashes=64, bands=16, max_bucket_size=None
    )
    n_unc = uncapped.count()
    assert n_unc >= 300 * 299 // 2  # the quadratic set the cap prevents


def test_simhash_bucket_cap_bounds_boilerplate_pairs(spark):
    """Same guard on the SimHash chunk-bucket join: identical texts
    share all four 16-bit chunk buckets; capping excludes them while a
    distinct twin pair (its own tiny buckets) survives."""
    boiler = "subscribe to our newsletter for daily updates now " * 4
    twin = "completely unrelated prose regarding deep sea fauna " * 4
    rows = [(i, boiler) for i in range(200)]
    rows += [(1000, twin), (1001, twin)]
    rows += [(2000 + i, f"distinct padding text number {i} " * 8)
             for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = simhash_near_duplicates(
        df, key_col="doc_id", max_hamming=3, max_bucket_size=50
    )
    pairs = {(r["key_a"], r["key_b"]) for r in capped.collect()}
    assert not any(a < 200 and b < 200 for a, b in pairs)
    assert (1000, 1001) in pairs

    uncapped = simhash_near_duplicates(
        df, key_col="doc_id", max_hamming=3, max_bucket_size=None
    )
    assert uncapped.filter(
        (F.col("key_a") < 200) & (F.col("key_b") < 200)
    ).count() == 200 * 199 // 2


def test_jvm_expression_minhash_semantic_twin(spark, corpus):
    """The interpreted JVM minhash (removed from the package in round 3
    — quadratic HOF-over-computed-array shape) lives on here as the
    semantic twin: same invariants as the Arrow path (identical
    normalized texts → identical signatures; unrelated texts differ),
    different hash family (so values are not comparable, semantics
    are)."""
    from py_schemax_spark.operators.dedup import minhash_signatures

    def shingles(c, n=5):
        t = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
        idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
        return F.array_distinct(
            F.transform(idx, lambda i: t.substr(i, F.lit(n))))

    def jvm_minhash(shingle_col, num_hashes=8):
        long_max = (1 << 63) - 1
        init = F.array_repeat(F.lit(long_max).cast("long"), num_hashes)

        def hashes_of(s):
            return F.array(*[F.xxhash64(s, F.lit(i))
                             for i in range(num_hashes)])

        return F.aggregate(
            shingle_col, init,
            lambda acc, s: F.zip_with(acc, hashes_of(s),
                                      lambda a, b: F.least(a, b)))

    jvm = {
        r["doc_id"]: tuple(r["sig"])
        for r in corpus.select(
            "doc_id", jvm_minhash(shingles(F.col("text"))).alias("sig")
        ).collect()
    }
    arrow = {
        r["k"]: tuple(r["sig"])
        for r in minhash_signatures(corpus, key_col="doc_id",
                                    num_hashes=8).collect()
    }
    for sigs in (jvm, arrow):
        assert sigs[1] == sigs[2] == sigs[3]   # normalize-identical
        assert sigs[1] != sigs[5] != sigs[6]   # unrelated differ


def test_rolling_fingerprints_shift_invariance_and_short_docs(spark):
    """Rolling 8-token fingerprints: a shared token run produces the
    same window hashes regardless of position (shift invariance — the
    winnowing property), and a doc shorter than the window emits
    exactly ONE fingerprint (the old Column form hit Spark's descending
    sequence(1,0) and emitted two bogus windows)."""
    from py_schemax_spark.operators.textstats import rolling_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, f"prefix one two {shared}"),
            (2, f"{shared} suffix tokens here"),
            (3, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    fps = {
        r["doc_id"]: r["rfp"]
        for r in rolling_fingerprints(df, window=8).collect()
    }
    # 10 shared tokens → 3 shared 8-token windows, position-independent
    assert len(set(fps[1]) & set(fps[2])) == 3
    assert len(fps[3]) == 1


def test_real_image_decoder_ppm_pgm_bmp(spark):
    """Round-3: decode_image_real is a REAL pure-numpy decoder for
    binary netpbm and uncompressed BMP — round-trips pixels exactly
    (incl. BMP bottom-up row order, BGR→RGB, and 4-byte row padding);
    auto_decode falls back to the deterministic fake for other bytes."""
    import numpy as np

    from py_schemax_spark.operators.multimodal import (
        auto_decode,
        decode_image_real,
        fake_decode,
        image_metadata,
    )

    pix = bytes(range(45))  # 5x3 RGB
    ppm = b"P6\n# comment\n5 3\n255\n" + pix
    assert decode_image_real(ppm)[:3] == (5, 3, 3)
    assert decode_image_real(ppm)[3].tobytes() == pix

    pgm = b"P5\n4 2\n255\n" + bytes(range(8))
    w, h, c, px = decode_image_real(pgm)
    assert (w, h, c) == (4, 2, 1) and px.tobytes() == bytes(range(8))

    def bmp24(w, h, rows_rgb):
        stride = ((w * 3 + 3) // 4) * 4
        data = b""
        for row in reversed(rows_rgb):  # stored bottom-up
            rb = b"".join(bytes([b, g, r]) for (r, g, b) in row)
            data += rb + b"\0" * (stride - len(rb))
        off = 54
        return (b"BM" + (off + len(data)).to_bytes(4, "little")
                + b"\0\0\0\0" + off.to_bytes(4, "little")
                + (40).to_bytes(4, "little")
                + w.to_bytes(4, "little", signed=True)
                + h.to_bytes(4, "little", signed=True)
                + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
                + (0).to_bytes(4, "little")
                + len(data).to_bytes(4, "little") + b"\0" * 16) + data

    rows = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    w, h, c, px = decode_image_real(bmp24(2, 2, rows))
    assert (w, h, c) == (2, 2, 3)
    assert px.tolist() == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]

    # fallback: non-image bytes → fake decoder, same tuple either way
    blob = b"\x01\x02not-an-image"
    assert auto_decode(blob)[:3] == fake_decode(blob)[:3]

    # end-to-end through mapInPandas with the real decoder
    df = spark.createDataFrame(
        [("a", ppm), ("b", pgm), ("c", None)], ["url", "html"]
    )
    from py_schemax_spark.operators.multimodal import decode_image_real as d
    meta = {r["key"]: r.asDict()
            for r in image_metadata(df, decoder=d).collect()}
    assert meta["a"]["width"] == 5 and meta["a"]["height"] == 3
    assert meta["a"]["mean_intensity"] == float(np.mean(range(45)))
    assert meta["b"]["channels"] == 1
    assert "c" not in meta  # null payload skipped


def test_long_session_no_persisted_rdd_growth(spark, corpus):
    """Round-3 unpersist audit: a long-lived session running many
    dedup/similarity pipelines without keeping result handles must not
    accumulate persisted RDDs — release_all_intermediates() is the
    bulk safety net (callers that do keep handles use
    unpersist_intermediates, idempotent with the registry)."""
    from py_schemax_spark.operators.dedup import (
        ngram_jaccard_pairs,
        release_all_intermediates,
    )

    def n_persisted():
        # subtract test-fixture caches (corpus etc.) present before
        return len(spark.sparkContext._jsc.getPersistentRDDs())

    corpus.count()  # materialize the fixture's own cache first
    release_all_intermediates()
    base = n_persisted()
    for _ in range(3):
        cand = minhash_lsh_candidates(
            corpus, key_col="doc_id", num_hashes=16, bands=4,
            log_dropped=False,
        )
        cand.count()
        simhash_near_duplicates(
            corpus, key_col="doc_id", max_hamming=12, log_dropped=False
        ).count()
        ngram_jaccard_pairs(
            corpus, cand.select("key_a", "key_b"), key_col="doc_id",
            threshold=0.0,
        ).count()
        # results dropped without unpersist_intermediates — the leak
        # the registry exists to stop
        dropped = release_all_intermediates()
        assert dropped >= 3
        assert n_persisted() == base


def test_connected_components_transitive_chain(spark):
    """Hash-min label propagation must collapse a~b~c~d chains (no
    direct a~d pair) and leave disjoint clusters apart; dedup_clusters
    assigns untouched docs to their own singleton cluster and marks
    min-key survivors."""
    from py_schemax_spark.operators.dedup import (
        connected_components,
        dedup_clusters,
    )

    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("c", "d"), ("x", "y")],
        ["key_a", "key_b"],
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a",
                    "x": "x", "y": "x"}

    docs = spark.createDataFrame(
        [(k,) for k in ["a", "b", "c", "d", "x", "y", "solo"]],
        ["doc_id"],
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert rows == {
        "a": ("a", True), "b": ("a", False), "c": ("a", False),
        "d": ("a", False), "x": ("x", True), "y": ("x", False),
        "solo": ("solo", True),
    }


def test_connected_components_long_chain_converges(spark):
    """A 9-node path graph needs multiple propagation rounds — the
    early-exit loop must iterate to the true fixpoint, not stop after
    one round."""
    from py_schemax_spark.operators.dedup import connected_components

    n = 9
    pairs = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(n - 1)], ["key_a", "key_b"]
    )
    # force the distributed rounds (the driver fast path would hide a
    # broken early-exit loop)
    comp = {r["node"]: r["component"]
            for r in connected_components(pairs, driver_max_edges=0).collect()}
    assert set(comp.values()) == {"n0"}
    assert len(comp) == n


def test_connected_components_driver_path_matches_distributed(spark):
    """The size-gated driver union-find must produce byte-identical
    (node, component) labels to the distributed rounds — random
    graph with chains, cliques, singleton-free disjoint parts."""
    import random

    from py_schemax_spark.operators.dedup import connected_components

    rng = random.Random(318)
    edges = set()
    # chains + random extra edges over 3 disjoint id ranges
    for base in (0, 100, 200):
        ids = [base + i for i in range(30)]
        for a, b in zip(ids, ids[1:]):
            if rng.random() < 0.8:
                edges.add((f"k{a}", f"k{b}"))
        for _ in range(15):
            edges.add(
                (f"k{rng.choice(ids)}", f"k{rng.choice(ids)}")
            )
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], ["key_a", "key_b"]
    )
    fast = {r["node"]: r["component"]
            for r in connected_components(pairs).collect()}
    dist = {r["node"]: r["component"]
            for r in connected_components(pairs, driver_max_edges=0).collect()}
    assert fast == dist


def test_pii_scan_planted_exact(spark):
    """Counts per PII class and the redacted text must be exact on
    planted values; clean text passes through untouched."""
    from py_schemax_spark.operators.pii import pii_scan, redact_pii
    from pyspark.sql import functions as F

    rows = [
        (1, "mail me at a.b+c@x-corp.io or admin@example.org thanks"),
        (2, "server 192.168.1.200 and 10.0.0.5 are up"),
        (3, "call +44 207 9460 018 today"),
        (4, "no pii here at all"),
        (5, "mixed bob@x.co from 8.8.8.8 call +1 555 0100 0199"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in pii_scan(df).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (2, 0, 0)
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 2, 0)
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 1)
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (0, 0, 0)
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_phone"]) == (1, 1, 1)

    red = {
        r["doc_id"]: r["red"]
        for r in df.select(
            "doc_id", redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    assert red[1] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert red[2] == "server <IP> and <IP> are up"
    assert red[3] == "call <PHONE> today"
    assert red[4] == "no pii here at all"
    assert red[5] == "mixed <EMAIL> from <IP> call <PHONE>"


def test_repetition_profile_exact(spark):
    """Integer-exact repetition counters with deterministic top-token
    tie-break (min token among max frequency)."""
    from py_schemax_spark.operators.textstats import repetition_profile

    df = spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "b a b a"),
            (3, "unique words only here"),
            (4, "   "),
            (5, None),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_profile(df).collect()}
    assert set(out) == {1, 2, 3}  # empty/null docs emit no row
    assert out[1] == {"doc_id": 1, "n_tokens": 3, "n_distinct": 2,
                      "dup_token_bp": 3333, "top_token_n": 2,
                      "top_token": "a"}
    assert out[2]["top_token_n"] == 2 and out[2]["top_token"] == "a"
    assert out[3]["dup_token_bp"] == 0 and out[3]["top_token_n"] == 1


def test_connected_components_releases_round_checkpoints(spark):
    """Iterative lineage truncation must not pin a labels table per
    round for the session lifetime: after the result is consumed and
    the registry released, the block manager holds nothing — and
    mid-run, superseded rounds are freed as soon as the next round
    materializes (a multi-round chain graph pins at most edges + two
    rounds at any instant)."""
    from py_schemax_spark.operators.dedup import (
        connected_components,
        release_all_intermediates,
    )

    release_all_intermediates()
    jsc = spark.sparkContext._jsc
    # delta-based: session-scoped fixtures hold .cache()d tables in
    # the same block manager — count only what THIS run adds
    before = jsc.getPersistentRDDs().size()
    n = 9
    pairs = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(n - 1)], ["key_a", "key_b"]
    )
    out = connected_components(pairs, driver_max_edges=0)
    rows = out.collect()
    assert len(rows) == n
    # multi-round run, but only the FINAL round's checkpoint (+ the
    # persisted edge set) may still be pinned here
    assert jsc.getPersistentRDDs().size() - before <= 3
    release_all_intermediates()
    assert jsc.getPersistentRDDs().size() == before
    # the result was materialized before release; re-collect of the
    # returned handle is NOT part of the contract after release


def test_dedup_clusters_broadcast_gate_both_branches(spark):
    """Round-3 verdict fix: the component-map join must broadcast only
    when the map passes the bounded size probe. At real crawl dup
    rates the node set is corpus-scale and an unconditional broadcast
    OOMs — so above `max_broadcast_components` the plan must fall back
    to a plain shuffle join, with identical results on both paths."""
    from py_schemax_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("c", "d"), ("x", "y")],
        ["key_a", "key_b"],
    )
    docs = spark.createDataFrame(
        [(k,) for k in ["a", "b", "c", "d", "x", "y", "solo"]],
        ["doc_id"],
    )

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    small = dedup_clusters(docs, pairs)
    assert "BroadcastHashJoin" in plan_of(small), plan_of(small)

    big = dedup_clusters(docs, pairs, max_broadcast_components=2)
    plan = plan_of(big)
    # the probe found >2 components -> NO broadcast of the comp map;
    # the left join becomes a shuffle (sort-merge or shuffled-hash)
    assert "BroadcastHashJoin" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan

    expect = {
        "a": ("a", True), "b": ("a", False), "c": ("a", False),
        "d": ("a", False), "x": ("x", True), "y": ("x", False),
        "solo": ("solo", True),
    }
    for out in (small, big):
        rows = {
            r["doc_id"]: (r["cluster_id"], r["is_survivor"])
            for r in out.collect()
        }
        assert rows == expect


# --- product quantization -------------------------------------------


def test_pq_exact_regime_equals_brute_force(spark):
    """m=1, n_codes=n, iters=0: the codebook IS the corpus, ADC equals
    brute-force cosine bit-for-bit (incl. the 4-decimal rounding and
    vec_id tie-break)."""
    from py_schemax_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("embedding").isNotNull())
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = emb.count()
    exact = pq_topk(emb, queries, dim=64, k=5, m=1, n_codes=n,
                    sample=n, iters=0)
    bf = brute_force_topk(emb, queries, k=5)
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"], r["sim"])
    assert sorted(map(key, exact.collect())) == sorted(
        map(key, bf.collect())
    )


def test_pq_planted_twin_retrieved(spark):
    """A planted exact twin of each query must surface in the ADC
    top-k: it shares the query's codes, so its reconstruction is the
    closest thing the index can represent."""
    from py_schemax_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("embedding").isNotNull())
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    twins = queries.select(
        (F.col("query_id") + 1_000_000).alias("vec_id"),
        F.col("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").union(twins)
    got = pq_topk(corpus, queries, dim=64, k=10, m=8, n_codes=32,
                  sample=4096, iters=3)
    hits = {
        r["query_id"]
        for r in got.collect()
        if r["vec_id"] == r["query_id"] + 1_000_000
    }
    assert hits == {0, 1, 2}


def test_pq_codebooks_deterministic_and_validated(spark):
    import numpy as np

    from py_schemax_spark.operators.similarity import (
        pq_encode,
        train_pq_codebooks,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("embedding").isNotNull())
    b1 = train_pq_codebooks(emb, dim=64, m=4, n_codes=8, sample=200,
                            iters=2)
    b2 = train_pq_codebooks(emb, dim=64, m=4, n_codes=8, sample=200,
                            iters=2)
    assert b1.shape == (4, 8, 16) and np.array_equal(b1, b2)
    codes = pq_encode(emb, b1).collect()
    assert all(len(r["codes"]) == 4 for r in codes)
    assert all(0 <= c < 8 for r in codes for c in r["codes"])
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(emb, dim=64, m=7)
    with pytest.raises(ValueError, match="n_codes"):
        train_pq_codebooks(emb, dim=64, m=4, n_codes=64, sample=10)


def test_ivfpq_exact_regime_equals_brute_force(spark):
    """n_lists=1/nprobe=1/m=1/n_codes=n/iters=0: residual codebook is
    every corpus residual -> exact reconstruction -> ADC == brute
    force (incl. rounding and tie-break)."""
    from py_schemax_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("embedding").isNotNull())
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = emb.count()
    exact = ivfpq_topk(emb, queries, dim=64, k=5, n_lists=1, nprobe=1,
                       m=1, n_codes=n, sample=n, iters_kmeans=0,
                       iters_pq=0)
    bf = brute_force_topk(emb, queries, k=5)
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"], r["sim"])
    assert sorted(map(key, exact.collect())) == sorted(
        map(key, bf.collect())
    )


def test_ivfpq_planted_twin_retrieved_and_pruning_real(spark):
    """Twins of each query surface in the top-k even with only
    nprobe=2 of 8 lists scanned; and with nprobe=1 far-off lists are
    genuinely masked (result is a subset of the full-probe result)."""
    from py_schemax_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("embedding").isNotNull())
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    twins = queries.select(
        (F.col("query_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").union(twins)
    got = ivfpq_topk(corpus, queries, dim=64, k=10, n_lists=8,
                     nprobe=2, m=8, n_codes=32, sample=4096,
                     iters_kmeans=1, iters_pq=3)
    hits = {
        r["query_id"]
        for r in got.collect()
        if r["vec_id"] == r["query_id"] + 1_000_000
    }
    assert hits == {0, 1, 2}
    narrow = ivfpq_topk(corpus, queries, dim=64, k=10, n_lists=8,
                        nprobe=1, m=8, n_codes=32, sample=4096,
                        iters_kmeans=1, iters_pq=3)
    wide = ivfpq_topk(corpus, queries, dim=64, k=10, n_lists=8,
                      nprobe=8, m=8, n_codes=32, sample=4096,
                      iters_kmeans=1, iters_pq=3)
    n_ids = {(r["query_id"], r["vec_id"]) for r in narrow.collect()}
    w_ids = {(r["query_id"], r["vec_id"]) for r in wide.collect()}
    # nprobe=1 scores a strict subset of the candidate space
    assert len(n_ids) <= len(w_ids)


def test_topk_query_side_guard_raises(vectors):
    """Every top-k API collects/broadcasts the query side; an
    oversized query set must fail with a clear error at the API
    boundary (bounded probe), never a driver OOM inside collect()
    (VERDICT r04 'What's wrong' #2)."""
    import pytest

    from py_schemax_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivfpq_topk,
        lsh_topk,
        pq_topk,
    )

    queries = vectors.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    calls = {
        "brute_force_topk": lambda: brute_force_topk(
            vectors, queries, k=1, max_query_rows=3
        ),
        "lsh_topk": lambda: lsh_topk(
            vectors, queries, dim=16, k=1, max_query_rows=3
        ),
        "ivf_topk": lambda: ivf_topk(
            vectors, queries, dim=16, k=1, n_lists=4, max_query_rows=3
        ),
        "pq_topk": lambda: pq_topk(
            vectors, queries, dim=16, k=1, m=1, n_codes=4,
            max_query_rows=3,
        ),
        "ivfpq_topk": lambda: ivfpq_topk(
            vectors, queries, dim=16, k=1, n_lists=2, nprobe=1, m=1,
            n_codes=4, max_query_rows=3,
        ),
    }
    for api, call in calls.items():
        with pytest.raises(ValueError, match=api):
            call()
    # at the default bound the same 4-query calls pass untouched
    got = {
        r["query_id"]: r["vec_id"]
        for r in brute_force_topk(vectors, queries, k=1).collect()
    }
    assert got == {0: 40, 1: 41, 2: 42, 3: 43}


def test_connected_components_string_key_byte_gate(spark, monkeypatch):
    """VERDICT r04 #10: wide string keys must be gated by BYTES, not
    rows — under the byte budget the distributed rounds run (the
    driver fast path must not be entered), and the labels still match
    the driver path's."""
    import py_schemax_spark.operators.dedup as dedup_mod
    from py_schemax_spark.operators.dedup import connected_components

    wide = [
        (f"https://example.org/{'a' * 80}/{i}",
         f"https://example.org/{'a' * 80}/{i + 1}")
        for i in range(6)
    ]
    pairs = spark.createDataFrame(wide, "key_a string, key_b string")
    expected = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert len(expected) == 7 and len(set(expected.values())) == 1

    called = {"driver": False}
    real = dedup_mod._driver_components

    def spy(spark_, edges):
        called["driver"] = True
        return real(spark_, edges)

    monkeypatch.setattr(dedup_mod, "_driver_components", spy)
    # ~100-byte keys × 12 directed edges ≈ 2.4 KB > 1 KB budget →
    # must take the distributed rounds even though 6 ≪ max rows
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            pairs, driver_max_edge_bytes=1024
        ).collect()
    }
    assert not called["driver"]
    assert got == expected
    # int keys ignore the byte gate (no string lengths to probe)
    ints = spark.createDataFrame(
        [(1, 2), (2, 3)], "key_a long, key_b long"
    )
    got_int = {
        r["node"]: r["component"]
        for r in connected_components(
            ints, driver_max_edge_bytes=1
        ).collect()
    }
    assert called["driver"] and got_int == {1: 1, 2: 1, 3: 1}
