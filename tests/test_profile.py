"""Column-profile operators: categorical TV drift, exact heavy
hitters, MAD outliers (operators/profile.py). Planted distributions
with hand-computed expectations, plus the null/degenerate edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_schemax_spark.operators.profile import (
    categorical_tv,
    heavy_hitters,
    mad_outliers,
)


def _cat(spark, rows):
    return spark.createDataFrame(rows, ["v", "grp"])


class TestCategoricalTV:
    def test_identical_groups_zero(self, spark):
        rows = [("en", 0), ("de", 0), ("en", 1), ("de", 1)]
        r = categorical_tv(_cat(spark, rows), "v", "grp").collect()[0]
        assert (r.n_a, r.n_b, r.n_values, r.tv_bp) == (2, 2, 2, 0)

    def test_disjoint_groups_full(self, spark):
        rows = [("en", 0), ("en", 0), ("de", 1), ("fr", 1)]
        r = categorical_tv(_cat(spark, rows), "v", "grp").collect()[0]
        assert (r.n_a, r.n_b, r.tv_bp) == (2, 2, 10000)

    def test_half_moved(self, spark):
        # a: en,en  b: en,de → TV = 1/2 (|1-1/2| + |0-1/2|) = 1/2
        rows = [("en", 0), ("en", 0), ("en", 1), ("de", 1)]
        r = categorical_tv(_cat(spark, rows), "v", "grp").collect()[0]
        assert r.tv_bp == 5000

    def test_null_group_dropped_null_value_counted(self, spark):
        rows = [("en", 0), (None, 0), ("en", 1), ("boom", None)]
        r = categorical_tv(_cat(spark, rows), "v", "grp").collect()[0]
        # a: {en, null}, b: {en} → TV = 1/2 (|1/2-1| + |1/2-0|) = 1/2
        assert (r.n_a, r.n_b, r.n_values, r.tv_bp) == (2, 1, 2, 5000)


class TestHeavyHitters:
    def test_strict_threshold(self, spark):
        # 10 rows: 'a'×5, 'b'×2, rest singletons; k=5 → share > 20%:
        # only 'a' (b is exactly 20%, strict > excludes it)
        rows = [("a",)] * 5 + [("b",)] * 2 + [("c",), ("d",), ("e",)]
        df = spark.createDataFrame(rows, ["v"])
        out = heavy_hitters(df, "v", k=5).collect()
        assert [(r.value, r.cnt, r.n_total, r.share_bp) for r in out] == [
            ("a", 5, 10, 5000)
        ]

    def test_null_is_a_value(self, spark):
        rows = [(None,)] * 3 + [("x",)]
        df = spark.createDataFrame(rows, "v: string")
        out = heavy_hitters(df, "v", k=2).collect()
        assert [(r.value, r.cnt, r.share_bp) for r in out] == [
            (None, 3, 7500)
        ]

    def test_bounded_output(self, spark):
        # k=4 → strictly more than 25%: at most 3 qualifiers ever
        rows = [(str(i % 4),) for i in range(16)] + [("0",)]
        df = spark.createDataFrame(rows, ["v"])
        out = heavy_hitters(df, "v", k=4).collect()
        assert len(out) <= 3
        assert {r.value for r in out} == {"0"}


class TestMadOutliers:
    def test_planted_outlier(self, spark):
        # values 10..14 plus 1000: med=12 (lower median of 6),
        # deviations {2,1,0,1,2,988} → mad=1, k=5 → |v-12|>5
        rows = [(i, v) for i, v in enumerate([10, 11, 12, 13, 14, 1000])]
        df = spark.createDataFrame(rows, ["id", "v"])
        out = mad_outliers(df, "v", "id", k=5).collect()
        assert [(r.key, r.value, r.med, r.mad) for r in out] == [
            (5, 1000, 12, 1)
        ]

    def test_mad_zero_degenerates_to_neq(self, spark):
        rows = [(i, 7) for i in range(6)] + [(9, 8)]
        df = spark.createDataFrame(rows, ["id", "v"])
        out = mad_outliers(df, "v", "id", k=5).collect()
        assert [(r.key, r.value, r.med, r.mad) for r in out] == [
            (9, 8, 7, 0)
        ]

    def test_nulls_never_violate(self, spark):
        rows = [(0, 1), (1, 1), (2, 1), (3, None), (4, 100)]
        df = spark.createDataFrame(rows, "id: long, v: long")
        out = mad_outliers(df, "v", "id", k=5).collect()
        assert [(r.key, r.value) for r in out] == [(4, 100)]

    def test_no_corpus_shuffle(self, spark):
        # the flagging pass must be scan + broadcast-scalar filter:
        # no Exchange above the corpus scan in the final stage (the
        # only exchanges sit under the bounded count-table windows)
        df = spark.range(1000).select(
            F.col("id"), (F.col("id") % 13).alias("v")
        )
        plan = mad_outliers(df, "v", "id", k=5)._jdf.queryExecution(
        ).executedPlan().toString()
        # corpus side appears as a BroadcastNestedLoopJoin stream side;
        # assert the join is broadcast, not a shuffled join
        assert "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan


class TestProfileCLIAndTable:
    def test_profile_table_report(self, spark):
        rows = [(i, "en" if i < 8 else "de", 10 + (i % 3)) for i in range(10)]
        df = spark.createDataFrame(rows, ["id", "lang", "n"])
        from py_schemax_spark.operators.profile import profile_table

        rep = profile_table(df, hh_k=4, mad_k=5, key_col="id")
        assert rep["n_rows"] == 10
        langs = rep["columns"]["lang"]
        assert langs["null_count"] == 0
        assert [h["value"] for h in langs["heavy_hitters"]] == ["en"]
        assert rep["columns"]["n"]["mad_outliers"] == 0
        assert rep["columns"]["n"]["min"] == "10"
        assert rep["columns"]["n"]["max"] == "12"

    def test_profile_table_unknown_column(self, spark):
        import pytest as _pytest

        from py_schemax_spark.operators.profile import profile_table

        df = spark.createDataFrame([(1,)], ["a"])
        with _pytest.raises(ValueError, match="unknown column"):
            profile_table(df, columns=["a", "nope"])

    def test_cli_profile_json(self, spark, tmp_path, capsys):
        import json

        from py_schemax_spark.cli import main

        p = str(tmp_path / "t")
        spark.createDataFrame(
            [(i, "x" * (i % 2 + 1)) for i in range(20)], ["id", "s"]
        ).write.parquet(p)
        rc = main(
            ["profile", p, "--json", "--hh-k", "3", "--key-col", "id"],
            spark=spark,
        )
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip())
        assert rep["n_rows"] == 20
        assert set(rep["columns"]) == {"id", "s"}
        assert {h["value"] for h in rep["columns"]["s"]["heavy_hitters"]} \
            == {"x", "xx"}

    def test_cli_profile_bad_k_exits_2(self, spark, capsys):
        from py_schemax_spark.cli import main

        assert main(["profile", "/nope", "--hh-k", "1"], spark=spark) == 2
        assert "hh-k" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# corpus_report


def test_corpus_report_hand_computed(spark):
    from py_schemax_spark.operators.profile import corpus_report

    rows = [
        (0, "alpha beta", "en"),
        (1, "alpha beta", "en"),          # exact dup of 0
        (2, "mail me x@y.org today", "en"),
        (3, None, "de"),
        (4, "unique text here", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = corpus_report(df).collect()
    assert len(got) == 1
    r = got[0].asDict()
    assert r["n_docs"] == 5
    assert r["n_null_text"] == 1
    assert r["total_tokens"] == 2 + 2 + 4 + 0 + 3
    assert r["n_distinct_texts"] == 3
    assert r["pii_docs"] == 1
    assert r["n_langs"] == 2  # nulls not counted (SQL COUNT DISTINCT)
    assert r["top_lang"] == "en" and r["top_lang_n"] == 3
    # 4 docs with text, 3 distinct -> 1 dup -> 2500 bp
    assert r["exact_dup_bp"] == 2500
    assert r["pii_bp"] == 2000
    assert r["top_lang_bp"] == 6000


def test_corpus_report_top_lang_tiebreak_nulls_last(spark):
    from py_schemax_spark.operators.profile import corpus_report

    rows = [(0, "a", None), (1, "b", None), (2, "c", "fr"),
            (3, "d", "fr"), (4, "e", "en"), (5, "f", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = corpus_report(df).collect()[0]
    # three-way count tie (2,2,2): lang asc NULLS LAST -> "en"
    assert r["top_lang"] == "en"


def test_corpus_report_all_null_text(spark):
    from py_schemax_spark.operators.profile import corpus_report

    df = spark.createDataFrame(
        [(0, None, "en"), (1, None, "en")],
        "doc_id long, text string, lang string",
    )
    r = corpus_report(df).collect()[0]
    assert r["n_distinct_texts"] == 0
    assert r["exact_dup_bp"] is None  # no text docs: rate undefined
    assert r["total_tokens"] == 0


# ---------------------------------------------------------------------------
# group_quantiles


def test_group_quantiles_exact_hand_computed(spark):
    from py_schemax_spark.operators.profile import group_quantiles

    df = spark.createDataFrame(
        [("a", v) for v in (10, 20, 30, 40)] + [("b", 5)],
        "lang string, n long",
    )
    got = {
        (r["group"], r["q"]): r["value"]
        for r in group_quantiles(
            df, "lang", "n", qs=(0.5, 1.0), exact=True
        ).collect()
    }
    assert got[("a", 0.5)] == 25.0  # interpolated median of 10..40
    assert got[("a", 1.0)] == 40.0
    assert got[("b", 0.5)] == 5.0


def test_group_quantiles_null_values_and_groups(spark):
    from py_schemax_spark.operators.profile import group_quantiles

    df = spark.createDataFrame(
        [("a", 1), ("a", None), (None, 7)], "lang string, n long"
    )
    got = {
        (r["group"], r["q"]): r["value"]
        for r in group_quantiles(
            df, "lang", "n", qs=(0.5,), exact=True
        ).collect()
    }
    assert got[("a", 0.5)] == 1.0  # null value excluded
    assert got[(None, 0.5)] == 7.0  # null group is a group


def test_group_quantiles_approx_brackets_exact(spark):
    from py_schemax_spark.operators.profile import group_quantiles

    df = spark.createDataFrame(
        [("a", v) for v in range(1000)], "lang string, n long"
    )
    approx = {
        r["q"]: r["value"]
        for r in group_quantiles(df, "lang", "n", qs=(0.5,)).collect()
    }
    assert 480 <= approx[0.5] <= 520


def test_group_quantiles_validation(spark):
    from py_schemax_spark.operators.profile import group_quantiles

    df = spark.createDataFrame([("a", 1)], "lang string, n long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        group_quantiles(df, "lang", "n", qs=())
    with _pytest.raises(ValueError):
        group_quantiles(df, "lang", "n", qs=(1.5,))


def test_corpus_report_empty_corpus_keeps_one_row(spark):
    """The datasheet contract is exactly ONE row regardless of corpus
    size — including an EMPTY corpus (ADVICE r04: the crossJoin with
    the 0-row top-lang table erased the row)."""
    from py_schemax_spark.operators.profile import corpus_report

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string"
    )
    rows = corpus_report(empty).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 0 and r["total_tokens"] == 0
    assert r["top_lang"] is None and r["top_lang_n"] is None
    assert r["exact_dup_bp"] is None and r["pii_bp"] is None
