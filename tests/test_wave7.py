"""Wave-7 operators: Benford first-digit screen, per-group dup rate
(operators/profile.py), URL canonicalization + canonical dedup
(functions/urls.py), and row-level snapshot diff
(operators/integrity.py). Planted inputs with hand-computed
expectations plus the null/degenerate edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_schemax_spark.functions.urls import (
    canonical_dedup_report,
    canonicalize_url,
)
from py_schemax_spark.operators.integrity import row_diff
from py_schemax_spark.operators.profile import (
    BENFORD_BP,
    benford_check,
    dup_rate_by_group,
)


class TestBenford:
    def test_expected_table_is_floored_log(self):
        import math

        assert BENFORD_BP == tuple(
            math.floor(math.log10(1 + 1 / d) * 10000)
            for d in range(1, 10)
        )

    def test_counts_and_deviation(self, spark):
        # 1×4, 2×3, 9×3 → n=10; digit 1: 4000 bp (dev 990),
        # digit 2: 3000 bp (dev 1240), digit 9: 3000 bp (dev 2543)
        vals = [1, 10, 199, 1000000, 2, 25, 2900, 9, 91, 999]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        rows = {r.digit: r for r in benford_check(df, "v").collect()}
        assert set(rows) == {1, 2, 9}
        assert (rows[1].n, rows[1].observed_bp, rows[1].dev_bp) == (
            4, 4000, 4000 - 3010)
        assert (rows[2].n, rows[2].observed_bp, rows[2].dev_bp) == (
            3, 3000, 3000 - 1760)
        assert (rows[9].n, rows[9].observed_bp, rows[9].dev_bp) == (
            3, 3000, 3000 - 457)

    def test_nonpositive_and_null_excluded(self, spark):
        df = spark.createDataFrame(
            [(0,), (-5,), (None,), (7,)], "v long"
        )
        rows = benford_check(df, "v").collect()
        assert len(rows) == 1
        assert (rows[0].digit, rows[0].n, rows[0].observed_bp) == (
            7, 1, 10000)

    def test_float_column_uses_decimal_rendering(self, spark):
        # 0.5 → decimal(38,0) rounds to 1 (HALF_UP): first digit 1;
        # 35.2 → 35 → digit 3 — exact for the integral rendering,
        # documented contract (Benford targets multi-scale magnitudes)
        df = spark.createDataFrame([(35.2,), (7000.9,)], "v double")
        rows = {r.digit: r.n for r in benford_check(df, "v").collect()}
        assert rows == {3: 1, 7: 1}


class TestDupRate:
    def test_rates_per_group(self, spark):
        rows = (
            [("a", "x")] * 3            # 3 docs, 1 distinct → 2 dup
            + [("a", "y")]              # +1 distinct
            + [("b", "p"), ("b", "q")]  # all distinct → 0 dup
        )
        df = spark.createDataFrame(rows, ["g", "t"])
        out = {r.group: r for r in
               dup_rate_by_group(df, "g", "t").collect()}
        a, b = out["a"], out["b"]
        assert (a.n_docs, a.n_distinct, a.n_dup, a.dup_bp) == (
            4, 2, 2, 5000)
        assert (b.n_docs, b.n_distinct, b.n_dup, b.dup_bp) == (
            2, 2, 0, 0)

    def test_null_texts_form_one_digest_class(self, spark):
        df = spark.createDataFrame(
            [("a", None), ("a", None), ("a", "x")], ["g", "t"]
        )
        r = dup_rate_by_group(df, "g", "t").collect()[0]
        # two nulls collapse to one class → 1 dup of 3 docs
        assert (r.n_docs, r.n_distinct, r.n_dup) == (3, 2, 1)


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(canonicalize_url(F.col("u")).alias("c")).collect()[
        0
    ].c


class TestCanonicalizeUrl:
    def test_full_decoration_collapses(self, spark):
        assert (
            _canon(
                spark,
                "HTTPS://user:pw@WWW.Ex.ORG:443/A/b/"
                "?utm_source=x&b=2&a=1&#frag",
            )
            == "https://ex.org/A/b?a=1&b=2"
        )

    def test_http_default_port_and_root_slash(self, spark):
        assert _canon(spark, "http://Host.org:80/") == "http://host.org"
        # non-default port survives
        assert (
            _canon(spark, "http://host.org:8080/x")
            == "http://host.org:8080/x"
        )

    def test_param_sort_is_bytewise(self, spark):
        assert (
            _canon(spark, "https://h.io/p?z=1&a=2&m=3")
            == "https://h.io/p?a=2&m=3&z=1"
        )

    def test_tracking_params_dropped_entirely(self, spark):
        assert (
            _canon(
                spark,
                "https://h.io/p?utm_campaign=c&gclid=g&fbclid=f"
                "&msclkid=m&yclid=y",
            )
            == "https://h.io/p"
        )
        # utm-like non-tracking name survives (must match '=' form)
        assert (
            _canon(spark, "https://h.io/p?utmost=1")
            == "https://h.io/p?utmost=1"
        )

    def test_fragment_question_mark_not_a_query(self, spark):
        assert (
            _canon(spark, "https://h.io/app#/route?x=1")
            == "https://h.io/app"
        )

    def test_non_url_and_null_pass_through(self, spark):
        assert _canon(spark, "not a url") == "not a url"
        df = spark.createDataFrame([(None,)], "u string")
        assert (
            df.select(canonicalize_url(F.col("u")).alias("c"))
            .collect()[0].c
            is None
        )

    def test_case_of_path_and_query_preserved(self, spark):
        # only scheme+authority are case-insensitive per RFC 3986
        assert (
            _canon(spark, "https://H.io/CaseSensitive?Q=V")
            == "https://h.io/CaseSensitive?Q=V"
        )

    def test_dedup_report_groups_and_keep_first(self, spark):
        df = spark.createDataFrame(
            [
                (1, "https://www.a.com/x/"),
                (2, "HTTPS://A.com/x"),
                (3, "https://a.com/x?utm_source=s"),
                (4, "https://b.com/unique"),
            ],
            "doc_id long, url string",
        )
        out = canonical_dedup_report(df, "url", "doc_id").collect()
        assert len(out) == 1
        r = out[0]
        assert (r.canonical_url, r.n_docs, r.keep_key) == (
            "https://a.com/x", 3, 1)


class TestRowDiff:
    def _snap(self, spark, rows):
        return spark.createDataFrame(
            rows, "k long, a string, b long"
        )

    def test_added_removed_changed(self, spark):
        prev = self._snap(
            spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)]
        )
        cur = self._snap(
            spark, [(1, "x", 10), (2, "y2", 21), (4, "w", 40)]
        )
        out = {r.key: r for r in row_diff(cur, prev, "k").collect()}
        assert set(out) == {2, 3, 4}
        assert (out[2].status, out[2].changed_cols) == ("changed", "a,b")
        assert (out[3].status, out[3].changed_cols) == ("removed", "")
        assert (out[4].status, out[4].changed_cols) == ("added", "")

    def test_identical_snapshots_empty(self, spark):
        prev = self._snap(spark, [(1, "x", 10), (None, "n", 1)])
        assert row_diff(prev, prev, "k").count() == 0

    def test_null_key_matches_null_key(self, spark):
        prev = self._snap(spark, [(None, "x", 1)])
        cur = self._snap(spark, [(None, "x", 2)])
        out = row_diff(cur, prev, "k").collect()
        assert len(out) == 1
        assert (out[0].key, out[0].status, out[0].changed_cols) == (
            None, "changed", "b")

    def test_null_to_value_is_changed(self, spark):
        prev = self._snap(spark, [(1, None, 10)])
        cur = self._snap(spark, [(1, "now", 10)])
        out = row_diff(cur, prev, "k").collect()
        assert (out[0].status, out[0].changed_cols) == ("changed", "a")

    def test_compare_cols_subset(self, spark):
        prev = self._snap(spark, [(1, "x", 10)])
        cur = self._snap(spark, [(1, "CHANGED", 10)])
        # only column b compared → no diff reported
        assert row_diff(cur, prev, "k", compare_cols=["b"]).count() == 0

    def test_single_join_plan(self, spark):
        prev = self._snap(spark, [(1, "x", 10)])
        cur = self._snap(spark, [(1, "y", 10)])
        plan = row_diff(cur, prev, "k")._jdf.queryExecution().executedPlan().toString()
        # one full-outer join, no second corpus pass
        assert plan.count("Join") == 1
