"""Table-level conditional checks (CheckSpec): loader structure
validation, 3VL compile semantics, and fusion into the single row
projection."""

from __future__ import annotations

from py_schemax_spark.operators.violations import row_violations
from py_schemax_spark.specs.loader import validate_spec_dict

BASE = {
    "fqn": "t.docs",
    "key": "id",
    "columns": [
        {"name": "id", "type": "integer", "nullable": False},
        {"name": "lang", "type": "string"},
        {"name": "n", "type": "integer"},
    ],
}


def _spec(checks):
    return validate_spec_dict({**BASE, "checks": checks})


class TestLoader:
    def test_valid_checks_parse(self):
        res = _spec([
            {"name": "en_len", "when": "lang = 'en'", "expect": "n <= 10"},
            {"name": "nonneg", "expect": "n >= 0"},
        ])
        assert res.valid
        assert [c.name for c in res.spec.checks] == ["en_len", "nonneg"]
        assert res.spec.checks[0].when == "lang = 'en'"
        assert res.spec.checks[1].when is None

    def test_missing_expect(self):
        res = _spec([{"name": "x"}])
        assert not res.valid
        assert any(
            e.error_at == "$.checks[0].expect" and e.type == "missing"
            for e in res.errors
        )

    def test_bad_name_and_duplicate(self):
        res = _spec([{"name": "no spaces", "expect": "n >= 0"}])
        assert not res.valid
        assert res.errors[0].type == "string_pattern_mismatch"
        res2 = _spec([
            {"name": "a", "expect": "n >= 0"},
            {"name": "a", "expect": "n <= 9"},
        ])
        assert not res2.valid
        assert any(e.type == "value_error" for e in res2.errors)

    def test_extra_key_and_non_list(self):
        res = _spec([{"name": "a", "expect": "1=1", "boom": 2}])
        assert not res.valid
        assert any(
            e.type == "extra_forbidden" and e.error_at == "$.checks[0].boom"
            for e in res.errors
        )
        res2 = validate_spec_dict({**BASE, "checks": "nope"})
        assert not res2.valid
        assert any(e.error_at == "$.checks" for e in res2.errors)


class TestCompile:
    def test_three_valued_logic(self, spark):
        # rows: (id, lang, n)
        rows = [
            (1, "en", 5),      # in scope, ok
            (2, "en", 50),     # in scope, violates
            (3, "de", 50),     # out of scope (when false)
            (4, None, 50),     # out of scope (when null)
            (5, "en", None),   # in scope, expect NULL -> violation
        ]
        df = spark.createDataFrame(rows, "id: long, lang: string, n: long")
        spec = _spec(
            [{"name": "en_cap", "when": "lang = 'en'", "expect": "n <= 10"}]
        ).spec
        # row_violations renders the key column as a string
        out = {
            r["id"]: r
            for r in row_violations(df, spec).collect()
            if r["constraint_id"] == "check.en_cap"
        }
        assert set(out) == {"2", "5"}
        assert out["2"]["observed"] == "(n <= 10) = false"
        assert out["5"]["observed"] == "(n <= 10) = NULL"
        assert out["2"]["expected"] == "n <= 10 (when lang = 'en')"

    def test_unconditional_check(self, spark):
        df = spark.createDataFrame(
            [(1, "en", -1), (2, "de", 3)],
            "id: long, lang: string, n: long",
        )
        spec = _spec([{"name": "nonneg", "expect": "n >= 0"}]).spec
        got = [
            r["id"]
            for r in row_violations(df, spec).collect()
            if r["constraint_id"] == "check.nonneg"
        ]
        assert got == ["1"]

    def test_checks_fuse_into_one_scan(self, spark, tmp_path):
        # the whole row projection (attribute constraints + 3 checks)
        # must stay ONE scan of the table: no Exchange, no second scan
        p = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, "en", 5)], "id: long, lang: string, n: long"
        ).write.parquet(p)
        df = spark.read.parquet(p)
        spec = _spec([
            {"name": "a", "expect": "n >= 0"},
            {"name": "b", "when": "lang = 'en'", "expect": "n <= 10"},
            {"name": "c", "expect": "id + n < 1000"},
        ]).spec
        plan = row_violations(df, spec)._jdf.queryExecution(
        ).executedPlan().toString()
        assert plan.count("Scan parquet") == 1
        assert "Exchange" not in plan

    def test_cross_engine_oracle(self, spark):
        # the same `when`/`expect` strings run verbatim in DuckDB —
        # the ANSI-SQL contract that makes checks engine-portable
        import duckdb

        rows = [(i, "en" if i % 3 == 0 else "de", i * 7 % 23)
                for i in range(60)]
        df = spark.createDataFrame(rows, "id: long, lang: string, n: long")
        spec = _spec(
            [{"name": "cap", "when": "lang = 'en'", "expect": "n <= 15"}]
        ).spec
        got = sorted(
            r["id"] for r in row_violations(df, spec).collect()
            if r["constraint_id"] == "check.cap"
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ",".join(f"({i},'{l}',{n})" for i, l, n in rows)
            + ") v(id, lang, n)"
        )
        want = sorted(
            str(r[0]) for r in con.execute(
                "SELECT id FROM t WHERE (lang = 'en') "
                "AND (n <= 15) IS NOT TRUE"
            ).fetchall()
        )
        assert got == want and len(got) > 0
