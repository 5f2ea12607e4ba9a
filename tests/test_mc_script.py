"""MC script-mode handling: SET headers, @var declarations, DROPs,
query directories (ext/maxcompute/query_helper.go:91-208,
source.go:290-320)."""

from __future__ import annotations

import pytest

from optimus_any2any_spark.compiler.mc_script import (
    remove_comments,
    run_script,
    split_script,
    split_statements,
)
from optimus_any2any_spark.config import Config
from optimus_any2any_spark.pipeline import Pipeline


class TestSplitScript:
    def test_statement_split_on_final_semicolons(self):
        # semicolons inside a line (e.g. string literals) don't split;
        # only `;` followed by newline/end does (query_helper.go:16).
        script = "SELECT 'a;b' AS x;\nSELECT 2;"
        assert split_statements(script) == ["SELECT 'a;b' AS x", "SELECT 2"]

    def test_classification(self):
        script = (
            "set odps.sql.type=2;\n"
            "-- a comment only statement\n;\n"
            "@threshold := 5;\n"
            "@src := SELECT 1 AS v;\n"
            "FUNCTION my_udf AS 'com.x.Udf';\n"
            "DROP TABLE IF EXISTS old;\n"
            "SELECT * FROM t;\n"
        )
        comp = split_script(script)
        assert comp.headers == ["set odps.sql.type=2"]
        assert comp.variables == ["@threshold := 5", "@src := SELECT 1 AS v"]
        assert comp.udfs == ["FUNCTION my_udf AS 'com.x.Udf'"]
        assert comp.drops == ["DROP TABLE IF EXISTS old"]
        assert comp.queries == ["SELECT * FROM t"]

    def test_comment_stripped_classification(self):
        # a SET hidden behind a leading comment line still classifies
        comp = split_script("-- tune\nset a.b=c;\nSELECT 1;")
        assert comp.headers == ["-- tune\nset a.b=c"]
        assert comp.queries == ["SELECT 1"]

    def test_remove_comments(self):
        assert remove_comments("SELECT 1 -- x\n/* y\nz */+ 2") == "SELECT 1 \n+ 2"


class TestRunScript:
    def test_headers_vars_drops_body(self, spark):
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "id long, v long"
        ).createOrReplaceTempView("t_script_src")
        script = (
            "set spark.sql.shuffle.partitions=7;\n"
            "@cut := 15;\n"
            "@big := SELECT * FROM t_script_src WHERE v > @cut;\n"
            "DROP VIEW IF EXISTS t_script_tmp;\n"
            "SELECT id, v FROM @big ORDER BY id;\n"
        )
        df = run_script(spark, script)
        assert [r["id"] for r in df.collect()] == [2, 3]
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        spark.conf.set("spark.sql.shuffle.partitions", "8")

    def test_scalar_var_not_substituted_in_strings(self, spark):
        script = "@x := 9;\nSELECT '@x' AS lit, @x AS val;\n"
        row = run_script(spark, script).collect()[0]
        assert row["lit"] == "@x" and row["val"] == 9

    def test_intermediate_statements_execute(self, spark):
        script = (
            "CREATE OR REPLACE TEMPORARY VIEW t_script_mid AS SELECT 42 AS a;\n"
            "SELECT a FROM t_script_mid;\n"
        )
        assert run_script(spark, script).collect()[0]["a"] == 42

    def test_udf_declaration_raises(self, spark):
        with pytest.raises(NotImplementedError, match="FUNCTION"):
            run_script(spark, "FUNCTION f AS 'com.x.F';\nSELECT 1;\n")

    def test_no_body_raises(self, spark):
        with pytest.raises(ValueError, match="no body"):
            run_script(spark, "set a.b=c;\n")


class TestMcSourceScripts:
    def test_scripted_query_file(self, spark, tmp_path):
        """A SET + var decl + body script through --from=MC."""
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 5)], "grp string, v long"
        ).createOrReplaceTempView("t_mc_script")
        q = tmp_path / "script.sql"
        q.write_text(
            "set spark.sql.ansi.enabled=false;\n"
            "@min_v := 2;\n"
            "@agg := SELECT grp, SUM(v) AS total FROM t_mc_script"
            " WHERE v >= @min_v GROUP BY grp;\n"
            "SELECT grp, total FROM @agg ORDER BY grp;\n"
        )
        cfg = Config.from_env(env_args=[f"MC__QUERY_FILE_PATH={q}"], environ={})
        df = Pipeline(spark, "MC", ["IO"], cfg).dataframe()
        got = {r["grp"]: r["total"] for r in df.collect()}
        assert got == {"a": 2, "b": 5}

    def test_query_directory_fanout(self, spark, tmp_path):
        """A directory of query files unions results with the filename
        column set per-file (source.go:290-320, :234)."""
        spark.createDataFrame([(1,)], "v long").createOrReplaceTempView(
            "t_mc_dir"
        )
        qdir = tmp_path / "queries"
        qdir.mkdir()
        (qdir / "one.sql").write_text("SELECT v, 'one' AS src FROM t_mc_dir")
        (qdir / "two.sql").write_text("SELECT v * 2 AS v, 'two' AS src FROM t_mc_dir")
        cfg = Config.from_env(
            env_args=[f"MC__QUERY_FILE_PATH={qdir}"], environ={}
        )
        df = Pipeline(spark, "MC", ["IO"], cfg).dataframe()
        rows = {r["src"]: r for r in df.collect()}
        assert rows["one"]["v"] == 1 and rows["two"]["v"] == 2
        assert rows["one"]["__METADATA__filename"] == "one.sql"
        assert rows["two"]["__METADATA__filename"] == "two.sql"

    def test_directory_with_pre_query(self, spark, tmp_path):
        """Pre-query fan-out × query-directory fan-out compose."""
        spark.createDataFrame(
            [("x", 1), ("y", 3)], "grp string, v long"
        ).createOrReplaceTempView("t_mc_pre_dir")
        pre = tmp_path / "pre.sql"
        pre.write_text("SELECT DISTINCT grp FROM t_mc_pre_dir")
        qdir = tmp_path / "qs"
        qdir.mkdir()
        (qdir / "q.sql").write_text(
            "SELECT SUM(v) AS total FROM t_mc_pre_dir WHERE grp = '[[ .grp ]]'"
        )
        cfg = Config.from_env(
            env_args=[
                f"MC__PRE_QUERY_FILE_PATH={pre}",
                f"MC__QUERY_FILE_PATH={qdir}",
            ],
            environ={},
        )
        df = Pipeline(spark, "MC", ["IO"], cfg).dataframe()
        got = {(r["grp"], r["__METADATA__filename"]): r["total"] for r in df.collect()}
        assert got == {("x", "q.sql"): 1, ("y", "q.sql"): 3}


def test_execution_project_and_additional_hints(spark, tmp_path):
    """MC__EXECUTION_PROJECT selects the session database and
    MC__ADDITIONAL_HINTS ('k:v,k2:v2') apply while the source's queries
    are built (ext/maxcompute/source.go:39,82) — and, because the
    reference scopes both per source instance, they are RESTORED
    afterwards rather than leaking into later components sharing the
    SparkSession (ADVICE r3)."""
    from optimus_any2any_spark.config import Config
    from optimus_any2any_spark.pipeline import (
        SOURCE_BUILDERS,
        _load_builtin_components,
    )

    _load_builtin_components()
    spark.sql("CREATE DATABASE IF NOT EXISTS hintdb")
    prev = spark.catalog.currentDatabase()
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.sql("DROP TABLE IF EXISTS hintdb.t_hints")
        spark.sql("CREATE TABLE hintdb.t_hints AS SELECT 1 AS n")
        cfg = Config.from_env(
            env_args=[
                "MC__QUERY=SELECT n FROM t_hints",
                "MC__EXECUTION_PROJECT=hintdb",
                "MC__ADDITIONAL_HINTS=spark.sql.shuffle.partitions:7",
            ],
            environ={},
        )
        df = SOURCE_BUILDERS["MC"](spark, cfg)
        # the query resolved against hintdb while the hint was active...
        assert [r["n"] for r in df.collect()] == [1]
        # ...but neither the database nor the conf leaked out
        assert spark.catalog.currentDatabase() == prev
        assert (
            spark.conf.get("spark.sql.shuffle.partitions") == prev_shuffle
        )
    finally:
        spark.catalog.setCurrentDatabase(prev)
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        spark.sql("DROP TABLE IF EXISTS hintdb.t_hints")
        spark.sql("DROP DATABASE IF EXISTS hintdb")


def test_additional_hints_key_validated(spark):
    """Hint keys flow into session conf — reject anything that is not a
    plain dotted identifier (no SQL metacharacters)."""
    import pytest

    from optimus_any2any_spark.config import Config
    from optimus_any2any_spark.pipeline import (
        SOURCE_BUILDERS,
        _load_builtin_components,
    )

    _load_builtin_components()
    cfg = Config.from_env(
        env_args=[
            "MC__QUERY=SELECT 1 AS n",
            "MC__ADDITIONAL_HINTS=bad key; DROP TABLE x:1",
        ],
        environ={},
    )
    with pytest.raises(ValueError, match="invalid hint key"):
        SOURCE_BUILDERS["MC"](spark, cfg)


def test_hint_restore_even_when_query_fails(spark):
    """The finally-restore must run when the query itself errors."""
    import pytest

    from optimus_any2any_spark.config import Config
    from optimus_any2any_spark.pipeline import (
        SOURCE_BUILDERS,
        _load_builtin_components,
    )

    _load_builtin_components()
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    cfg = Config.from_env(
        env_args=[
            "MC__QUERY=SELECT * FROM definitely_not_a_table_xyz",
            "MC__ADDITIONAL_HINTS=spark.sql.shuffle.partitions:5",
        ],
        environ={},
    )
    with pytest.raises(Exception):
        SOURCE_BUILDERS["MC"](spark, cfg)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_shuffle
