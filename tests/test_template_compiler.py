"""Template-compiler contract tests.

Mirrors the reference's only real unit tests
(internal/ext/compiler/compiler_test.go:11-88, FIXTURES.md F9) plus the
Column backend equivalence.
"""

from __future__ import annotations

import json
import re
import uuid

import pytest

from optimus_any2any_spark.compiler.template import compile_template

RECORD = {"column1": "value1", "column2": 102, "nested": {"column2": "value2"}}


class TestRenderContracts:
    def test_field_interpolation(self):
        t = compile_template("column1: [[ .column1 ]], column2: [[ .column2 ]]")
        assert t.render(RECORD) == "column1: value1, column2: 102"

    def test_nested_field(self):
        assert compile_template("[[ .nested.column2 ]]").render(RECORD) == "value2"

    def test_non_delim_passthrough(self):
        src = "no render {{ .DSTART }}"
        assert compile_template(src).render(RECORD) == src

    def test_integer_div_truncates(self):
        assert compile_template("[[ div .column2 100 ]]").render(RECORD) == "1"

    def test_batch_step_arithmetic(self):
        # ext/oss/sink.go:54 batch-splitting template
        t = compile_template("[[ mul (div .__METADATA__record_index 10) 10 ]]")
        for idx, expect in [(0, "0"), (9, "0"), (10, "10"), (25, "20")]:
            assert t.render({"__METADATA__record_index": idx}) == expect

    def test_now_format(self):
        out = compile_template('[[ now.Format "2006-01-02" ]]').render({})
        assert re.fullmatch(r"\d{4}-\d{2}-\d{2}", out)

    def test_uuid(self):
        out = compile_template("[[ uuid ]]").render({})
        uuid.UUID(out)  # parses

    def test_tojson_whole_record(self):
        out = compile_template("[[ . | tojson ]]").render(RECORD)
        assert json.loads(out) == RECORD

    def test_sprig_string_funcs(self):
        assert compile_template("[[ upper .column1 ]]").render(RECORD) == "VALUE1"
        assert compile_template('[[ replace "l" "L" .column1 ]]').render(RECORD) == "vaLue1"
        assert compile_template('[[ trim "  x  " ]]').render({}) == "x"
        assert compile_template('[[ printf "%s-%d" .column1 .column2 ]]').render(RECORD) == "value1-102"

    def test_field_refs(self):
        t = compile_template("a [[ .x ]] b [[ mul (div .y 10) 10 ]]")
        assert t.field_refs() == {"x", "y"}

    def test_static(self):
        assert compile_template("plain").is_static
        assert not compile_template("[[ .a ]]").is_static


class TestColumnBackend:
    @pytest.fixture(scope="class")
    def df(self, spark):
        return spark.createDataFrame(
            [
                ("group_1", 0, 3.0, True),
                ("group_2", 10, 2.5, False),
            ],
            "group_id string, __METADATA__record_index long, score double, flag boolean",
        )

    def collect(self, df, template):
        t = compile_template(template)
        return [r[0] for r in df.select(t.column(df)).collect()]

    def test_destination_routing(self, df):
        # docs/rfc_007 destination template
        out = self.collect(df, "oss://b/file_[[ .group_id ]].json")
        assert out == ["oss://b/file_group_1.json", "oss://b/file_group_2.json"]

    def test_batch_arithmetic(self, df):
        out = self.collect(df, "[[ mul (div .__METADATA__record_index 10) 10 ]]")
        assert out == ["0", "10"]

    def test_float_and_bool_stringification(self, df):
        # Go %v semantics: whole floats bare, bools lowercase
        assert self.collect(df, "[[ .score ]]") == ["3", "2.5"]
        assert self.collect(df, "[[ .flag ]]") == ["true", "false"]

    def test_pipe_upper(self, df):
        assert self.collect(df, "[[ .group_id | upper ]]") == ["GROUP_1", "GROUP_2"]

    def test_render_column_parity(self, df):
        """Both backends must produce identical strings."""
        templates = [
            "f_[[ .group_id ]]_[[ div .__METADATA__record_index 7 ]]",
            "[[ printf \"%s|%s\" .group_id .score ]]",
            "[[ .score ]]-[[ .flag ]]",
        ]
        rows = [r.asDict() for r in df.collect()]
        for tmpl in templates:
            t = compile_template(tmpl)
            py = [t.render(r) for r in rows]
            col = [r[0] for r in df.select(t.column(df)).collect()]
            assert py == col, tmpl

    def test_comparisons_and_booleans(self, df):
        """Go template builtins eq/ne/lt/and/or/not in both backends."""
        templates = [
            '[[ ternary "yes" "no" (eq .group_id "group_1") ]]',
            '[[ ternary 1 0 (and .flag (gt .score 2)) ]]',
            '[[ ternary 1 0 (or .flag (lt .score 2.6)) ]]',
            '[[ ternary 1 0 (not .flag) ]]',
            '[[ ternary 1 0 (ne .__METADATA__record_index 0) ]]',
        ]
        rows = [r.asDict() for r in df.collect()]
        for tmpl in templates:
            t = compile_template(tmpl)
            py = [t.render(r) for r in rows]
            col = [r[0] for r in df.select(t.column(df)).collect()]
            assert py == col, tmpl

    def test_default_emptiness_parity(self, spark):
        """sprig: nil/""/0/false are all empty — both backends must
        substitute identically (ADVICE template.py:436)."""
        df = spark.createDataFrame(
            [(0, False, "", None, 7)],
            "zero long, flag boolean, empty string, missing string, seven long",
        )
        templates = [
            '[[ default "D" .zero ]]',
            '[[ default "D" .flag ]]',
            '[[ default "D" .empty ]]',
            '[[ default "D" .missing ]]',
            '[[ default "D" .seven ]]',
        ]
        rows = [r.asDict() for r in df.collect()]
        for tmpl in templates:
            t = compile_template(tmpl)
            py = [t.render(r) for r in rows]
            col = [r[0] for r in df.select(t.column(df)).collect()]
            assert py == col, tmpl
        assert compile_template('[[ default "D" .zero ]]').render(rows[0]) == "D"
        assert compile_template('[[ default "D" .seven ]]').render(rows[0]) == "7"


class TestCompileCache:
    def test_one_parse_per_distinct_text(self, monkeypatch):
        """Per-record-templated sinks re-compile the same source every
        write; the compile must be paid once per distinct text."""
        import optimus_any2any_spark.compiler.template as tc

        tc._TEMPLATE_CACHE.clear()
        parses = []
        orig = tc.Template.__init__

        def counting(self, source):
            parses.append(source)
            orig(self, source)

        monkeypatch.setattr(tc.Template, "__init__", counting)
        a1 = tc.compile_template("x-[[ .k ]]")
        a2 = tc.compile_template("x-[[ .k ]]")
        b = tc.compile_template("y-[[ .k ]]")
        assert a1 is a2 and a1 is not b
        assert parses == ["x-[[ .k ]]", "y-[[ .k ]]"]
        assert a1.render({"k": 7}) == "x-7"

    def test_cache_bounded(self):
        import optimus_any2any_spark.compiler.template as tc

        tc._TEMPLATE_CACHE.clear()
        for i in range(tc._TEMPLATE_CACHE_MAX + 5):
            tc.compile_template(f"t{i}")
        assert len(tc._TEMPLATE_CACHE) <= tc._TEMPLATE_CACHE_MAX

    def test_lru_keeps_hot_entries_past_cap(self, monkeypatch):
        """Cycling >cap distinct templates must evict LRU-style, not
        wholesale-clear: a template touched every round survives the
        churn with exactly one parse (VERDICT r12 item 7)."""
        import optimus_any2any_spark.compiler.template as tc

        tc._TEMPLATE_CACHE.clear()
        parses = []
        orig = tc.Template.__init__

        def counting(self, source):
            parses.append(source)
            orig(self, source)

        monkeypatch.setattr(tc.Template, "__init__", counting)
        hot = "hot-[[ .k ]]"
        tc.compile_template(hot)
        for batch in range(3):
            for i in range(tc._TEMPLATE_CACHE_MAX - 2):
                tc.compile_template(f"cold-{batch}-{i}")
            tc.compile_template(hot)
        assert parses.count(hot) == 1
        assert len(tc._TEMPLATE_CACHE) == tc._TEMPLATE_CACHE_MAX
