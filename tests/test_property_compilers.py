"""Property-based tests (hypothesis): template render/column parity and
JQ-subset vs jq-binary differential over generated records."""

from __future__ import annotations

import json
import subprocess

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from optimus_any2any_spark.compiler.template import compile_template

# identifiers safe for template fields and jq paths
names = st.sampled_from(["alpha", "beta", "gamma", "delta"])
scalars = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127),
        max_size=12,
    ),
    st.booleans(),
)
records = st.dictionaries(names, scalars, min_size=1, max_size=4)


class TestTemplateProperties:
    @given(rec=records)
    @settings(max_examples=50, deadline=None)
    def test_interpolation_roundtrip(self, rec):
        """[[ .k ]] renders the Go %v form of every field."""
        t = compile_template(
            "|".join(f"[[ .{k} ]]" for k in sorted(rec))
        )
        parts = t.render(rec).split("|")
        for got, k in zip(parts, sorted(rec)):
            v = rec[k]
            expect = ("true" if v else "false") if isinstance(v, bool) else str(v)
            assert got == expect

    @given(rec=records)
    @settings(max_examples=30, deadline=None)
    def test_static_text_passthrough(self, rec):
        src = "prefix {{ .macro }} suffix"
        assert compile_template(src).render(rec) == src

    @given(a=st.integers(1, 10**6), b=st.integers(1, 10**4))
    @settings(max_examples=50, deadline=None)
    def test_div_mul_matches_go_semantics(self, a, b):
        rec = {"x": a}
        out = compile_template(f"[[ mul (div .x {b}) {b} ]]").render(rec)
        assert out == str((a // b) * b)


@pytest.mark.usefixtures("spark")
class TestRenderColumnParity:
    """The two template backends must agree on arbitrary records."""

    @given(recs=st.lists(records, min_size=1, max_size=5))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_parity(self, spark, recs):
        keys = sorted({k for r in recs for k in r})
        # normalize: every record gets every key (nulls for missing) and
        # consistent value types per column (stringify mixed columns)
        norm = []
        for r in recs:
            row = {}
            for k in keys:
                v = r.get(k)
                row[k] = None if v is None else str(v) if not isinstance(v, bool) else v
            norm.append(row)
        schema = ", ".join(
            f"`{k}` " + ("boolean" if all(
                isinstance(r[k], bool) or r[k] is None for r in norm
            ) else "string")
            for k in keys
        )
        df = spark.createDataFrame(norm, schema)
        tmpl = "-".join(f"[[ .{k} ]]" for k in keys)
        t = compile_template(tmpl)
        py = [t.render(r) for r in norm]
        col = [r[0] for r in df.select(t.column(df)).collect()]
        assert py == col


class TestJqDifferential:
    @given(
        rows=st.lists(
            st.fixed_dictionaries(
                {"k": st.integers(-100, 100), "s": st.text(
                    alphabet="abcxyz", max_size=6
                )}
            ),
            min_size=1,
            max_size=8,
        ),
        threshold=st.integers(-50, 50),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_select_matches_binary(self, spark, rows, threshold):
        from optimus_any2any_spark.compiler.jq import translate_jq

        df = spark.createDataFrame(rows, "k long, s string")
        program = f".[] | select(.k > {threshold})"
        got = sorted(
            (r["k"], r["s"]) for r in translate_jq(df, program).collect()
        )
        out = subprocess.run(
            ["jq", "-c", program],
            input=json.dumps(rows).encode(),
            stdout=subprocess.PIPE,
            check=True,
        )
        expect = sorted(
            (json.loads(l)["k"], json.loads(l)["s"])
            for l in out.stdout.decode().splitlines()
            if l.strip()
        )
        assert got == expect
