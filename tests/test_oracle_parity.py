"""Local replica of the driver's t2 correctness gate.

Runs registered queries on Spark and their DuckDB oracles at sf0.01,
sorts columns by name and rows by value (the driver's order-insensitive
value-hash), and requires exact equality.

Default scope (VERDICT r13 item 2 — the full 197-query sweep made the
suite overrun the grading driver's verify window): every benched query
PLUS the leading 70 of the registry's rotation order, which is
unverified-first then stalest-verified-first — exactly the window the
driver itself samples — so coverage rotates across rounds the same way
the driver's does. ``SPARK_GRAFT_ORACLE_FULL=1`` runs all queries (the
pre-round full gate; CI budget permitting, always prefer it before
shipping operator changes). The cheap DESCRIBE sweep still covers every
oracle unconditionally.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from optimus_any2any_spark.queries import all_queries
from tests.conftest import SF_DIR


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # unify datetime resolutions (spark: us, duckdb 1.0 may give us/ns)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def assert_frames_match(sdf: pd.DataFrame, odf: pd.DataFrame, name: str):
    s, o = normalize(sdf), normalize(odf)
    assert list(s.columns) == list(o.columns), (
        f"{name}: column mismatch spark={list(s.columns)} oracle={list(o.columns)}"
    )
    assert len(s) == len(o), f"{name}: row count spark={len(s)} oracle={len(o)}"
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        # The driver hashes TEXTUAL reprs, so an integer column on one side
        # and a floating column on the other (e.g. DuckDB HUGEINT -> float64
        # via duckdb.df()) hash-mismatches even when values are equal:
        # 310 != 310.0. Fail dtype-strictly BEFORE any float coercion.
        s_int = np.issubdtype(sv.dtype, np.integer)
        o_int = np.issubdtype(ov.dtype, np.integer)
        s_flt = np.issubdtype(sv.dtype, np.floating)
        o_flt = np.issubdtype(ov.dtype, np.floating)
        if (s_int and o_flt) or (s_flt and o_int):
            raise AssertionError(
                f"{name}: col {c} dtype split spark={sv.dtype} oracle={ov.dtype} "
                f"— the driver's textual hash treats 310 != 310.0; "
                f"CAST the oracle (or the Spark column) so both sides agree"
            )
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            sv = sv.astype("float64")
            ov = ov.astype("float64")
            both_nan = np.isnan(sv) & np.isnan(ov)
            # the driver hashes the textual repr, where -0.0 != 0.0 —
            # require matching signs on zero-valued floats too
            same_sign = np.copysign(1.0, sv) == np.copysign(1.0, ov)
            eq = ((sv == ov) & (same_sign | (sv != 0.0))) | both_nan
            if not eq.all():
                i = int(np.argmax(~eq))
                raise AssertionError(
                    f"{name}: col {c} differs at row {i}: "
                    f"spark={sv[i]!r} oracle={ov[i]!r} "
                    f"(maxabs={np.nanmax(np.abs(sv - ov))})"
                )
        else:
            eq = pd.Series(sv).eq(pd.Series(ov)) | (
                pd.Series(sv).isna() & pd.Series(ov).isna()
            )
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                raise AssertionError(
                    f"{name}: col {c} differs at row {i}: "
                    f"spark={sv[i]!r} oracle={ov[i]!r}"
                )


def test_harness_catches_negative_zero():
    """-0.0 vs +0.0 hash-differ on the driver; the local gate must too."""
    a = pd.DataFrame({"x": [0.0, 1.5]})
    b = pd.DataFrame({"x": [-0.0, 1.5]})
    with pytest.raises(AssertionError, match="col x differs"):
        assert_frames_match(a, b, "negzero")
    assert_frames_match(a, a.copy(), "poszero")


QUERIES = all_queries()

if os.environ.get("SPARK_GRAFT_ORACLE_FULL") == "1":
    EXEC_NAMES = sorted(QUERIES)
else:
    # benched rows + the driver-shaped rotation window (registry order
    # is unverified-first, stalest-verified-first — pinned by
    # test_driver_contract.py::test_rotation_orders_by_verification_age)
    _core = {n for n, q in QUERIES.items() if q.bench}
    _core.update(list(QUERIES)[:70])
    EXEC_NAMES = sorted(_core)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_no_hugeint_columns(name, duck):
    """DESCRIBE-sweep every registered oracle for HUGEINT output columns.

    DuckDB types SUM(<integer>) as HUGEINT, which duckdb.df() materializes
    as float64 — so the driver's textual hash compares 310.0 against
    Spark's 310 (bigint) and fails even though values match (the round-10
    red-row class). Planning is enough to catch it: DESCRIBE never
    executes, so the sweep is cheap and runs on every oracle.
    """
    q = QUERIES[name]
    if q.oracle is None:
        pytest.skip("rows-only query, no oracle SQL")
    desc = duck.execute(f"DESCRIBE {q.oracle}").fetchall()
    bad = [(col, typ) for col, typ, *_ in desc if "HUGEINT" in typ.upper()]
    assert not bad, (
        f"{name}: oracle emits HUGEINT column(s) {bad} — duckdb.df() turns "
        f"these into float64 and the driver hash fails vs Spark bigint; "
        f"wrap in CAST(... AS BIGINT)"
    )


@pytest.mark.parametrize("name", EXEC_NAMES)
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    sdf = q.spark(spark, SF_DIR).toPandas()
    assert len(sdf) >= 0  # materialized
    if q.oracle is None:
        assert len(sdf) > 0, f"{name}: rows-only check got empty result"
        return
    odf = duck.execute(q.oracle).df()
    assert_frames_match(sdf, odf, name)
