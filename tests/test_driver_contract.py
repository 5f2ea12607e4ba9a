"""Driver-contract simulation: the grading driver imports
``__spark_entry__`` with its OWN plain SparkSession (none of the
engine's session confs) from an arbitrary cwd. This catches two failure
classes pytest's shared fixture masks:

- conf assumptions (timezone, parquet type inference — e.g. a
  TIMESTAMP_NTZ column reaching an expression that only accepts
  TIMESTAMP under default inference);
- Python-UDF closures that import the package on workers, which is not
  on the worker PYTHONPATH when the session starts outside /root/repo.

Run as a subprocess so the bare session cannot inherit the test
session via getOrCreate.
"""

from __future__ import annotations

import subprocess
import sys

from tests.conftest import REPO

# one query per risk class: timestamp arithmetic, window+union as-of,
# mapInPandas UDF closure, jq-binary escape hatch, persisted-index ANN
_PROBES = [
    "asof_click_attribution",
    "q_events_sessions",
    "multimodal_features",
    "ann_ivf_topk",
    "dedup_minhash_lsh",
]

_SIM = f"""
import sys
sys.path.insert(0, {str(REPO)!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]").appName("driver-sim")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
assert len(e.entry(spark).collect()) >= 0
qs, osql = e.queries(), e.oracle_sql()
assert set(osql) <= set(qs)
for name in {_PROBES!r}:
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n >= 0, name
print("DRIVER-SIM-OK")
"""


def test_entry_contract_with_bare_session(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", _SIM],
        cwd=tmp_path,  # NOT the repo: worker PYTHONPATH must not rely on cwd
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRIVER-SIM-OK" in proc.stdout


def test_report_window_orders_unverified_first():
    """Names lacking a fully-green row in past CORRECTNESS reports must
    precede all previously verified names, so the driver's bounded
    report window rotates coverage across rounds."""
    import json

    from optimus_any2any_spark.queries import all_queries

    reports = list(REPO.glob("CORRECTNESS_r*.json"))
    if not reports:
        return  # round 1: nothing to rotate
    verified = set()
    for p in reports:
        for name, row in json.loads(p.read_text()).items():
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                verified.add(name)
    ks = list(all_queries())
    flags = [n in verified for n in ks]
    # once the verified tail starts, it never flips back to fresh
    assert flags == sorted(flags), "verified query precedes a fresh one"


def test_rotation_orders_by_verification_age():
    """VERDICT r2 item 2: within the verified set, the registry must
    lead with the STALEST verifications (oldest report round) so the
    driver's ~50-entry window re-checks queries whose implementations
    may have churned since they were last verified — not the same
    leading block every round."""
    from optimus_any2any_spark.queries import (
        _driver_verified_rounds,
        _rotation_order,
        all_queries,
    )

    # pure-function pin: never-verified first (reg order), then by
    # ascending last-verified round, stable within each group
    assert _rotation_order(
        ["a", "b", "c", "d"], {"b": 2, "c": 1}
    ) == ["a", "d", "c", "b"]

    # the live registry must be emitted in exactly that order
    latest = _driver_verified_rounds()
    ks = list(all_queries())
    ages = [latest.get(n, 0) for n in ks]
    assert ages == sorted(ages), "registry not ordered by verification age"


def test_rotation_never_strands_a_row():
    """VERDICT r12 item 8: with the driver verifying the first W rows
    per round, oldest-first rotation must re-verify EVERY row within
    ceil(N/W) rounds — no row may be stranded by a future reorder.
    Simulated against the real _rotation_order with the live registry
    size and the driver's observed window (50)."""
    import math

    from optimus_any2any_spark.queries import _rotation_order, all_queries

    names = list(all_queries())
    window = 50
    budget = math.ceil(len(names) / window)
    latest: dict[str, int] = {}  # start: nothing ever verified
    last_round: dict[str, int] = {}
    for rnd in range(1, budget + 2 * budget + 1):
        order = _rotation_order(names, latest)
        for n in order[:window]:
            latest[n] = rnd
            last_round[n] = rnd
    # after the warm-up cycle, every row was verified at least once
    assert set(last_round) == set(names)
    # and in steady state no row's last check is older than the cycle
    final = max(last_round.values())
    stalest = min(last_round.values())
    assert final - stalest < budget, (
        f"row stranded {final - stalest} rounds with cycle budget {budget}"
    )
