"""Delta TIMESTAMP AS OF (sources/delta.py resolve_delta_timestamp):
latest-commit-at-or-before resolution from commit-file times
(monotonic-adjusted) or in-commit timestamps when declared; wired into
read_delta / read_delta_cdf / restore_delta / DELTA__TIMESTAMP_AS_OF.
VERDICT r7 item 7."""

from __future__ import annotations

import json
import os

import pytest

from optimus_any2any_spark.sources.delta import (
    commit_timestamps,
    read_delta,
    read_delta_cdf,
    resolve_delta_timestamp,
)
from optimus_any2any_spark.streaming.delta_table import (
    merge_delta_batch,
    restore_delta,
)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts long")


def _mk_table(spark, t, n_commits=3):
    """n_commits merges; commit file v gets mtime (v+1)*1000 seconds."""
    for v in range(n_commits):
        merge_delta_batch(
            spark, _kv(spark, [(v, f"v{v}", 0)]), t, "k", "ts"
        )
    log = os.path.join(t, "_delta_log")
    for v in range(n_commits):
        p = os.path.join(log, "%020d.json" % v)
        os.utime(p, ((v + 1) * 1000, (v + 1) * 1000))


class TestResolution:
    def test_latest_at_or_before(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        _mk_table(spark, t)
        # commits at epoch-ms 1_000_000 / 2_000_000 / 3_000_000
        assert resolve_delta_timestamp(t, 2_500_000) == 1
        assert resolve_delta_timestamp(t, 2_000_000) == 1  # boundary:
        # a commit exactly AT the timestamp is included (<= rule)
        assert resolve_delta_timestamp(t, 1_999_999) == 0
        assert resolve_delta_timestamp(t, 9_999_999) == 2

    def test_before_first_commit_raises(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        _mk_table(spark, t)
        with pytest.raises(ValueError, match="before the first"):
            resolve_delta_timestamp(t, 999_999)

    def test_after_rule_for_cdf_start(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        _mk_table(spark, t)
        assert resolve_delta_timestamp(t, 1_500_000, after=True) == 1
        assert resolve_delta_timestamp(t, 2_000_000, after=True) == 1
        with pytest.raises(ValueError, match="at or after"):
            resolve_delta_timestamp(t, 9_999_999, after=True)

    def test_iso_string_and_datetime(self, spark, tmp_path):
        import datetime as dt

        t = str(tmp_path / "tbl")
        _mk_table(spark, t)
        # 2_500s epoch = 1970-01-01T00:41:40Z
        assert resolve_delta_timestamp(t, "1970-01-01T00:41:40") == 1
        assert (
            resolve_delta_timestamp(
                t,
                dt.datetime(1970, 1, 1, 0, 41, 40,
                            tzinfo=dt.timezone.utc),
            )
            == 1
        )

    def test_mtime_monotonic_adjustment(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        _mk_table(spark, t)
        log = os.path.join(t, "_delta_log")
        # regress v1's mtime BEHIND v0's: its effective timestamp must
        # read as v0's + 1ms, never reordering history
        os.utime(os.path.join(log, "%020d.json" % 1), (500, 500))
        stamps = dict(commit_timestamps(t))
        assert stamps[1] == stamps[0] + 1
        assert stamps[2] > stamps[1]

    def test_in_commit_timestamps_authoritative(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        _mk_table(spark, t, n_commits=2)
        log = os.path.join(t, "_delta_log")
        # declare ICT in a new metaData commit + stamp commitInfo
        with open(os.path.join(log, "%020d.json" % 0)) as fh:
            meta = next(
                json.loads(line)["metaData"]
                for line in fh
                if '"metaData"' in line
            )
        meta = dict(meta)
        meta["configuration"] = {
            "delta.enableInCommitTimestamps": "true"
        }
        p2 = os.path.join(log, "%020d.json" % 2)
        with open(p2, "w") as fh:
            fh.write(
                json.dumps(
                    {"commitInfo": {"inCommitTimestamp": 7_000_000}}
                )
                + "\n"
            )
            fh.write(json.dumps({"metaData": meta}) + "\n")
        os.utime(p2, (3000, 3000))  # mtime says 3_000_000 — ignored
        stamps = dict(commit_timestamps(t))
        assert stamps[2] == 7_000_000
        assert resolve_delta_timestamp(t, 6_999_999) == 1
        assert resolve_delta_timestamp(t, 7_000_000) == 2

    def test_strict_raises_past_end_of_history(self, spark, tmp_path):
        # ADVICE r8: plain TIMESTAMP AS OF reads must raise past the
        # last commit (delta-spark: "provided timestamp is after the
        # latest version"); RESTORE / CDF ending keep the clamp
        t = str(tmp_path / "tbl")
        _mk_table(spark, t)
        with pytest.raises(ValueError, match="after the latest"):
            resolve_delta_timestamp(t, 9_999_999, strict=True)
        # non-strict (restore / cdf-ending rule) still clamps
        assert resolve_delta_timestamp(t, 9_999_999) == 2
        # boundary: exactly the last commit's timestamp is readable
        assert resolve_delta_timestamp(t, 3_000_000, strict=True) == 2

    def test_ict_not_floored_by_late_premature_mtime(
        self, spark, tmp_path
    ):
        # ADVICE r8: a pre-enablement commit with a LATE mtime (copied
        # log files) must not push authoritative in-commit timestamps
        # forward through the monotonic max
        t = str(tmp_path / "tbl")
        _mk_table(spark, t, n_commits=2)
        log = os.path.join(t, "_delta_log")
        with open(os.path.join(log, "%020d.json" % 0)) as fh:
            meta = next(
                json.loads(line)["metaData"]
                for line in fh
                if '"metaData"' in line
            )
        meta = dict(meta)
        meta["configuration"] = {
            "delta.enableInCommitTimestamps": "true"
        }
        p2 = os.path.join(log, "%020d.json" % 2)
        with open(p2, "w") as fh:
            fh.write(
                json.dumps(
                    {"commitInfo": {"inCommitTimestamp": 7_000_000}}
                )
                + "\n"
            )
            fh.write(json.dumps({"metaData": meta}) + "\n")
        # v1's FILE claims epoch-ms 9_000_000 — later than v2's
        # authoritative ICT; the ICT must win verbatim
        os.utime(os.path.join(log, "%020d.json" % 1), (9000, 9000))
        stamps = dict(commit_timestamps(t))
        assert stamps[1] == 9_000_000  # mtime-derived, as filed
        assert stamps[2] == 7_000_000  # authoritative, NOT floored


class TestWiredSurfaces:
    def test_read_delta_timestamp(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        _mk_table(spark, t)
        got = sorted(
            r.k for r in read_delta(spark, t, timestamp=2_500_000)
            .collect()
        )
        assert got == [0, 1]  # as of v1
        with pytest.raises(ValueError, match="mutually exclusive"):
            read_delta(spark, t, version=1, timestamp=2_500_000)

    def test_cdf_timestamp_window(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        _mk_table(spark, t)
        ch = read_delta_cdf(
            spark, t,
            from_timestamp=2_000_000, to_timestamp=3_000_000,
        )
        got = sorted((r.k, r._commit_version) for r in ch.collect())
        assert got == [(1, 1), (2, 2)]  # v1 included by the >= rule

    def test_restore_timestamp(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        _mk_table(spark, t)
        restore_delta(spark, t, timestamp=1_500_000)  # → version 0
        got = sorted(r.k for r in read_delta(spark, t).collect())
        assert got == [0]

    def test_cli_timestamp_as_of(self, spark, tmp_path):
        from optimus_any2any_spark.config import Config
        from optimus_any2any_spark.pipeline import (
            SOURCE_BUILDERS,
            _load_builtin_components,
        )

        _load_builtin_components()
        t = str(tmp_path / "tbl")
        _mk_table(spark, t)
        cfg = Config.from_env(
            env_args=[
                f"DELTA__SOURCE_URI=file://{t}",
                "DELTA__TIMESTAMP_AS_OF=2500000",
            ],
            environ={},
        )
        df = SOURCE_BUILDERS["DELTA"](spark, cfg)
        assert sorted(r.k for r in df.collect()) == [0, 1]
