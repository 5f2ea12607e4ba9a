"""Delta v2-spec checkpoints (sources/delta.py): uuid-named
checkpoint files with checkpointMetadata + sidecar actions, file
actions living in _delta_log/_sidecars/ parquet, json checkpoint
bodies, and the v2Checkpoint reader feature accepted."""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil

import pytest

from optimus_any2any_spark.sources.delta import read_delta, replay_log


def _commit(log, version, actions):
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, "%020d.json" % version), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _schema_string():
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "string", "nullable": True,
                 "metadata": {}},
            ],
        }
    )


def _write_file(spark, t, rel, rows):
    df = spark.createDataFrame(rows, "k long, v string")
    tmp = os.path.join(t, "_tmp_" + rel)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.replace(
        _glob.glob(os.path.join(tmp, "part-*.parquet"))[0],
        os.path.join(t, rel),
    )
    shutil.rmtree(tmp)


def _json_rows_to_parquet(spark, rows, out_path):
    """One inferred schema over all rows (the multi-part checkpoint
    lesson), one parquet file."""
    lines = [json.dumps(r) for r in rows]
    schema = spark.read.json(
        spark.sparkContext.parallelize(lines, 1)
    ).schema
    df = spark.read.schema(schema).json(
        spark.sparkContext.parallelize(lines, 1)
    )
    tmp = out_path + ".d"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.replace(
        _glob.glob(os.path.join(tmp, "part-*.parquet"))[0], out_path
    )
    shutil.rmtree(tmp)


def _build_v2_table(spark, t, checkpoint_body="parquet"):
    """Two data files committed at v0/v1, then a v2-spec checkpoint at
    version 1 (sidecar holds the adds) and a fresh commit v2."""
    os.makedirs(t, exist_ok=True)
    log = os.path.join(t, "_delta_log")
    _write_file(spark, t, "f0.parquet", [(1, "a")])
    _write_file(spark, t, "f1.parquet", [(2, "b")])
    _write_file(spark, t, "f2.parquet", [(3, "c")])
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    meta = {
        "id": "v2cp-test",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(),
        "partitionColumns": [],
        "configuration": {},
    }

    def _add(rel):
        return {
            "path": rel,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(t, rel)),
            "modificationTime": 0,
            "dataChange": True,
        }

    _commit(log, 0, [{"protocol": proto}, {"metaData": meta},
                     {"add": _add("f0.parquet")}])
    _commit(log, 1, [{"add": _add("f1.parquet")}])
    # sidecar with the two live adds
    os.makedirs(os.path.join(log, "_sidecars"), exist_ok=True)
    sidecar_name = "aaaa-bbbb-0001.parquet"
    _json_rows_to_parquet(
        spark,
        [{"add": _add("f0.parquet")}, {"add": _add("f1.parquet")}],
        os.path.join(log, "_sidecars", sidecar_name),
    )
    cp_rows = [
        {"checkpointMetadata": {"version": 1}},
        {"protocol": proto},
        {"metaData": meta},
        {"sidecar": {"path": sidecar_name, "sizeInBytes": 1}},
    ]
    if checkpoint_body == "parquet":
        cp_name = "%020d.checkpoint.deadbeefcafe.parquet" % 1
        _json_rows_to_parquet(
            spark, cp_rows, os.path.join(log, cp_name)
        )
    else:
        cp_name = "%020d.checkpoint.deadbeefcafe.json" % 1
        with open(os.path.join(log, cp_name), "w") as f:
            for r in cp_rows:
                f.write(json.dumps(r) + "\n")
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": 1, "size": len(cp_rows)}))
    # remove the pre-checkpoint commits to PROVE replay uses the
    # checkpoint (real retention cleanup does exactly this)
    os.remove(os.path.join(log, "%020d.json" % 0))
    os.remove(os.path.join(log, "%020d.json" % 1))
    _commit(log, 2, [{"add": _add("f2.parquet")}])


class TestV2Checkpoint:
    @pytest.mark.parametrize("body", ["parquet", "json"])
    def test_replay_through_sidecars(self, spark, tmp_path, body):
        t = str(tmp_path / "tbl")
        _build_v2_table(spark, t, checkpoint_body=body)
        got = sorted((r.k, r.v) for r in read_delta(spark, t).collect())
        assert got == [(1, "a"), (2, "b"), (3, "c")]
        state = replay_log(spark, t)
        assert state["version"] == 2
        assert set(state["live"]) == {
            "f0.parquet", "f1.parquet", "f2.parquet",
        }

    def test_checkpoint_version_mismatch_raises(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        _build_v2_table(spark, t)
        log = os.path.join(t, "_delta_log")
        cp = _glob.glob(os.path.join(log, "*.checkpoint.*.parquet"))[0]
        # rewrite the checkpoint claiming a different version
        rows = [
            {"checkpointMetadata": {"version": 7}},
        ]
        os.remove(cp)
        _json_rows_to_parquet(spark, rows, cp)
        with pytest.raises(ValueError, match="names version"):
            read_delta(spark, t)

    def test_missing_checkpoint_file_raises(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        _build_v2_table(spark, t)
        log = os.path.join(t, "_delta_log")
        for cp in _glob.glob(os.path.join(log, "*.checkpoint.*")):
            os.remove(cp)
        with pytest.raises(ValueError, match="no checkpoint file"):
            read_delta(spark, t)


class TestV2CheckpointWriter:
    """write_checkpoint_v2: uuid-named body + checkpointMetadata +
    sidecar split, round-tripped through this repo's own reader."""

    def _kv(self, spark, rows):
        return spark.createDataFrame(rows, "k long, v string, ts long")

    def test_round_trip_with_sidecars(self, spark, tmp_path):
        from optimus_any2any_spark.streaming.delta_table import (
            merge_delta_batch,
            write_checkpoint_v2,
        )

        t = str(tmp_path / "tbl")
        merge_delta_batch(
            spark,
            self._kv(spark, [(k, f"v{k}", 0) for k in range(1, 9)]),
            t, "k", "ts", target_rows_per_file=2,
        )
        cp = write_checkpoint_v2(spark, t, sidecar_threshold=2)
        log = os.path.join(t, "_delta_log")
        assert os.path.exists(os.path.join(log, cp))
        # sidecars hold the adds; the top file has the marker
        assert len(os.listdir(os.path.join(log, "_sidecars"))) >= 2
        # the protocol now declares the feature
        state = replay_log(spark, t)
        assert "v2Checkpoint" in (
            state["protocol"].get("readerFeatures") or []
        )
        # replay THROUGH the checkpoint: delete the pre-checkpoint
        # json commits and read
        cp_version = int(cp[:20])
        for f in list(os.listdir(log)):
            if f.endswith(".json") and f[:20].isdigit() and (
                int(f[:20]) <= cp_version
            ):
                os.remove(os.path.join(log, f))
        got = sorted((r.k, r.v) for r in read_delta(spark, t).collect())
        assert got == [(k, f"v{k}") for k in range(1, 9)]

    def test_small_table_inlines_adds(self, spark, tmp_path):
        from optimus_any2any_spark.streaming.delta_table import (
            merge_delta_batch,
            write_checkpoint_v2,
        )

        t = str(tmp_path / "tbl")
        merge_delta_batch(
            spark, self._kv(spark, [(1, "a", 0)]), t, "k", "ts"
        )
        write_checkpoint_v2(spark, t)
        log = os.path.join(t, "_delta_log")
        assert not os.path.isdir(os.path.join(log, "_sidecars"))
        assert sorted(
            (r.k, r.v) for r in read_delta(spark, t).collect()
        ) == [(1, "a")]

    def test_later_commits_replay_on_top(self, spark, tmp_path):
        from optimus_any2any_spark.streaming.delta_table import (
            merge_delta_batch,
            write_checkpoint_v2,
        )

        t = str(tmp_path / "tbl")
        merge_delta_batch(
            spark, self._kv(spark, [(1, "a", 0)]), t, "k", "ts"
        )
        write_checkpoint_v2(spark, t)
        merge_delta_batch(
            spark, self._kv(spark, [(1, "A", 1), (2, "b", 1)]),
            t, "k", "ts",
        )
        assert sorted(
            (r.k, r.v) for r in read_delta(spark, t).collect()
        ) == [(1, "A"), (2, "b")]
