#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _rfc008_bench(spark) -> float:
    """1M-record (~50 MB) NDJSON file→file via the full pipeline
    (source metadata + sink commit), the reference's rfc_008 workload."""
    import random

    path = "/tmp/spark_graft_rfc008_in.json"
    if not os.path.exists(path):
        random.seed(42)
        with open(path, "w") as f:
            for i in range(1_000_000):
                f.write(
                    '{"id": %d, "name": "user_%d", "value": %d}\n'
                    % (i, i % 1000, i * 7 % 10000)
                )
    from optimus_any2any_spark.config import Config
    from optimus_any2any_spark.pipeline import Pipeline

    # codegen/JIT warmup on a 10k-record file (same pipeline shape), so
    # the measurement is the workload, not first-run class compilation —
    # mirroring the sf0.001 query warmup above
    warm_path = "/tmp/spark_graft_rfc008_warm.json"
    if not os.path.exists(warm_path):
        with open(warm_path, "w") as f:
            for i in range(10_000):
                f.write(
                    '{"id": %d, "name": "user_%d", "value": %d}\n'
                    % (i, i % 1000, i * 7 % 10000)
                )
    warm_cfg = Config.from_env(
        env_args=[
            f"FILE__SOURCE_URI=file://{warm_path}",
            "FILE__DESTINATION_URI=file:///tmp/spark_graft_rfc008_warm_out.json",
        ],
        environ={},
    )
    Pipeline(spark, "FILE", ["FILE"], warm_cfg).run()

    cfg = Config.from_env(
        env_args=[
            f"FILE__SOURCE_URI=file://{path}",
            "FILE__DESTINATION_URI=file:///tmp/spark_graft_rfc008_out.json",
        ],
        environ={},
    )
    t0 = time.perf_counter()
    Pipeline(spark, "FILE", ["FILE"], cfg).run()
    return time.perf_counter() - t0


_SF1_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_jaccard_skewed",
    "dedup_ngram_jaccard",
    "dedup_span_exact",
    # vocab-scale after the first pass: should scale with DISTINCT
    # words (sub-linear in corpus size), the trainer's whole point
    "tokenizer_bpe_merges",
    # bucket-scale epochs after one feature pass: measured 1.6x at
    # 10x data — a super-linear result here would mean the corpus
    # leaked into an epoch
    "classifier_perceptron_train",
    # round-5 single-job partitioned merges: constant partition count,
    # 10x rows per partition — merge IO is the update footprint, so
    # the spot should scale with the data, never with a per-partition
    # driver loop (that loop is what round 5 removed)
    "delta_partitioned_merge",
    "iceberg_partitioned_merge",
    # round-7 lifecycle rows: constant partition/day count, 10x rows —
    # the delete+merge sequences must scale with the update footprint
    # (anti-join sides and rewrite bytes), never with history length
    "iceberg_days_partitioned_merge",
    "delta_dv_then_merge",
    "iceberg_delete_then_merge",
    # round-8 positional-delete erasure: bounds-pruned read + key
    # semi-join + O(deleted positions) delete file — the spot must
    # scale with the erased footprint, never with table history
    "iceberg_pos_delete_erasure",
    # round-10 rows: predicate DML (one scan + O(matched) delete
    # files), changelog (manifest-diff-pruned per snapshot), ZORDER
    # (one quantile sample + one range write), row lineage (one
    # broadcast over the position read) — all must scale with data,
    # never with history or file count
    "iceberg_update_where",
    "iceberg_changelog_read",
    "delta_zorder_read",
    "iceberg_zorder_read",
    "iceberg_row_lineage",
    # dedup_semantic_trained and ann_ivf_topk are deliberately absent:
    # both are quadratic at FIXED partition granularity (k=8 clusters /
    # 64 IVF cells, pinned by their oracles), and their scale story is
    # "grow k / n_cells with the corpus" (FAISS trains ~sqrt(n) cells).
    # A 10x run at constant granularity would measure the documented
    # anti-pattern, not the operator — confirmed empirically: ivf ran
    # 16x at 10x data while every posting-list dedup stayed at 2.5-4x.
]


def _sf1_dir(spark, sf_dir: str) -> str:
    """Materialize a 10× scale-up of sf_dir's documents/embeddings under
    /tmp (generated once, reused) at CONSTANT near-dup density: the
    original, one genuine near-dup (5% token mutation, J≈0.8+), and
    eight fully-distinct variants per source doc — so true pair output
    grows linearly and the run measures operator scaling, not a
    workload explosion. One decade of local scale validates the
    capped-posting/aggregate-skew arguments empirically (VERDICT r3
    item 8)."""
    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/spark_graft_10x_{base}"
    # orders joined the replica set in round 7 — rebuild older dirs
    if os.path.exists(f"{out}/_DONE") and os.path.exists(
        f"{out}/orders.parquet"
    ):
        return out
    reps = spark.range(10).select(F.col("id").alias("rep"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").crossJoin(reps)
    # Scaling must hold near-dup DENSITY constant, not inflate it: an
    # earlier builder appended one suffix token per replica, leaving
    # all 45 replica pairs per doc at Jaccard ~0.99 — true pair output
    # grew ~100x and ngram_jaccard measured 47x at 10x data (the
    # workload exploded, not the operator). Now: rep 0 = the original;
    # rep 1 mutates every 20th token (J≈0.8+, ONE catchable near-dup
    # per doc — output grows linearly); reps 2-9 mutate every OTHER
    # token with replica-unique values, which puts a mutated position
    # inside every 2-gram shingle — those replicas share no shingles
    # with anything. Token count scales exactly 10x.
    toks = F.split(F.trim(F.col("text")), r"\s+")
    stride = F.when(F.col("rep") == 1, F.lit(20)).otherwise(F.lit(2))
    text = F.array_join(
        F.transform(
            toks,
            lambda x, i: F.when(
                (F.col("rep") != 0) & (i % stride == F.col("rep") % stride),
                F.format_string("u%sq%sx%s", F.col("rep"), F.col("doc_id"), i),
            ).otherwise(x),
        ),
        " ",
    )
    docs.select(
        (F.col("doc_id") + F.col("rep") * F.lit(1_000_000_000)).alias(
            "doc_id"
        ),
        text.alias("text"),
        "lang",
        "source",
        F.length(text).cast("long").alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").crossJoin(reps)
    emb.select(
        (F.col("vec_id") + F.col("rep") * F.lit(1_000_000_000)).alias(
            "vec_id"
        ),
        F.transform(
            "embedding",
            lambda x: (x + F.col("rep").cast("float") * F.lit(0.001)).cast(
                "float"
            ),
        ).alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    # events 10x for the lakehouse-merge spots: replicas shift keys by
    # 1e9, event_type cardinality (= partition count) stays constant —
    # rows per partition grow 10x, exactly the backfill shape the
    # single-job partitioned merge exists for
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").crossJoin(reps)
    ev.select(
        (F.col("event_id") + F.col("rep") * F.lit(1_000_000_000)).alias(
            "event_id"
        ),
        *[c for c in ev.columns if c not in ("event_id", "rep")],
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    # orders 10x for the delete+merge lifecycle spots: keys shift by
    # 1e9 so the k%N cohort proportions (the update footprint) scale
    # exactly with the data
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").crossJoin(reps)
    od.select(
        (F.col("o_orderkey") + F.col("rep") * F.lit(1_000_000_000)).alias(
            "o_orderkey"
        ),
        *[c for c in od.columns if c not in ("o_orderkey", "rep")],
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    open(f"{out}/_DONE", "w").close()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from optimus_any2any_spark.queries import all_queries
    from optimus_any2any_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    try:
        queries = {n: q for n, q in all_queries().items() if q.bench}
        # JVM/codegen warmup on the smallest SF so measured times are query
        # execution, not session spin-up.
        warm = "/root/testdata/sf0.001"
        for q in queries.values():
            try:
                q.spark(spark, warm).count()
            except Exception:
                pass

        # best-of-N per query: single runs at second-scale are dominated
        # by scheduler/GC jitter on a shared host; the minimum is the
        # standard low-variance estimator for a deterministic workload
        reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
        times: dict[str, float] = {}
        for name, q in sorted(queries.items()):
            samples = []
            for _ in range(reps):
                # drop persisted lineages from prior queries (dedup ops
                # cache shingle/candidate tables); accumulated caches add
                # memory/GC pressure without speeding later runs up
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                df = q.spark(spark, sf_dir)
                n = df.count()
                samples.append(time.perf_counter() - t0)
            times[name] = round(min(samples), 4)
            print(
                f"# {name}: {times[name]:.3f}s ({n} rows, n={reps})",
                file=sys.stderr,
            )

        # RFC-008 parity workload: the reference's only published E2E
        # number is 1M NDJSON records file→file in 7.3 s (BASELINE.md).
        times["rfc008_file_to_file_1m"] = round(_rfc008_bench(spark), 4)
        print(
            f"# rfc008_file_to_file_1m: {times['rfc008_file_to_file_1m']:.3f}s "
            f"(reference: 7.319s)",
            file=sys.stderr,
        )

        total = round(sum(times.values()), 4)
        try:
            sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
        except ValueError:
            sf = None
        # oracle-only exact baselines (scale_note set) are excluded
        # from the headline set by construction; surface any that are
        # registered so the bench output distinguishes scale-path
        # operators from deliberate O(n²) verifiers
        oracle_only = {
            n: q.scale_note
            for n, q in all_queries().items()
            if q.scale_note
        }
        for n, note in oracle_only.items():
            print(f"# oracle-only (not benched): {n} — {note}", file=sys.stderr)

        # 10× spot-run of the dedup/ANN heavyweights: a decade of scale
        # validates the skew arguments empirically (set
        # SPARK_GRAFT_SF1_SPOT=0 to skip)
        sf1_times: dict[str, float] = {}
        if os.environ.get("SPARK_GRAFT_SF1_SPOT", "1") != "0":
            try:
                d10 = _sf1_dir(spark, sf_dir)
                all_q = all_queries()
                # best-of-2: single 10-30s runs carry enough GC jitter
                # to distort the scaling multiplier the spot-run exists
                # to report
                spot_reps = int(os.environ.get("SPARK_GRAFT_SF1_REPS", "2"))
                for name in _SF1_QUERIES:
                    samples = []
                    for _ in range(spot_reps):
                        spark.catalog.clearCache()
                        t0 = time.perf_counter()
                        all_q[name].spark(spark, d10).count()
                        samples.append(time.perf_counter() - t0)
                    sf1_times[name] = round(min(samples), 4)
                    ratio = (
                        sf1_times[name] / times[name]
                        if times.get(name)
                        else float("nan")
                    )
                    print(
                        f"# 10x-spot {name}: {sf1_times[name]:.3f}s "
                        f"({ratio:.1f}x the {sf} time at 10x data)",
                        file=sys.stderr,
                    )
            except Exception as e:  # spot-run must never sink the bench
                print(f"# 10x spot-run skipped: {e}", file=sys.stderr)

        # side-channel detail goes to stderr — the driver tail-captures
        # stdout with a bounded window, and the r10 headline line was
        # front-truncated (parsed: null) when oracle_only + sf1_spot
        # rode on it; keep the stdout line to the contract fields only,
        # compact separators, 2-decimal times
        print(
            "# detail "
            + json.dumps(
                {
                    "oracle_only": sorted(oracle_only),
                    "sf1_spot": {
                        "sf": (sf * 10) if sf else None,
                        "queries": sf1_times,
                    },
                }
            ),
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_sec",
                    "value": round(total, 2),
                    "unit": "sec",
                    "queries": {n: round(t, 2) for n, t in times.items()},
                    "sf": sf,
                },
                separators=(",", ":"),
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
