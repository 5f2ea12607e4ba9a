"""Sequence-packing operator: boundary semantics and distribution."""

from optimus_any2any_spark.operators.packing import (
    pack_concat_chunks,
    with_global_cumsum,
)


def test_pack_exact_boundaries(spark):
    # window=10; docs of 4, 6, 3, 10, 1 tokens laid end-to-end:
    #   d1: [0,4)   chunk 0, offset 0, no straddle
    #   d2: [4,10)  chunk 0, offset 4, ends exactly at boundary — no straddle
    #   d3: [10,13) chunk 1, offset 0, no straddle
    #   d4: [13,23) chunk 1, offset 3, straddles into chunk 2
    #   d5: [23,24) chunk 2, offset 3, no straddle
    df = spark.createDataFrame(
        [(1, 4), (2, 6), (3, 3), (4, 10), (5, 1)], ["doc_id", "n"]
    )
    rows = {
        r["doc_id"]: r
        for r in pack_concat_chunks(df, "n", window_tokens=10).collect()
    }
    assert (rows[1]["chunk_id"], rows[1]["offset_in_chunk"]) == (0, 0)
    assert (rows[2]["chunk_id"], rows[2]["offset_in_chunk"]) == (0, 4)
    assert not rows[2]["spans_boundary"]  # ends flush with the boundary
    assert (rows[3]["chunk_id"], rows[3]["offset_in_chunk"]) == (1, 0)
    assert (rows[4]["chunk_id"], rows[4]["offset_in_chunk"]) == (1, 3)
    assert rows[4]["spans_boundary"]
    assert (rows[5]["chunk_id"], rows[5]["offset_in_chunk"]) == (2, 3)
    assert not rows[5]["spans_boundary"]
    assert [rows[i]["global_offset"] for i in (1, 2, 3, 4, 5)] == [
        0,
        4,
        10,
        13,
        23,
    ]


def test_pack_zero_token_doc_never_straddles(spark):
    df = spark.createDataFrame([(1, 10), (2, 0), (3, 5)], ["doc_id", "n"])
    rows = {
        r["doc_id"]: r
        for r in pack_concat_chunks(df, "n", window_tokens=10).collect()
    }
    # doc 2 sits exactly on the boundary with zero length: chunk 1, no flag
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["chunk_id"] == 1
    assert not rows[2]["spans_boundary"]


def test_cumsum_matches_single_partition_window(spark):
    # the two-phase prefix sum must equal the naive global window result
    # regardless of input partitioning
    data = [(i, (i * 37) % 11 + 1) for i in range(500)]
    df = spark.createDataFrame(data, ["id", "v"]).repartition(13)
    got = {
        r["id"]: r["cs"]
        for r in with_global_cumsum(df, "v", ["id"], out_col="cs").collect()
    }
    acc = 0
    for i, v in data:
        acc += v
        assert got[i] == acc, f"id {i}: {got[i]} != {acc}"


def test_pack_no_single_partition_window(spark):
    # the plan must not contain a global (empty-partition-spec) window —
    # that would serialize the corpus through one task
    df = spark.createDataFrame([(i, 5) for i in range(100)], ["doc_id", "n"])
    plan = pack_concat_chunks(df, "n")._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line:
            assert "__pid" in line, line  # always partition-local


class TestNfdBins:
    def test_capacity_respected_and_no_straddle(self, spark):
        from optimus_any2any_spark.operators.packing import pack_bins_nfd

        rows = [(i, 100 + (i * 37) % 300) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = pack_bins_nfd(df, capacity=512, n_chunks=4)
        pdf = out.toPandas()
        assert len(pdf) == 40
        fills = pdf.groupby("bin")["n_tokens"].sum()
        # every doc here is <= capacity, so no bin may exceed it
        assert (fills <= 512).all(), fills[fills > 512]
        # decreasing order within chunks: rank ordering is by size desc
        by_rank = pdf.sort_values("rank")["n_tokens"].to_numpy()
        assert (by_rank[:-1] >= by_rank[1:]).all()

    def test_oversize_doc_gets_own_bin(self, spark):
        from optimus_any2any_spark.operators.packing import pack_bins_nfd

        df = spark.createDataFrame(
            [(1, 9000), (2, 100), (3, 100)], "doc_id long, n_tokens long"
        )
        pdf = pack_bins_nfd(df, capacity=512, n_chunks=1).toPandas()
        big_bin = pdf[pdf.id == 1].bin.iloc[0]
        others = pdf[pdf.id != 1]
        assert (others.bin != big_bin).all()
        assert others.bin.nunique() == 1  # the two small docs share

    def test_partition_invariance(self, spark):
        from optimus_any2any_spark.operators.packing import pack_bins_nfd

        rows = [(i, 50 + (i * 13) % 200) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        a = sorted(pack_bins_nfd(df.repartition(1), capacity=256).collect())
        b = sorted(pack_bins_nfd(df.repartition(7), capacity=256).collect())
        assert a == b

    def test_waste_bound_vs_sequential(self, spark):
        """Chunked NFD may open at most n_chunks-1 extra bins vs the
        fully sequential scan — the documented parallelism price."""
        from optimus_any2any_spark.operators.packing import pack_bins_nfd

        rows = [(i, 30 + (i * 7) % 250) for i in range(80)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        seq = pack_bins_nfd(df, capacity=512, n_chunks=1).toPandas()
        par = pack_bins_nfd(df, capacity=512, n_chunks=8).toPandas()
        assert par.bin.nunique() <= seq.bin.nunique() + 7
