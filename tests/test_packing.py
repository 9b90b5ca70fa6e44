"""Distributed prefix sum + sequence packing: equality against the
single-partition window spelling (the dual-path precedent), partition-
count invariance, the one-full-shuffle plan contract, edge inputs, and
packing semantics on a hand-checked stream. DuckDB parity for the
registered ``seq_pack`` query runs via test_queries_oracle."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from logparser_llm_spark.operators.packing import (
    exclusive_prefix_sum,
    pack_sequences,
)


def _window_reference(df, order_col, val_col):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn(
        "cum_before",
        F.coalesce(F.sum(F.coalesce(F.col(val_col), F.lit(0))).over(w), F.lit(0)),
    )


@pytest.fixture(scope="module")
def stream(spark):
    # deterministic pseudo-random token counts incl. zeros and a null
    rows = [(i, (i * 37 + 11) % 97 if i % 13 else 0) for i in range(500)]
    rows[200] = (200, None)
    return spark.createDataFrame(rows, "doc_id bigint, tok bigint").cache()


def test_matches_window_reference_across_partition_counts(spark, stream):
    want = {
        r["doc_id"]: r["cum_before"]
        for r in _window_reference(stream, "doc_id", "tok").collect()
    }
    for n in (1, 3, 32):
        got = {
            r["doc_id"]: r["cum_before"]
            for r in exclusive_prefix_sum(
                stream, "doc_id", "tok", num_partitions=n
            ).collect()
        }
        assert got == want, f"num_partitions={n}"


def test_single_full_shuffle_plan(spark, stream):
    """The scale contract: the data is shuffled exactly once (the range
    repartition feeding the persisted scan); the cumsum pass adds no
    exchange over the data."""
    out = exclusive_prefix_sum(stream, "doc_id", "tok", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan  # the shared materialization
    # the only exchange anywhere (incl. the cached plan's rendering) is
    # the range repartition; in particular no single-partition collapse
    # (the global-window anti-shape) and no second hash shuffle
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "Exchange rangepartitioning" in line, plan
    assert "SinglePartition" not in plan and "hashpartitioning" not in plan


def test_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "doc_id bigint, tok bigint")
    assert exclusive_prefix_sum(empty, "doc_id", "tok").count() == 0
    one = spark.createDataFrame([(7, 42)], "doc_id bigint, tok bigint")
    [r] = exclusive_prefix_sum(one, "doc_id", "tok").collect()
    assert r["cum_before"] == 0 and r["tok"] == 42


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id bigint, tok bigint")
    with pytest.raises(ValueError, match="must be in"):
        exclusive_prefix_sum(df, "missing", "tok")
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, "doc_id", "tok", seq_len=0)


def test_packing_semantics_hand_checked(spark):
    """Stream 300+300+300+124 tokens at L=512: doc 2 straddles the first
    boundary (offset 300+300=600? no — exclusive cum), check exactly."""
    df = spark.createDataFrame(
        [(0, 300), (1, 300), (2, 300), (3, 124)], "doc_id bigint, tok bigint"
    )
    got = {
        r["doc_id"]: r
        for r in pack_sequences(df, "doc_id", "tok", seq_len=512).collect()
    }
    # cum_before: 0, 300, 600, 900
    assert [got[i]["cum_before"] for i in range(4)] == [0, 300, 600, 900]
    assert [got[i]["seq_id"] for i in range(4)] == [0, 0, 1, 1]
    assert [got[i]["seq_offset"] for i in range(4)] == [0, 300, 88, 388]
    # doc0: 0+300<=512 no; doc1: 300+300>512 straddles; doc2: 88+300 no;
    # doc3: 388+124=512 exactly fits -> no straddle (boundary inclusive)
    assert [got[i]["straddles"] for i in range(4)] == [False, True, False, False]


def test_registered_query_conserves_tokens(spark):
    from logparser_llm_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    out = QUERIES["seq_pack"][0](spark, sf).collect()
    total = sum(r["tokens_sum"] for r in out)
    d = spark.read.parquet(f"{sf}/documents.parquet")
    want = d.select(
        F.sum(F.size(F.filter(F.split(F.trim("text"), " "), lambda t: t != F.lit(""))))
    ).first()[0]
    assert total == want
    assert all(r["n_docs"] >= 1 for r in out)


# --- global_rank (curriculum ordering) -------------------------------------


def test_global_rank_matches_window_reference(spark):
    """global_rank must equal row_number()-1 over the same total order,
    at any partition count (the whole point: same answer as the
    single-task window, without the single task)."""
    from pyspark.sql import Window, functions as F

    from logparser_llm_spark.operators.packing import global_rank

    rows = [(i, f"{(i * 37) % 101:03d}-{i:04d}") for i in range(200)]
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "id long, k string").repartition(parts)
        got = {
            r["id"]: r["global_pos"]
            for r in global_rank(df, "k", num_partitions=5).collect()
        }
        ref = {
            r["id"]: r["rn"]
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy("k")) - 1
            ).collect()
        }
        assert got == ref


def test_global_rank_validation_and_edges(spark):
    from pyspark.sql import functions as F

    from logparser_llm_spark.operators.packing import global_rank

    df = spark.createDataFrame([(1, "a")], "id long, k string")
    with pytest.raises(ValueError):
        global_rank(df.withColumn("global_pos", F.lit(0)), "k")
    with pytest.raises(ValueError):
        global_rank(df.withColumn("__one", F.lit(0)), "k")
    with pytest.raises(ValueError):
        global_rank(df, "missing")
    empty = spark.createDataFrame([], "id long, k string")
    assert global_rank(empty, "k").count() == 0
    one = global_rank(df, "k").collect()
    assert [(r["id"], r["global_pos"]) for r in one] == [(1, 0)]


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_curriculum_order_laws(spark, sf):
    """Positions are a permutation of 0..N-1; buckets are contiguous
    position ranges in bucket order (the curriculum property); more
    than one bucket is populated; within a bucket, positions do NOT
    follow doc_id order (the md5 shuffle is real)."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["curriculum_order"][0](spark, sf).collect()
    n = len(rows)
    assert sorted(r["global_pos"] for r in rows) == list(range(n))
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["global_pos"])
    assert len(by_bucket) >= 2, sf
    hi = -1
    for b in sorted(by_bucket):
        ps = sorted(by_bucket[b])
        assert ps[0] == hi + 1 and ps[-1] == ps[0] + len(ps) - 1, (sf, b)
        hi = ps[-1]
    some = sorted(
        (r["doc_id"], r["global_pos"]) for r in rows
        if r["bucket"] == min(by_bucket)
    )
    pos_seq = [p for _, p in some]
    assert pos_seq != sorted(pos_seq), "md5 shuffle missing"


# --- budget_select -----------------------------------------------------------


def test_budget_select_exact_cut_and_maximality(spark):
    """The selected set is the unique maximal prefix that fits: docs
    of 3 tokens each under budget 7 → exactly 2 selected (6 <= 7 but
    9 > 7); a doc exactly AT the boundary is kept; budget 0 selects
    nothing; a zero-token doc inside the prefix is kept for free."""
    from logparser_llm_spark.operators.packing import budget_select

    rows = [(f"k{i}", i, 3) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, id long, tok long")
    got = {r["id"]: r["selected"]
           for r in budget_select(df, "k", "tok", budget=7).collect()}
    assert got == {0: True, 1: True, 2: False, 3: False, 4: False}

    exact = budget_select(df, "k", "tok", budget=6).collect()
    assert {r["id"]: r["selected"] for r in exact}[1] is True

    zero = {r["id"]: r["selected"]
            for r in budget_select(df, "k", "tok", budget=0).collect()}
    assert all(v is False for v in zero.values())

    free = spark.createDataFrame(
        [("a", 1, 4), ("b", 2, 0), ("c", 3, 4)], "k string, id long, tok long"
    )
    gf = {r["id"]: r["selected"]
          for r in budget_select(free, "k", "tok", budget=4).collect()}
    assert gf == {1: True, 2: True, 3: False}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="budget"):
        budget_select(df, "k", "tok", budget=-1)


def test_budget_select_matches_window_reference(spark):
    """Prefix-sum spelling == the window spelling, across partition
    counts (the global_rank differential, applied to the budget cut)."""
    from pyspark.sql.window import Window

    from logparser_llm_spark.operators.packing import budget_select

    rows = [(f"{(i * 7) % 100:03d}-{i:04d}", i, (i * 3) % 9) for i in range(150)]
    df = spark.createDataFrame(rows, "k string, id long, tok long")
    w = (Window.orderBy("k")
         .rowsBetween(Window.unboundedPreceding, -1))
    ref = {
        r["id"]: (r["cb"], r["cb"] + r["tok"] <= 100)
        for r in df.select(
            "id", "tok",
            F.coalesce(F.sum("tok").over(w), F.lit(0)).alias("cb"),
        ).collect()
    }
    for parts in (1, 13):
        got = {r["id"]: (r["cum_before"], r["selected"])
               for r in budget_select(df.repartition(parts), "k", "tok",
                                      budget=100).collect()}
        assert got == ref, parts


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_budget_select_registered_laws(spark, sf):
    """Entropy-greedy cut: selected docs' total stays within budget
    and is maximal (the best unselected doc would overflow it);
    selection is exactly a prefix of the entropy-desc/id order; every
    selected doc's entropy >= every unselected doc's entropy except
    inside the straddle region caused by whole-doc granularity."""
    from logparser_llm_spark.plans.queries import BUDGET_SELECT_TOKENS, QUERIES

    rows = QUERIES["budget_select"][0](spark, sf).collect()
    sel = [r for r in rows if r["selected"]]
    uns = [r for r in rows if not r["selected"]]
    assert sel and uns, sf
    total = sum(r["n_tokens"] for r in sel)
    assert total <= BUDGET_SELECT_TOKENS, sf
    # maximality along the order: the FIRST unselected doc in key
    # order (min cum_before) would overflow the budget
    first_out = min(uns, key=lambda r: (r["cum_before"], r["doc_id"]))
    assert first_out["cum_before"] + first_out["n_tokens"] \
        > BUDGET_SELECT_TOKENS, sf
    # prefix property in the total order (entropy desc, id asc)
    key = lambda r: (-r["entropy_e6"], r["doc_id"])
    ordered = sorted(rows, key=key)
    flags = [r["selected"] for r in ordered]
    # selected rows form a prefix except possible interleaving where
    # a big doc overflowed but later small docs cannot re-enter (the
    # cut is prefix-maximal, not knapsack): after the first False all
    # must be False
    assert flags == sorted(flags, reverse=True), sf


# --- shard_plan --------------------------------------------------------------


def test_shard_plan_contiguity_and_bounds(spark):
    """Shard ids are non-decreasing in order (contiguous byte
    ranges); every shard's overshoot past target is bounded by its
    largest doc; a doc bigger than the target gets its own span."""
    from logparser_llm_spark.operators.packing import shard_plan

    rows = [(f"{i:03d}", i, b) for i, b in
            enumerate((4, 4, 4, 15, 2, 2, 30, 1))]
    df = spark.createDataFrame(rows, "k string, id long, b long")
    got = sorted((r["id"], r["cum_before"], r["shard_id"])
                 for r in shard_plan(df, "k", "b", target_bytes=10).collect())
    ids = [s for _, _, s in got]
    assert ids == sorted(ids)
    # cum_before: 0,4,8,12,27,29,31,61 → shards 0,0,0,1,2,2,3,6
    assert ids == [0, 0, 0, 1, 2, 2, 3, 6]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="target_bytes"):
        shard_plan(df, "k", "b", target_bytes=0)


def test_shard_plan_matches_window_reference(spark):
    from pyspark.sql.window import Window

    from logparser_llm_spark.operators.packing import shard_plan

    rows = [(f"{i:04d}", i, (i * 7) % 40 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, id long, b long")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    ref = {r["id"]: (r["cb"], r["cb"] // 100) for r in df.select(
        "id", F.coalesce(F.sum("b").over(w), F.lit(0)).alias("cb")
    ).collect()}
    for parts in (1, 9):
        got = {r["id"]: (r["cum_before"], r["shard_id"])
               for r in shard_plan(df.repartition(parts), "k", "b",
                                   target_bytes=100).collect()}
        assert got == ref, parts


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_shard_plan_registered_laws(spark, sf):
    """Shards are contiguous in doc order, every non-final shard spans
    at least the target once its straddling doc closes it, and no
    shard exceeds target + its own largest doc."""
    from collections import defaultdict

    from logparser_llm_spark.plans.queries import SHARD_PLAN_TARGET, QUERIES

    rows = sorted(QUERIES["shard_plan"][0](spark, sf).collect(),
                  key=lambda r: r["doc_id"])
    ids = [r["shard_id"] for r in rows]
    assert ids == sorted(ids), sf
    by = defaultdict(list)
    for r in rows:
        by[r["shard_id"]].append(r["n_bytes"])
    last = max(by)
    for sid, bs in by.items():
        total = sum(bs)
        assert total <= SHARD_PLAN_TARGET + max(bs), (sf, sid)
        if sid != last:
            assert total + 0 >= SHARD_PLAN_TARGET - max(bs), (sf, sid)
    assert len(by) >= 2, sf


# --- epoch_shuffle -----------------------------------------------------------


def test_epoch_shuffle_bijection_determinism_and_decorrelation(spark):
    """Every epoch's pos multiset is exactly 0..N−1; the same (seed,
    epoch, id) always lands on the same pos; different epochs/seeds
    give different orders; validation."""
    import pytest as _pytest

    from logparser_llm_spark.operators.packing import epoch_shuffle

    ids = spark.createDataFrame([(i,) for i in range(60)], "doc long")
    out = epoch_shuffle(ids, "doc", epochs=3, seed=5).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r["epoch"], {})[r["id"]] = r["pos"]
    assert set(by_epoch) == {0, 1, 2}
    for m in by_epoch.values():
        assert sorted(m.values()) == list(range(60))
    assert by_epoch[0] != by_epoch[1] and by_epoch[1] != by_epoch[2]
    again = {r["id"]: r["pos"]
             for r in epoch_shuffle(ids, "doc", epochs=1,
                                    seed=5).collect()}
    assert again == by_epoch[0]
    other_seed = {r["id"]: r["pos"]
                  for r in epoch_shuffle(ids, "doc", epochs=1,
                                         seed=6).collect()}
    assert other_seed != by_epoch[0]
    with _pytest.raises(ValueError, match="epochs"):
        epoch_shuffle(ids, "doc", epochs=0)


def test_epoch_shuffle_matches_duckdb_and_no_single_partition(spark):
    import duckdb

    from logparser_llm_spark.operators.packing import (
        epoch_shuffle,
        epoch_shuffle_sql,
    )
    from logparser_llm_spark.plans.inspect import physical_plan

    ids = spark.createDataFrame([(i * 3,) for i in range(45)], "doc long")
    got = sorted(map(tuple,
                     epoch_shuffle(ids, "doc", epochs=2,
                                   seed=11).collect()))
    con = duckdb.connect()
    con.execute("create table d (doc bigint)")
    con.executemany("insert into d values (?)",
                    [(i * 3,) for i in range(45)])
    want = sorted(map(tuple, con.execute(epoch_shuffle_sql(
        rel="d", id_col="doc", epochs=2, seed=11)).fetchall()))
    assert got == want
    plan = physical_plan(epoch_shuffle(ids, "doc", epochs=2, seed=11))
    assert "Window" not in plan  # rank comes from the prefix sum
