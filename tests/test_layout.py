"""Z-order layout: Morton code parity across Spark/DuckDB/Python
(boundaries included), the loud out-of-range guard, validation
contracts, the exact tile-geometry law on a full grid, the production
writer's disjoint per-file z-ranges, and the registered query's
pruning claim at sf0.01 and sf0.1."""

import itertools

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.layout import (
    morton_code,
    morton_py,
    morton_sql,
    zorder_file,
    zorder_file_sql,
    zorder_write,
)


def test_morton_matches_python_and_duckdb(spark):
    """Every (x, y) on a 4-bit grid edge+interior sample, plus 3-dim
    codes, agree bit for bit across the three spellings."""
    xs = [0, 1, 2, 7, 8, 14, 15]
    rows = [(a, b) for a, b in itertools.product(xs, xs)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton_code([F.col("x"), F.col("y")], 4).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("create table pts (x bigint, y bigint)")
    con.executemany("insert into pts values (?, ?)", rows)
    duck = {
        (x, y): z
        for x, y, z in con.execute(
            f"select x, y, {morton_sql(['x', 'y'], 4)} from pts"
        ).fetchall()
    }
    for a, b in rows:
        assert got[(a, b)] == morton_py([a, b], 4) == duck[(a, b)]
    # classic pins: interleave of all-ones, unit bits per dim
    assert morton_py([0b1111, 0], 4) == 0b01010101
    assert morton_py([0, 0b1111], 4) == 0b10101010
    assert morton_py([1, 1, 1], 4) == 0b111


def test_out_of_range_raises_loudly(spark):
    df = spark.createDataFrame([(16, 0)], "x bigint, y bigint")
    with pytest.raises(Exception, match="out of"):
        df.select(morton_code([F.col("x"), F.col("y")], 4)).collect()
    with pytest.raises(ValueError, match="out of"):
        morton_py([16, 0], 4)
    with pytest.raises(ValueError, match="out of"):
        morton_py([-1, 0], 4)


def test_validation_contracts():
    with pytest.raises(ValueError, match="dims"):
        morton_py([], 4)
    with pytest.raises(ValueError, match="bits"):
        morton_py([0], 0)
    with pytest.raises(ValueError, match="BIGINT budget"):
        morton_sql(["a", "b"], 32)  # 64 key bits
    with pytest.raises(ValueError, match="files"):
        zorder_file_sql("z", n_dims=2, bits=8, files=0)


def test_tile_geometry_is_exact_on_full_grid(spark):
    """bits=4, files=16 over the full 16x16 grid: each z tile is one
    4x4 quadrant (x_span = y_span = 3); the linear tiling on x gives
    x_span = 0 and y_span = 15 — the pruning asymmetry in its purest
    form."""
    rows = [(a, b) for a, b in itertools.product(range(16), range(16))]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    z = morton_code([F.col("x"), F.col("y")], 4)
    zo = (
        df.select("x", "y", zorder_file(z, n_dims=2, bits=4, files=16).alias("f"))
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(zo) == 16
    assert all(r["xs"] == 3 and r["ys"] == 3 and r["n"] == 16 for r in zo)
    li = (
        df.select("x", "y", zorder_file(F.col("x"), n_dims=1, bits=4, files=16).alias("f"))
        .groupBy("f")
        .agg((F.max("x") - F.min("x")).alias("xs"), (F.max("y") - F.min("y")).alias("ys"))
        .collect()
    )
    assert all(r["xs"] == 0 and r["ys"] == 15 for r in li)


def test_zorder_write_produces_disjoint_z_ranges(spark, tmp_path):
    """The production writer's actual parquet files carry disjoint
    Morton ranges (range partitioning + within-partition sort), i.e.
    every file's bounding box is prunable."""
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(64), rng.randrange(64)) for _ in range(4000)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    path = str(tmp_path / "zorded")
    zorder_write(df, path, ["x", "y"], bits=6, files=8)
    back = (
        spark.read.parquet(path)
        .select(
            F.input_file_name().alias("f"),
            morton_code([F.col("x"), F.col("y")], 6).alias("z"),
        )
        .groupBy("f")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in back) == len(rows)
    spans = sorted((r["lo"], r["hi"]) for r in back)
    for (alo, ahi), (blo, bhi) in zip(spans, spans[1:]):
        assert ahi < blo  # strictly disjoint, in z order


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_registered_query_pruning_claim(spark, sf):
    """On the real events corpus: every z file's y_span is at most one
    quadrant (64 cells) while the linear layout's widest file spans the
    corpus's full y range — a predicate on y prunes z tiles but no
    linear file."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["zorder_layout"][0](spark, sf).collect()
    zo = [r for r in rows if r["strategy"] == "zorder"]
    li = [r for r in rows if r["strategy"] == "linear"]
    assert zo and li
    assert max(r["y_span"] for r in zo) <= 63
    y_all = max(r["y_max"] for r in li) - min(r["y_min"] for r in li)
    assert max(r["y_span"] for r in li) >= y_all * 0.9


def test_registered_query_rejects_negative_inputs(spark, tmp_path):
    """Spark `div` truncates toward zero, so a small negative scaled
    value would silently land in tile 0 while DuckDB floors to -1 —
    the query must fail loudly BEFORE the division instead."""
    from logparser_llm_spark.plans.queries import QUERIES

    spark.createDataFrame(
        [(1, -0.5), (2, 3.0)], "user_id bigint, value double"
    ).write.parquet(str(tmp_path / "events.parquet"))
    with pytest.raises(Exception, match="negative input"):
        QUERIES["zorder_layout"][0](spark, str(tmp_path)).collect()


# --- overlap_depth -----------------------------------------------------------


def test_overlap_depth_hand_cases_and_duckdb(spark):
    """Closed intervals: touching ranges overlap; a sorted layout
    reads depth 1 / zero pairs; NULL-only files count in n_files but
    not in ranges; parity with the generated SQL."""
    import duckdb

    from logparser_llm_spark.operators.layout import (
        overlap_depth,
        overlap_depth_sql,
    )

    rows = [("f0", 0), ("f0", 10), ("f1", 5), ("f1", 15),
            ("f2", 20), ("f2", 30), ("f3", None)]
    df = spark.createDataFrame(rows, "f string, v long")
    got = tuple(overlap_depth(df, "f", "v").collect()[0])
    con = duckdb.connect()
    con.execute("create table t (f varchar, v bigint)")
    con.executemany("insert into t values (?,?)", rows)
    want = tuple(con.execute(overlap_depth_sql(
        rel="t", file_col="f", val_col="v")).fetchall()[0])
    assert got == want == (4, 2, 1)
    srt = spark.createDataFrame(
        [("a", 0), ("a", 4), ("b", 5), ("b", 9), ("c", 10), ("c", 14)],
        "f string, v long")
    assert tuple(overlap_depth(srt, "f", "v").collect()[0]) == (3, 1, 0)
    tch = spark.createDataFrame(
        [("a", 0), ("a", 5), ("b", 5), ("b", 9)], "f string, v long")
    assert tuple(overlap_depth(tch, "f", "v").collect()[0]) == (2, 2, 1)


def test_layout_depth_query_separates_layouts(spark):
    """The registered two-layout comparison must read the hashed
    layout at full depth (= n_files: every md5 bucket spans the
    month) and the time layout at depth ≤ 2 — the measured
    justification for sorted writes."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = {r["layout"]: r for r in QUERIES["layout_depth"][0](
        spark, "/root/testdata/sf0.01").collect()}
    arr, tim = rows["hashed"], rows["time"]
    assert arr["max_depth"] >= arr["n_files"] - 1
    assert tim["max_depth"] <= 2
    assert tim["n_overlapping_pairs"] <= tim["n_files"]
