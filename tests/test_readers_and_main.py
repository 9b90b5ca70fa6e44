"""Source readers (S1-S3) and the spark-submit entry point."""

import json
import subprocess
import sys

from logparser_llm_spark.sources.readers import (
    read_csv_logs,
    read_json_logs,
    read_logs,
    read_text_logs,
    write_csv_results,
)

LINES = [
    "User alice logged in from 10.0.0.1",
    "Failed to connect to db-01 on port 5432",
    "   ",
    "Disk usage at 95 percent",
]


def test_text_reader(spark, tmp_path):
    p = tmp_path / "logs.txt"
    p.write_text("\n".join(LINES) + "\n")
    got = [r["text"] for r in read_text_logs(spark, str(p)).collect()]
    assert sorted(got) == sorted([line.strip() for line in LINES if line.strip()])


def test_csv_reader(spark, tmp_path):
    p = tmp_path / "logs.csv"
    p.write_text("id,log\n" + "\n".join(f"{i},{line}" for i, line in enumerate(LINES) if line.strip()))
    got = [r["text"] for r in read_csv_logs(spark, str(p)).collect()]
    assert len(got) == 3


def test_json_reader_and_dispatch(spark, tmp_path):
    p = tmp_path / "logs.json"
    p.write_text("\n".join(json.dumps({"log": line}) for line in LINES if line.strip()))
    got = [r["text"] for r in read_json_logs(spark, str(p)).collect()]
    assert len(got) == 3
    assert read_logs(spark, str(p)).count() == 3


def test_csv_sink_roundtrip(spark, tmp_path):
    p = tmp_path / "logs.txt"
    p.write_text("\n".join(LINES))
    df = read_text_logs(spark, str(p))
    out = tmp_path / "out_csv"
    write_csv_results(df, str(out))
    assert spark.read.option("header", True).csv(str(out)).count() == 3


def test_main_cli_resumable(spark, tmp_path):
    """Drive main.py as spark-submit would (python -m equivalent)."""
    from logparser_llm_spark.sources.synth import generate_pages

    src = str(tmp_path / "src")
    generate_pages(spark, 40, seed=13).coalesce(1).write.parquet(src)
    cmd = [
        sys.executable, "main.py",
        "--input", src,
        "--output", str(tmp_path / "out"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--cores", "4",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-2000:]
    res1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert res1["processed_files"] == 1 and res1["skipped_files"] == 0

    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    res2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert res2["processed_files"] == 0 and res2["skipped_files"] == 1


def test_main_cli_explode_lines_resumable(spark, tmp_path):
    """--explode-lines must keep checkpoint-manifest keys stable across
    reruns (ADVICE r1, high: blanket overwrite of the derived table
    regenerated part-file names and silently doubled sink rows)."""
    from logparser_llm_spark.sources.synth import generate_pages

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    generate_pages(spark, 30, seed=21, lines_per_doc=3).coalesce(1).write.parquet(src)
    cmd = [
        sys.executable, "main.py",
        "--input", src, "--output", out,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--explode-lines", "--cores", "4",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-2000:]
    exploded1 = spark.read.parquet(f"{out}/_exploded").count()  # blanks dropped (S3)
    total1 = spark.read.parquet(f"{out}/sinks").drop("run").count()
    assert total1 == exploded1 > 0

    # rerun with no new input: nothing reprocessed, counts unchanged
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    res2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert res2["processed_files"] == 0
    assert spark.read.parquet(f"{out}/sinks").drop("run").count() == total1

    # a new source file: only its exploded lines are appended
    generate_pages(spark, 10, seed=22, lines_per_doc=3).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    r3 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert r3.returncode == 0, r3.stderr[-2000:]
    res3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert res3["processed_files"] >= 1
    exploded3 = spark.read.parquet(f"{out}/_exploded").count()
    assert exploded3 > exploded1
    assert spark.read.parquet(f"{out}/sinks").drop("run").count() == exploded3


def test_scaling_run_paired_rejects_zero_pairs():
    """ADVICE r4: pairs=0 used to NameError on an unbound 'lines' (and
    max() over an empty list) — now an explicit ValueError up front."""
    import importlib.util
    import os

    import pytest

    bench_path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", bench_path)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    with pytest.raises(ValueError, match="pairs"):
        bench.scaling_run_paired(pairs=0)
