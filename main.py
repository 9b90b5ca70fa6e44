"""spark-submit entry point.

Usage (multi-executor cluster or local):

    spark-submit --py-files logparser_llm_spark.zip main.py \
        --input /path/to/pages_or_logs \
        --output /path/to/out \
        --checkpoint /path/to/ckpt \
        --text-col text [--explode-lines] [--num-sinks 8]

Package the library with:  python -m zipfile -c logparser_llm_spark.zip logparser_llm_spark

Runs the resumable parse → enrich → route → aggregate pipeline: only
input files absent from the checkpoint manifest are processed; per-sink
parquet + counts + pool + lineage manifest land under --output/--checkpoint.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="logparser_llm_spark pipeline")
    p.add_argument("--input", required=True, help="input parquet path (pages or log lines)")
    p.add_argument("--output", required=True, help="output dir (sinks/ counts/)")
    p.add_argument("--checkpoint", required=True, help="checkpoint dir (manifest + pool)")
    p.add_argument("--text-col", default="text")
    p.add_argument("--explode-lines", action="store_true", help="split multi-line page text")
    p.add_argument(
        "--config",
        default=None,
        help="YAML config (reference config.yaml shape, ${VAR} env interpolation); "
        "defaults to ./config/config.yaml or ./config.yaml when present",
    )
    p.add_argument("--num-sinks", type=int, default=None, help="overrides config scale.num_sinks")
    p.add_argument("--cores", type=int, default=None, help="local-mode cores (ignored under a real master)")
    return p.parse_args(argv)


def explode_incrementally(spark, input_path: str, exploded_root: str, text_col: str) -> str:
    """Pre-explode multi-line pages into a derived table, ONE SOURCE FILE
    AT A TIME into a deterministic ``src=<md5(source)>`` subdirectory.

    A blanket ``mode('overwrite')`` of the whole derived table (the old
    behavior) regenerated part files with fresh UUID names on every run,
    so checkpoint-manifest keys never matched and every rerun re-appended
    all rows (ADVICE r1, high). Per-source subdirs make the derived
    layout stable: already-exploded sources (subdir has _SUCCESS) are
    skipped, new sources land in new subdirs, and a crashed explode
    (no _SUCCESS) is idempotently rewritten with overwrite."""
    import hashlib

    from logparser_llm_spark.plans.checkpoint import list_input_files, path_exists
    from logparser_llm_spark.plans.pipeline import explode_lines

    for source in list_input_files(spark, input_path):
        dest = f"{exploded_root}/src={hashlib.md5(source.encode()).hexdigest()[:16]}"
        if path_exists(spark, f"{dest}/_SUCCESS"):
            continue
        explode_lines(spark.read.parquet(source), text_col).write.mode("overwrite").parquet(dest)
    return exploded_root


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from dataclasses import replace

    from logparser_llm_spark.config import load_config
    from logparser_llm_spark.plans.checkpoint import run_resumable
    from logparser_llm_spark.session import build_session

    cfg = load_config(args.config)
    if args.num_sinks is not None:
        cfg = replace(cfg, scale=replace(cfg.scale, num_sinks=args.num_sinks))
    spark = build_session("logparser-llm-spark", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    if args.explode_lines:
        src = explode_incrementally(spark, args.input, f"{args.output}/_exploded", args.text_col)
    else:
        src = args.input

    result = run_resumable(
        spark, src, args.checkpoint, args.output, text_col=args.text_col, cfg=cfg
    )
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "processed_files": len(result["processed"]),
                "skipped_files": len(result["skipped"]),
                "pool_size": result["pool_size"],
                "elapsed_sec": round(elapsed, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
