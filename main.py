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
    p.add_argument("--num-sinks", type=int, default=8)
    p.add_argument("--cores", type=int, default=None, help="local-mode cores (ignored under a real master)")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from logparser_llm_spark.config import PipelineConfig, ScaleConfig
    from logparser_llm_spark.plans.checkpoint import run_resumable
    from logparser_llm_spark.session import build_session

    cfg = PipelineConfig(scale=ScaleConfig(num_sinks=args.num_sinks))
    spark = build_session("logparser-llm-spark", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    if args.explode_lines:
        # pre-explode into a derived table so the manifest units stay file-granular
        from logparser_llm_spark.plans.pipeline import explode_lines

        src = f"{args.output}/_exploded"
        explode_lines(spark.read.parquet(args.input), args.text_col).write.mode(
            "overwrite"
        ).parquet(src)
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
