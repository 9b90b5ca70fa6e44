"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

The flagship (parse_route_agg) also reports end-to-end docs/sec — the
BASELINE.json target metric. Set SPARK_GRAFT_SCALING=1 to additionally
run the flagship at local[8] vs local[32] (fresh sessions) and report
N→4N scaling efficiency (the sandbox stand-in for executor scaling).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "parse_route_agg",
    "clean_extract",
    "template_extract",
    "pricing_summary",
    "top_customers",
    "user_sessions",
    "events_by_hour",
    "dedup_exact",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash",
    "ann_topk",
    "lang_quality",
    "enrich_lang_join",
    "region_rollup",
]

# queries whose result is row-sized (not an aggregate) → noop-write
# instead of collect so the driver isn't the bottleneck
LARGE_RESULT = {"clean_extract", "template_extract", "simhash", "lang_quality"}


def run_suite(spark, sf_dir: str) -> dict[str, float]:
    from logparser_llm_spark.plans.queries import QUERIES

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name][0]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if name in LARGE_RESULT:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def flagship_docs_per_sec(spark, sf_dir: str) -> tuple[float, int]:
    from logparser_llm_spark.plans.queries import q_parse_route_agg, _read

    n = _read(spark, sf_dir, "events").count()
    t0 = time.perf_counter()
    q_parse_route_agg(spark, sf_dir).collect()
    dt = time.perf_counter() - t0
    return n / dt, n


def session(cores: int):
    from logparser_llm_spark.session import build_session

    return build_session("bench", cores=cores)


def main() -> None:
    spark = session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JIT/codegen + python worker pool spin-up
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    t0 = time.perf_counter()
    times = run_suite(spark, SF_DIR)
    total = round(time.perf_counter() - t0, 3)
    dps, n_docs = flagship_docs_per_sec(spark, SF_DIR)

    result = {
        "metric": "end-to-end docs/sec (parse->route->aggregate) + headline suite",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "cpus": CPUS,
        "docs_per_sec": round(dps, 1),
        "flagship_rows": n_docs,
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        spark.stop()
        scaling = {}
        for cores in (8, 32):
            s = session(cores)
            s.sparkContext.setLogLevel("ERROR")
            s.range(1_000_000).selectExpr("sum(id)").collect()
            d, _ = flagship_docs_per_sec(s, SF_DIR)
            scaling[f"local{cores}"] = round(d, 1)
            s.stop()
        eff = (scaling["local32"] / scaling["local8"]) / 4.0
        result["scaling"] = {**scaling, "efficiency_8_to_32": round(eff, 3)}
    else:
        spark.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
