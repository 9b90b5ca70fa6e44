"""Distributed Drain clustering: discover → merge → broadcast → assign.

The Spark realization of the reference's stateful clustering engine
(SURVEY.md §2.7). The reference is sequential (core/parser.py:66-166); the
distributed shape here is the classic two-pass Drain-at-scale design:

Pass 1 (discovery, one shuffle):
    clean (Arrow-batched UDF) → validity filter → deterministic template
    extraction per row (the LLM replacement) → ``groupBy(pattern).count()``.

    Discovery is PURELY FUNCTIONAL per row — ``extract_template`` depends
    only on the row's own cleaned text — so the discovered pool is
    byte-identical at any parallelism (local[8] ≡ local[32] ≡ a
    1000-executor cluster) and under any row order. The groupBy is the
    only shuffle and carries just (pattern, partial count) pairs after
    map-side combine, so boilerplate skew (one template owning 40% of a
    web corpus) is absorbed by partial aggregation, not a hot reducer.

    An earlier design ran the reference's stateful tree *during*
    discovery (partition-local mapInPandas); it was abandoned because
    fuzzy tree grouping is insertion-order-dependent (prefix_tree.py:
    96-152) — results varied with partitioning, which is exactly what a
    1000-executor run can't tolerate. The tree still runs, but only at
    assignment time against the globally-merged pool.

Driver merge (pools are O(10²..10³) rows — collect is safe):
    exact-pattern dedup (template_pool.py:27-59 semantics) → greedy
    similarity merge (merger.py:92-134 semantics) → canonical ids
    ``tmpl_{rank:04d}`` by sorted pattern (order-independent, resolving
    the reference's insertion-order-dependent ids, prefix_tree.py:315-317).
    A top-N-by-count cap (``broadcast_pool_max_templates``) bounds the
    broadcast, mirroring the reference's pool-bounding auto-merge trigger
    (parser.py:229-232).

Pass 2 (assignment, no shuffle of the fact side):
    clean (JVM) → extract pattern (JVM) → **broadcast hash join** against
    a driver-precomputed pattern→template_id map. Tree-walk semantics
    (first template node on the ≤max_depth walk, prefix_tree.py:154-186,
    which collapses patterns sharing a ≤max_depth prefix) are preserved
    by running the tree matcher ONCE PER PATTERN on the driver while
    building the map — so the per-row path is pure whole-stage codegen
    with zero Python workers. Rows whose pattern is outside the map (the
    capped tail / genuinely new patterns in incremental runs) route to
    'unknown' (parser.py:388-398) or, with ``fallback="tree"``, through a
    vectorized-masked Arrow UDF that runs the fuzzy tree walk on just
    those rows. This is the "cached template-match fast path" that
    replaces the reference's per-row LLM call.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..functions.cleaning import clean_pandas, is_valid_log_col
from .drain import UNKNOWN_ID, TemplateTree, extract_template, extract_template_col
from .merging import dedup_pool_exact, generalize_pool, merge_pool



def cleaned_frame(df: DataFrame, text_col: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Append a ``cleaned`` column (the extractor) and a validity flag.

    Default path is the JVM ``regexp_replace`` chain (whole-stage
    codegen, no Python workers); ``cfg.scale.arrow_parity_mode`` switches
    to the Arrow-batched Python-``re`` UDF for corpora where Java/Python
    regex semantics could diverge (the two are cross-checked byte-for-
    byte on fixtures + the synthetic corpus in tests)."""
    pre = cfg.preprocessing
    if cfg.scale.arrow_parity_mode:

        @pandas_udf("string")
        def _clean(s: pd.Series) -> pd.Series:
            return clean_pandas(s, pre)

        cleaned = _clean(F.col(text_col))
    else:
        from ..functions.cleaning import clean_col

        cleaned = clean_col(F.col(text_col), pre)
    return df.withColumn("cleaned", cleaned).withColumn(
        "is_valid", is_valid_log_col(F.col("cleaned"))
    )


def extract_pattern_udf(cfg: PipelineConfig = DEFAULT_CONFIG):
    """Arrow-batched UDF: cleaned text → deterministic template pattern
    (the parity-mode path; the default hot path is the JVM
    :func:`~.drain.extract_template_col`)."""
    delim = cfg.tree.token_delimiter

    @pandas_udf("string")
    def _extract(cleaned: pd.Series) -> pd.Series:
        memo: dict[str, str] = {}
        return cleaned.map(lambda c: memo.setdefault(c, extract_template(c, delim)))

    return _extract


def pattern_col(cfg: PipelineConfig = DEFAULT_CONFIG):
    """cleaned → pattern, JVM by default, Python in parity mode."""
    if cfg.scale.arrow_parity_mode:
        udf = extract_pattern_udf(cfg)
        return lambda c: udf(c)
    return extract_template_col


def discover_templates(
    df: DataFrame, text_col: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> list[dict]:
    """Pass 1: per-row template extraction + groupBy(pattern) agg
    (count + deterministic min-line exemplar — example_logs parity,
    template_pool.py:102-105); returns the merged, canonicalized global
    pool (small, driver-side). Pool bounded by a top-N-by-count cap
    (the reference's pool-bounding auto-merge analogue, parser.py:229-232;
    the capped tail routes to 'unknown').

    Deterministic at any parallelism: no per-partition state.
    """
    return discover_templates_from_cleaned(cleaned_frame(df, text_col, cfg), cfg)


def canonicalize_pool(templates: list[dict]) -> list[dict]:
    """Deterministic ids: sort by pattern, id = tmpl_{rank:04d}."""
    out = []
    for i, t in enumerate(sorted(templates, key=lambda t: t["pattern"])):
        t = dict(t)
        t["template_id"] = f"tmpl_{i:04d}"
        out.append(t)
    return out


def make_matcher(pool: list[dict], cfg: PipelineConfig = DEFAULT_CONFIG):
    """Build the broadcast-side matcher closure (executor-local tree).

    Returns a function str→template_id used inside Arrow batches. The
    tree is built lazily once per Python worker from the (small) pool
    that rides along in the serialized closure.
    """
    tree_cfg = cfg.tree
    patterns = [(t["template_id"], t["pattern"]) for t in pool]
    state: dict = {}

    def _ensure() -> tuple[TemplateTree, dict[str, str]]:
        if "tree" not in state:
            tree = TemplateTree(
                max_depth=tree_cfg.max_depth,
                min_cluster_size=tree_cfg.min_cluster_size,
                delimiter=tree_cfg.token_delimiter,
                enable_fuzzy=tree_cfg.enable_fuzzy,
                fuzzy_threshold=tree_cfg.fuzzy_threshold,
            )
            exact = {}
            for tid, pattern in patterns:
                tree.add_pattern(pattern, tid)
                exact.setdefault(pattern, tid)
            state["tree"] = tree
            state["exact"] = exact
        return state["tree"], state["exact"]

    def match_one(cleaned: str) -> str:
        tree, exact = _ensure()
        tid = tree.match(cleaned)
        if tid is not None:
            return tid
        tid = exact.get(extract_template(cleaned, tree_cfg.token_delimiter))
        return tid if tid is not None else UNKNOWN_ID

    return match_one


def assignment_map(pool: list[dict], cfg: PipelineConfig = DEFAULT_CONFIG) -> dict[str, str]:
    """Driver-side pattern → template_id map with TREE semantics baked in.

    For every pre-merge source pattern (and every canonical pattern), the
    assigned id is what the prefix-tree matcher would return for a line
    of that pattern — i.e. the first template node on its ≤max_depth walk
    (prefix_tree.py:154-186), which collapses patterns sharing a
    ≤max_depth prefix exactly like the reference's search does. Running
    the walk ONCE PER PATTERN on the driver (pool is small) instead of
    once per row on executors turns pass 2 into a pure broadcast hash
    join — zero Python in the row path."""
    matcher = make_matcher(pool, cfg)
    out: dict[str, str] = {}
    for t in pool:
        for pattern in {t["pattern"], *t.get("sources", [])}:
            out[pattern] = matcher(pattern)
    return out


def assign_templates(
    df: DataFrame,
    text_col: str,
    pool: list[dict],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    keep_cleaned: bool = True,
    fallback: str = "unknown",
    pre_cleaned: bool = False,
) -> DataFrame:
    """Pass 2: per-row template assignment — clean (JVM) → extract
    pattern (JVM) → broadcast hash join against the driver-computed
    pattern→tid map. Map-side only, whole-stage codegen, no shuffle of
    the fact side, no Python workers.

    ``fallback`` controls rows whose pattern is not in the map (only the
    capped-out long tail in batch runs; possible new patterns in
    incremental runs): "unknown" routes them to the fallback sink
    (parser.py:388-398); "tree" runs the fuzzy tree matcher UDF on just
    those rows (Arrow-batched, vectorized-masked so matched rows cost
    nothing but transfer)."""
    amap = assignment_map(pool, cfg)
    spark = df.sparkSession
    # map-side column aliased _map_pattern: a bare 'pattern' would make
    # drop('pattern') also take out an input column of that name
    # one slice: the map is pool-sized (bounded); a core-count-wide local
    # frame makes the broadcast build launch one task per core for nothing
    map_df = spark.createDataFrame(
        spark.sparkContext.parallelize(list(amap.items()), 1),
        schema="_map_pattern string, _tid string",
    )

    cleaned = df if pre_cleaned else cleaned_frame(df, text_col, cfg)
    base = cleaned.withColumn(
        "_pattern",
        F.when(F.col("is_valid"), pattern_col(cfg)(F.col("cleaned"))),
    )
    joined = base.join(
        F.broadcast(map_df), base["_pattern"] == map_df["_map_pattern"], "left"
    ).drop("_map_pattern")

    if fallback == "tree":
        matcher = make_matcher(pool, cfg)

        @pandas_udf("string")
        def _match_miss(tid: pd.Series, cleaned: pd.Series) -> pd.Series:
            miss = tid.isna() & cleaned.notna()
            if not miss.any():
                return tid
            memo: dict[str, str] = {}
            out = tid.copy()
            out[miss] = cleaned[miss].map(lambda c: memo.setdefault(c, matcher(c)))
            return out

        tid_col = F.when(~F.col("is_valid"), F.lit(UNKNOWN_ID)).otherwise(
            _match_miss(F.col("_tid"), F.col("cleaned"))
        )
    else:
        tid_col = F.when(F.col("is_valid"), F.coalesce(F.col("_tid"), F.lit(UNKNOWN_ID))).otherwise(
            F.lit(UNKNOWN_ID)
        )

    out = joined.withColumn("template_id", tid_col).drop("_tid", "_pattern")
    if not keep_cleaned:
        out = out.drop("cleaned", "is_valid")
    return out


def pool_to_df(spark: SparkSession, pool: list[dict]) -> DataFrame:
    """The template pool as a (broadcastable) dimension DataFrame —
    one slice (pool-sized, bounded by the discovery cap)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(
            [
                (t["template_id"], t["pattern"], int(t.get("count", 0)), float(t.get("confidence", 0.9)))
                for t in pool
            ],
            1,
        ),
        schema="template_id string, pattern string, discovery_count bigint, confidence double",
    )


def pool_to_reference_json(pool: list[dict], saved_at: str = "1970-01-01T00:00:00") -> dict:
    """Render the pool in the reference's templates.json shape
    (template_pool.py:198-218 / models Template fields, log_entry.py:40-57)
    so a user of the reference can load our pool with their tooling.
    ``saved_at`` is caller-provided (deterministic exports for tests)."""
    templates = []
    for t in pool:
        pattern = t["pattern"]
        tokens = pattern.split()
        templates.append(
            {
                "template_id": t["template_id"],
                "template_pattern": pattern,
                "static_tokens": [tok for tok in tokens if tok != "<*>"],
                "variable_positions": [i for i, tok in enumerate(tokens) if tok == "<*>"],
                "example_logs": t.get("examples", [])[:10],
                "count": int(t.get("count", 0)),
                "confidence": float(t.get("confidence", 0.9)),
                "created_at": saved_at,
                "updated_at": saved_at,
            }
        )
    return {
        "templates": templates,
        "metadata": {"total_templates": len(templates), "saved_at": saved_at},
    }


def parse_and_count(
    df: DataFrame,
    text_col: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    persist_intermediate: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Discover + assign + per-template counts (A1 — the parity target).

    The two passes each evaluate clean+extract over the input. By default
    that work is RECOMPUTED — the right trade at 10^12 rows, where
    materializing a cleaned copy of the corpus costs more than the CPU to
    re-derive it. ``persist_intermediate=True`` caches the projected
    (row, cleaned) frame between passes for memory-rich deployments;
    caller must unpersist via the returned frame."""
    base = df
    if persist_intermediate:
        base = cleaned_frame(df, text_col, cfg).persist()
        pool = discover_templates_from_cleaned(base, cfg)
        assigned = assign_templates(base, text_col, pool, cfg, pre_cleaned=True)
        return assigned, pool
    pool = discover_templates(base, text_col, cfg)
    assigned = assign_templates(base, text_col, pool, cfg)
    return assigned, pool


def discover_templates_from_cleaned(
    cleaned_df: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> list[dict]:
    """Discovery over a frame that already has cleaned/is_valid columns."""
    merge_cfg = cfg.merging
    base = cleaned_df.filter(F.col("is_valid")).select(
        pattern_col(cfg)(F.col("cleaned")).alias("pattern"), "cleaned"
    )
    if cfg.scale.collect_examples:
        pattern_counts = base.groupBy("pattern").agg(
            F.count(F.lit(1)).alias("count"), F.min("cleaned").alias("example")
        )
    else:
        pattern_counts = base.groupBy("pattern").agg(
            F.count(F.lit(1)).alias("count"), F.lit(None).cast("string").alias("example")
        )
    # apply the top-N-by-count pool cap DISTRIBUTED (TakeOrderedAndProject)
    # so the driver only ever receives ≤ cap rows — a web corpus can have
    # more distinct patterns than driver memory; same deterministic
    # (-count, pattern) order the Python-side cap used
    cap = cfg.scale.broadcast_pool_max_templates
    rows = (
        pattern_counts.orderBy(F.desc("count"), "pattern").limit(cap).collect()
    )
    templates = [
        {"pattern": r["pattern"], "count": r["count"], "confidence": 0.9,
         "examples": [r["example"]] if r["example"] is not None else []}
        for r in rows
    ]
    templates = dedup_pool_exact(templates)
    merged = merge_pool(
        templates,
        enable=merge_cfg.enable_auto_merge,
        merge_threshold=merge_cfg.merge_threshold,
        max_edit_distance=merge_cfg.max_edit_distance,
    )
    if merge_cfg.enable_slot_voting:
        merged = generalize_pool(merged, merge_cfg.slot_min_distinct)
    return canonicalize_pool(merged)
