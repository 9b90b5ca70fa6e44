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

Pass 2 (assignment, no shuffle):
    broadcast the merged pool → per-row match via an Arrow-batched UDF
    walking a pattern tree (exact child → ``<*>`` wildcard → fuzzy, the
    search semantics of prefix_tree.py:154-186) with an exact-extract
    fallback; miss → 'unknown' (parser.py:388-398). This is the "cached
    template-match fast path" that replaces the reference's per-row LLM
    call.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..functions.cleaning import clean_pandas, is_valid_log_col
from .drain import UNKNOWN_ID, TemplateTree, extract_template
from .merging import dedup_pool_exact, merge_pool



def cleaned_frame(df: DataFrame, text_col: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Append a ``cleaned`` column (vectorized extractor) and a validity flag."""
    pre = cfg.preprocessing

    @pandas_udf("string")
    def _clean(s: pd.Series) -> pd.Series:
        return clean_pandas(s, pre)

    return df.withColumn("cleaned", _clean(F.col(text_col))).withColumn(
        "is_valid", is_valid_log_col(F.col("cleaned"))
    )


def extract_pattern_udf(cfg: PipelineConfig = DEFAULT_CONFIG):
    """Arrow-batched UDF: cleaned text → deterministic template pattern."""
    delim = cfg.tree.token_delimiter

    @pandas_udf("string")
    def _extract(cleaned: pd.Series) -> pd.Series:
        memo: dict[str, str] = {}
        return cleaned.map(lambda c: memo.setdefault(c, extract_template(c, delim)))

    return _extract


def discover_templates(
    df: DataFrame, text_col: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> list[dict]:
    """Pass 1: per-row template extraction + groupBy(pattern).count();
    returns the merged, canonicalized global pool (small, driver-side).

    Deterministic at any parallelism: no per-partition state.
    """
    merge_cfg = cfg.merging

    pattern_counts = (
        cleaned_frame(df, text_col, cfg)
        .filter(F.col("is_valid"))
        .select(extract_pattern_udf(cfg)(F.col("cleaned")).alias("pattern"))
        .groupBy("pattern")
        .count()
    )

    rows = pattern_counts.collect()  # bounded: |distinct patterns|
    templates = [
        {"pattern": r["pattern"], "count": r["count"], "confidence": 0.9, "examples": []}
        for r in rows
    ]
    cap = cfg.scale.broadcast_pool_max_templates
    if len(templates) > cap:
        # bound the broadcast pool like the reference bounds its pool via
        # auto-merge (parser.py:229-232): keep the top-N patterns by
        # count (deterministic tiebreak on pattern); the long tail routes
        # to 'unknown'
        templates = sorted(templates, key=lambda t: (-t["count"], t["pattern"]))[:cap]
    templates = dedup_pool_exact(templates)  # sorts by pattern
    merged = merge_pool(
        templates,
        enable=merge_cfg.enable_auto_merge,
        merge_threshold=merge_cfg.merge_threshold,
        max_edit_distance=merge_cfg.max_edit_distance,
    )
    return canonicalize_pool(merged)


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


def assign_templates(
    df: DataFrame,
    text_col: str,
    pool: list[dict],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    keep_cleaned: bool = True,
) -> DataFrame:
    """Pass 2: per-row template assignment against the broadcast pool.

    Adds ``cleaned``, ``template_id``; invalid rows route to 'unknown'.
    Pure map-side — no shuffle.
    """
    matcher = make_matcher(pool, cfg)

    @pandas_udf("string")
    def _match(cleaned: pd.Series) -> pd.Series:
        # per-batch memo: web corpora are heavily duplicated, so match
        # each distinct line once per batch (the reference's cache,
        # parser.py:94-106, collapsed into the batch dimension)
        memo: dict[str, str] = {}
        return cleaned.map(lambda c: memo.setdefault(c, matcher(c)))

    out = cleaned_frame(df, text_col, cfg).withColumn(
        "template_id",
        F.when(F.col("is_valid"), _match(F.col("cleaned"))).otherwise(F.lit(UNKNOWN_ID)),
    )
    if not keep_cleaned:
        out = out.drop("cleaned", "is_valid")
    return out


def pool_to_df(spark: SparkSession, pool: list[dict]) -> DataFrame:
    """The template pool as a (broadcastable) dimension DataFrame."""
    return spark.createDataFrame(
        [
            (t["template_id"], t["pattern"], int(t.get("count", 0)), float(t.get("confidence", 0.9)))
            for t in pool
        ],
        schema="template_id string, pattern string, discovery_count bigint, confidence double",
    )


def parse_and_count(
    df: DataFrame, text_col: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> tuple[DataFrame, list[dict]]:
    """Discover + assign + per-template counts (A1 — the parity target)."""
    pool = discover_templates(df, text_col, cfg)
    assigned = assign_templates(df, text_col, pool, cfg)
    return assigned, pool
