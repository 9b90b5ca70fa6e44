"""Evaluation metrics: GA, PA, cluster F1, ARI, template accuracy.

Formula-parity with the reference (reference utils/metrics.py:13-249);
implemented over plain Python sequences (fixture scale) plus DataFrame
variants for the aggregates that matter at scale.
"""

from __future__ import annotations

import re
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize_template(template: str) -> str:
    """Whitespace-collapse normalize (metrics.py:212-216)."""
    return " ".join(template.split()).strip()


# a RUN of placeholder tokens (<*> / <NUM> / <PATH>) separated only by
# punctuation (no whitespace, no word chars) — e.g. "<*>-<*>", "<NUM>.<NUM>"
_PLACEHOLDER_RUN = re.compile(r"(?:<(?:\*|NUM|PATH)>)(?:[^\w\s]+<(?:\*|NUM|PATH)>)+")


def canonicalize_template(template: str) -> str:
    """Collapse placeholder runs separated by punctuation-only literals
    into one ``<*>`` (VERDICT r4 item 6). Two renderings of the SAME
    slot structure — a ground truth that writes a two-part id as
    ``<*>-<*>`` where the extractor wildcards the whole token to ``<*>``,
    or a cleaner pass that rewrites an IP to the literal ``<NUM>.<NUM>``
    where the truth holds one ``<*>`` — differ only in where the slot
    boundary falls, not in which positions are variable. Applied
    SYMMETRICALLY to both comparison sides in PA_norm, so literal /
    structural disagreements still count as misses."""
    return _PLACEHOLDER_RUN.sub("<*>", template)


def grouping_accuracy(predictions: list[str], ground_truth: list[str]) -> float:
    """Elementwise id-equality ratio (metrics.py:13-36)."""
    if len(predictions) != len(ground_truth):
        raise ValueError("length mismatch")
    if not predictions:
        return 0.0
    return sum(p == g for p, g in zip(predictions, ground_truth)) / len(predictions)


def parsing_accuracy(predicted: list[str], truth: list[str]) -> float:
    """Normalized-template equality ratio (metrics.py:39-66)."""
    if len(predicted) != len(truth):
        raise ValueError("length mismatch")
    if not predicted:
        return 0.0
    return sum(
        _normalize_template(p) == _normalize_template(g) for p, g in zip(predicted, truth)
    ) / len(predicted)


def _clusters(labels: list[str]) -> dict[str, set[int]]:
    out: dict[str, set[int]] = defaultdict(set)
    for i, label in enumerate(labels):
        out[label].add(i)
    return out


def cluster_f1(predictions: list[str], ground_truth: list[str]) -> tuple[float, float, float]:
    """Best-overlap cluster F1/precision/recall (metrics.py:69-123)."""
    if len(predictions) != len(ground_truth):
        raise ValueError("length mismatch")
    pred, true = _clusters(predictions), _clusters(ground_truth)
    tp = fp = fn = 0
    for pc in pred.values():
        best = max((len(pc & tc) for tc in true.values()), default=0)
        tp += best
        fp += len(pc) - best
    for tc in true.values():
        best = max((len(pc & tc) for pc in pred.values()), default=0)
        fn += len(tc) - best
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return f1, precision, recall


def adjusted_rand_index(predictions: list[str], ground_truth: list[str]) -> float:
    """ARI via contingency combinations (metrics.py:154-209)."""
    if len(predictions) != len(ground_truth):
        raise ValueError("length mismatch")
    pred, true = _clusters(predictions), _clusters(ground_truth)

    def c2(n: int) -> float:
        return n * (n - 1) / 2 if n > 1 else 0.0

    sum_pred = sum(c2(len(c)) for c in pred.values())
    sum_true = sum(c2(len(c)) for c in true.values())
    sum_int = sum(c2(len(pc & tc)) for pc in pred.values() for tc in true.values())
    total = c2(len(predictions))
    if total == 0:
        return 0.0
    expected = sum_pred * sum_true / total
    max_index = (sum_pred + sum_true) / 2
    if max_index == expected:
        return 0.0
    return (sum_int - expected) / (max_index - expected)


def template_accuracy(predicted: dict[str, str], truth: dict[str, str]) -> float:
    """Id-aligned normalized pattern equality (metrics.py:125-151)."""
    if not truth:
        return 0.0
    correct = sum(
        1
        for tid, gt in truth.items()
        if tid in predicted and _normalize_template(predicted[tid]) == _normalize_template(gt)
    )
    return correct / len(truth)


def grouping_accuracy_groups(predictions: list[str], ground_truth: list[str]) -> float:
    """Loghub-benchmark GA (Zhu et al., ICSE'19 "Tools and Benchmarks for
    Automated Log Parsing"): a line is correctly grouped iff its predicted
    cluster contains EXACTLY the same set of lines as its ground-truth
    cluster. Label-space-invariant (unlike the reference's elementwise
    id-equality GA, which only compares within one id space)."""
    if len(predictions) != len(ground_truth):
        raise ValueError("length mismatch")
    if not predictions:
        return 0.0
    pred, true = _clusters(predictions), _clusters(ground_truth)
    true_sets = {frozenset(v) for v in true.values()}
    correct = sum(len(pc) for pc in pred.values() if frozenset(pc) in true_sets)
    return correct / len(predictions)


def accuracy_scorecard(spark, n_pages: int = 1500, seed: int = 101, cfg=None) -> dict:
    """The published accuracy scorecard (VERDICT r2 item 3): GA/PA/F1/ARI
    of the DISTRIBUTED pipeline and the SEQUENTIAL reference-flow oracle
    against the seeded ground truth of the labeled Loghub-style fixture
    (synth.generate_labeled_lines), plus pipeline-vs-oracle agreement.

    GA is the Loghub exact-group metric (:func:`grouping_accuracy_groups`);
    PA compares the extracted template of each line against the
    slot-wildcarded bank template (``gt_template``). The reference
    publishes F1 90.6% / PA 81.1% on its own LLM-backed evaluation
    (reference README.md:13) — the comparable rows here are the
    oracle-vs-truth and spark-vs-truth lines.

    The scorecard carries TWO variants, both applied SYMMETRICALLY to
    the Spark pipeline and the sequential oracle:

    - the reference-semantics default (exact auto-merge only), and
    - ``*_slotvote`` rows with ``merging.enable_slot_voting`` — the
      deterministic cross-member slot-vote generalization
      (operators/merging.py:generalize_pool; the oracle side re-points
      its per-line ids through the generalized pool exactly as the
      reference's merger re-points log_to_template,
      template_pool.py:160-163).
    """
    from dataclasses import replace

    from .config import DEFAULT_CONFIG
    from .operators.cluster import assign_templates, discover_templates
    from .reference_oracle import SequentialParser
    from .sources.synth import generate_labeled_lines

    cfg = cfg or DEFAULT_CONFIG
    cfg_sv = replace(cfg, merging=replace(cfg.merging, enable_slot_voting=True))
    labeled = generate_labeled_lines(spark, n_pages, seed=seed)

    def _spark_run(run_cfg, full: bool) -> tuple[list, list[str], list[str]]:
        pool = discover_templates(labeled, "text", run_cfg)
        tid_to_pattern = {t["template_id"]: t["pattern"] for t in pool}
        assigned = assign_templates(labeled, "text", pool, run_cfg)
        # the variant run only needs the id column (plus ordering keys):
        # don't ship the corpus text/ground-truth to the driver twice
        cols = (
            ["url", "line_no", "text", "gt_id", "gt_template", "template_id"]
            if full
            else ["url", "line_no", "template_id"]
        )
        rows = assigned.select(*cols).orderBy("url", "line_no").collect()
        ids = [r["template_id"] for r in rows]
        return rows, ids, [tid_to_pattern.get(t, "") for t in ids]

    rows, spark_ids, spark_templates = _spark_run(cfg, full=True)
    _, spark_ids_sv, spark_templates_sv = _spark_run(cfg_sv, full=False)

    texts = [r["text"] for r in rows]
    gt_ids = [r["gt_id"] for r in rows]
    gt_templates = [r["gt_template"] for r in rows]

    oracle = SequentialParser(cfg_sv)  # parse flow is config-identical
    oracle_ids = [oracle.parse(t) for t in texts]
    oracle_templates = [
        oracle.pool[t]["pattern"] if t in oracle.pool else "" for t in oracle_ids
    ]
    oracle_ids_sv, sv_id_to_pattern = oracle.final_ids(oracle_ids)
    oracle_templates_sv = [sv_id_to_pattern.get(t, "") for t in oracle_ids_sv]

    # PA in raw-gt space penalizes pure PREPROCESSING renderings (the gt
    # keeps the literal "HTTP/1.1" where the cleaner's number pass writes
    # "HTTP/<NUM>"); PA_norm maps the gt template through the same
    # clean+extract normalization AND canonicalizes placeholder runs on
    # BOTH sides (canonicalize_template, r5), so it measures semantic
    # template agreement — which positions are variable — rather than
    # cleaner rendering or slot-boundary placement ("<*>-<*>" vs "<*>").
    from .functions.cleaning import clean_text
    from .operators.drain import extract_template

    norm_memo: dict[str, str] = {}

    def _norm_gt(t: str) -> str:
        if t not in norm_memo:
            norm_memo[t] = extract_template(
                clean_text(t, cfg.preprocessing), cfg.tree.token_delimiter
            )
        return norm_memo[t]

    gt_templates_norm = [_norm_gt(t) for t in gt_templates]

    gt_templates_canon = [canonicalize_template(t) for t in gt_templates_norm]

    def _vs_truth(ids: list[str], templates: list[str]) -> dict:
        f1, precision, recall = cluster_f1(ids, gt_ids)
        return {
            "GA": grouping_accuracy_groups(ids, gt_ids),
            "PA": parsing_accuracy(templates, gt_templates),
            "PA_norm": parsing_accuracy(
                [canonicalize_template(t) for t in templates], gt_templates_canon
            ),
            "F1": f1,
            "precision": precision,
            "recall": recall,
            "ARI": adjusted_rand_index(ids, gt_ids),
        }

    def _agreement(a: list[str], b: list[str]) -> dict:
        return {
            "GA": grouping_accuracy_groups(a, b),
            "F1": cluster_f1(a, b)[0],
            "ARI": adjusted_rand_index(a, b),
        }

    return {
        "n_lines": len(rows),
        "spark_vs_truth": _vs_truth(spark_ids, spark_templates),
        "oracle_vs_truth": _vs_truth(oracle_ids, oracle_templates),
        "spark_vs_oracle": _agreement(spark_ids, oracle_ids),
        "spark_vs_truth_slotvote": _vs_truth(spark_ids_sv, spark_templates_sv),
        "oracle_vs_truth_slotvote": _vs_truth(oracle_ids_sv, oracle_templates_sv),
        "spark_vs_oracle_slotvote": _agreement(spark_ids_sv, oracle_ids_sv),
    }


# ---- DataFrame variants (distributed; for large eval sets) ----------------


def grouping_accuracy_df(df: DataFrame, pred_col: str, truth_col: str) -> float:
    """GA as a single distributed aggregate."""
    row = df.agg(
        F.avg((F.col(pred_col) == F.col(truth_col)).cast("double")).alias("ga")
    ).collect()[0]
    return float(row["ga"]) if row["ga"] is not None else 0.0


def contingency_df(df: DataFrame, pred_col: str, truth_col: str) -> DataFrame:
    """groupBy(pred,truth).count() — the distributed half of ARI/F1; the
    tiny contingency table then feeds the driver-side arithmetic."""
    return df.groupBy(pred_col, truth_col).count()


def adjusted_rand_index_df(df: DataFrame, pred_col: str, truth_col: str) -> float:
    """ARI with the contingency computed distributed (scales to any n)."""
    rows = contingency_df(df, pred_col, truth_col).collect()

    def c2(n: float) -> float:
        return n * (n - 1) / 2 if n > 1 else 0.0

    pred_sizes: dict[str, int] = defaultdict(int)
    true_sizes: dict[str, int] = defaultdict(int)
    n = 0
    sum_int = 0.0
    for r in rows:
        pred_sizes[r[pred_col]] += r["count"]
        true_sizes[r[truth_col]] += r["count"]
        n += r["count"]
        sum_int += c2(r["count"])
    sum_pred = sum(c2(v) for v in pred_sizes.values())
    sum_true = sum(c2(v) for v in true_sizes.values())
    total = c2(n)
    if total == 0:
        return 0.0
    expected = sum_pred * sum_true / total
    max_index = (sum_pred + sum_true) / 2
    if max_index == expected:
        return 0.0
    return (sum_int - expected) / (max_index - expected)
