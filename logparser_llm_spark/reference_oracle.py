"""Single-process oracle: the reference parse flow, LLM replaced.

A faithful sequential re-implementation of the reference engine's control
flow (reference core/parser.py:66-166 ``parse`` / :168-239 ``parse_batch``)
used ONLY as ground truth in parity tests — never in the Spark hot path.

Flow per log (parser.py:66-166):
  clean → validity gate (→ 'unknown' fallback, parser.py:388-398)
  → exact-hash cache probe (md5(cleaned), parser.py:94-106)
  → prefix-tree search (parser.py:109-125)
  → miss: template extraction (deterministic extractor replacing the LLM
    call at parser.py:129-132), pool insert-if-absent (exact-pattern dedup,
    template_pool.py:27-59), tree insert (parser.py:146)

One deliberate coherence fix vs the reference: the reference keeps two
independent sequential id spaces (tree ids, prefix_tree.py:315-317, vs pool
ids, parser.py:138) whose collisions make ``pool.get_template(tree_id)``
return an unrelated template. We keep a single id space — tree nodes are
promoted with the POOL id of the line that triggers promotion — which is
the behavior the reference's own metrics (grouping accuracy / F1,
utils/metrics.py:13-123) evaluate clusterings by.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import PipelineConfig, DEFAULT_CONFIG
from .functions.cleaning import clean_text, is_valid_log
from .functions.hashing import log_hash
from .operators.drain import UNKNOWN_ID, TemplateTree, extract_template
from .operators.merging import merge_pool



@dataclass
class OracleResult:
    template_ids: list[str] = field(default_factory=list)   # per input row
    cleaned: list[str] = field(default_factory=list)        # per input row
    pool: dict[str, dict] = field(default_factory=dict)     # tid -> template


class SequentialParser:
    """Reference-flow parser over an in-memory list of lines."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.tree = TemplateTree(
            max_depth=cfg.tree.max_depth,
            min_cluster_size=cfg.tree.min_cluster_size,
            delimiter=cfg.tree.token_delimiter,
            enable_fuzzy=cfg.tree.enable_fuzzy,
            fuzzy_threshold=cfg.tree.fuzzy_threshold,
        )
        self.pattern_to_tid: dict[str, str] = {}
        self.pool: dict[str, dict] = {}
        self.cache: dict[str, str] = {}
        self.stats = {
            "total_logs": 0,
            "successfully_parsed": 0,
            "failed": 0,
            "cache_hits": 0,
            "extractor_calls": 0,  # ≙ reference llm_calls
        }

    def _add_template(self, pattern: str) -> str:
        """Pool insert-if-absent by exact pattern (template_pool.py:27-59)."""
        tid = self.pattern_to_tid.get(pattern)
        if tid is not None:
            self.pool[tid]["count"] += 1
            return tid
        tid = f"tmpl_{len(self.pool):04d}"
        self.pattern_to_tid[pattern] = tid
        self.pool[tid] = {"pattern": pattern, "count": 0, "examples": [], "confidence": 0.9}
        return tid

    def parse(self, line: str) -> str:
        self.stats["total_logs"] += 1
        cleaned = clean_text(line, self.cfg.preprocessing)
        if not is_valid_log(cleaned):
            self.stats["failed"] += 1
            return UNKNOWN_ID
        h = log_hash(cleaned)
        cached = self.cache.get(h)
        if cached is not None:
            self.stats["cache_hits"] += 1
            self.stats["successfully_parsed"] += 1
            self.pool[cached]["count"] += 1
            return cached
        tid = self.tree.search(cleaned)
        if tid is not None and tid in self.pool:
            self.cache[h] = tid
            self.pool[tid]["count"] += 1
            self.stats["successfully_parsed"] += 1
            return tid
        # miss branch: deterministic extraction replaces the LLM call
        self.stats["extractor_calls"] += 1
        pattern = extract_template(cleaned, self.cfg.tree.token_delimiter)
        tid = self._add_template(pattern)
        self.pool[tid]["count"] += 1
        if len(self.pool[tid]["examples"]) < 10:
            self.pool[tid]["examples"].append(line)
        self._tree_insert(cleaned, h, tid)
        self.cache[h] = tid
        self.stats["successfully_parsed"] += 1
        return tid

    def _tree_insert(self, cleaned: str, log_id: str, tid: str) -> None:
        """Tree insert with pool-id promotion (see module docstring)."""
        tree = self.tree
        from .operators.drain import tokenize

        tokens = tokenize(cleaned, tree.delimiter)
        if not tokens:
            return
        node = tree.root
        for token in tokens[: tree.max_depth]:
            child = node.children.get(token)
            if child is None and tree.enable_fuzzy:
                child = tree._descend_fuzzy(node, token)
            if child is None:
                child = type(node)(token)
                node.children[token] = child
            node = child
        node.log_ids.add(log_id)
        tree.total_logs += 1
        if len(node.log_ids) >= tree.min_cluster_size and node.template_id is None:
            node.template_id = tid
            tree.num_clusters += 1

    def parse_all(self, lines: list[str]) -> OracleResult:
        res = OracleResult(pool=self.pool)
        for line in lines:
            res.template_ids.append(self.parse(line))
            res.cleaned.append(clean_text(line, self.cfg.preprocessing))
        return res

    def merged_pool(self) -> list[dict]:
        """Auto-merge pass (parser.py:229-232, 349-359), patterns sorted
        for order-independence."""
        templates = [self.pool[t] for t in sorted(self.pool, key=lambda k: self.pool[k]["pattern"])]
        return merge_pool(
            templates,
            enable=self.cfg.merging.enable_auto_merge,
            merge_threshold=self.cfg.merging.merge_threshold,
            max_edit_distance=self.cfg.merging.max_edit_distance,
        )

    def final_pool(self) -> list[dict]:
        """The post-parse pool: auto-merge, plus slot-voting
        generalization when the config enables it — the sequential twin
        of discover_templates' pool pipeline, canonical ids included."""
        from .operators.cluster import canonicalize_pool
        from .operators.merging import generalize_pool

        merged = self.merged_pool()
        if self.cfg.merging.enable_slot_voting:
            merged = generalize_pool(merged, self.cfg.merging.slot_min_distinct)
        return canonicalize_pool(merged)

    def final_ids(self, ids: list[str]) -> tuple[list[str], dict[str, str]]:
        """Re-point per-line template ids through the merged/generalized
        pool — the reference's own merge re-pointing semantics
        (parse_batch runs the merger periodically and merge re-points
        log_to_template, template_pool.py:160-163; here it is applied
        once, post-parse). Returns (remapped ids, new_id → pattern)."""
        final = self.final_pool()
        pat_to_new: dict[str, str] = {}
        for t in final:
            for src in {t["pattern"], *t.get("sources", [])}:
                pat_to_new[src] = t["template_id"]
        old_to_new = {
            old: pat_to_new.get(pattern, old)
            for pattern, old in self.pattern_to_tid.items()
        }
        id_to_pattern = {t["template_id"]: t["pattern"] for t in final}
        return [old_to_new.get(i, i) for i in ids], id_to_pattern
