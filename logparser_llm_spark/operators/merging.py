"""Template similarity + greedy pool merge (driver-side).

Semantics of the reference merger (reference core/merger.py) — the one
wired into parse_batch auto-merge (parser.py:229-232,349-359); NOT the
pool's own zip-truncating variant (template_pool.py:281-293), per the
divergence noted in SURVEY.md §2.7.

Runs on the driver over the collected pool: pools are small
(O(10²..10³) patterns), so an all-pairs greedy pass is cheaper than any
distributed formulation. Templates are plain dicts:
``{"pattern": str, "count": int, "examples": list[str], "confidence": float}``.
"""

from __future__ import annotations

from .drain import WILDCARD, levenshtein


def pattern_similarity(p1: str, p2: str) -> float:
    """0.7·positional-match + 0.3·Jaccard over tokens (merger.py:136-177)."""
    t1, t2 = p1.split(), p2.split()
    if not t1 or not t2:
        return 0.0
    if p1 == p2:
        return 1.0
    matching = sum(1 for a, b in zip(t1, t2) if a == b or (a == WILDCARD and b == WILDCARD))
    s1, s2 = set(t1), set(t2)
    union = len(s1 | s2)
    jaccard = len(s1 & s2) / union if union else 0.0
    return (matching / max(len(t1), len(t2))) * 0.7 + jaccard * 0.3


def should_merge(
    p1: str,
    p2: str,
    merge_threshold: float = 0.9,
    max_edit_distance: int = 3,
) -> bool:
    """similarity ≥ threshold AND edit distance ≤ max (merger.py:21-53).

    The length-difference short-circuit is exact (|len(p1)−len(p2)| is a
    lower bound on levenshtein) and makes the greedy all-pairs pool merge
    O(1) for the vast majority of pairs — the constant that matters when
    a web corpus pushes the pool toward the broadcast cap."""
    if max_edit_distance > 0 and abs(len(p1) - len(p2)) > max_edit_distance:
        return False
    if pattern_similarity(p1, p2) < merge_threshold:
        return False
    if max_edit_distance > 0 and levenshtein(p1, p2) > max_edit_distance:
        return False
    return True


def merge_patterns(p1: str, p2: str) -> str:
    """Positionally-equal tokens kept, everything else (including length
    mismatch padding) wildcarded (merger.py:179-207)."""
    t1, t2 = p1.split(), p2.split()
    out = []
    for i in range(max(len(t1), len(t2))):
        a = t1[i] if i < len(t1) else None
        b = t2[i] if i < len(t2) else None
        out.append(a if a == b else WILDCARD)
    return " ".join(out)


def merge_two(tmpl1: dict, tmpl2: dict) -> dict:
    """Merge metadata (merger.py:55-90): counts sum, confidence =
    min×0.95, examples concat capped at 10 (keep first 10). ``sources``
    (the pre-merge patterns absorbed into this template) accumulate —
    they feed the broadcast pattern→template_id assignment map."""
    examples = (tmpl1.get("examples", []) + tmpl2.get("examples", []))[:10]
    return {
        "pattern": merge_patterns(tmpl1["pattern"], tmpl2["pattern"]),
        "count": tmpl1.get("count", 0) + tmpl2.get("count", 0),
        "examples": examples,
        "confidence": min(tmpl1.get("confidence", 1.0), tmpl2.get("confidence", 1.0)) * 0.95,
        "sources": tmpl1.get("sources", [tmpl1["pattern"]])
        + tmpl2.get("sources", [tmpl2["pattern"]]),
    }


def merge_pool(
    templates: list[dict],
    enable: bool = True,
    merge_threshold: float = 0.9,
    max_edit_distance: int = 3,
) -> list[dict]:
    """Greedy batch merge (merger.py:92-134): scan in order; each unused
    template absorbs all later mergeable ones.

    Call with ``templates`` sorted by pattern for order-independence —
    the distributed pipeline always does (cluster.py canonicalization).
    """
    if not enable or len(templates) < 2:
        return list(templates)
    merged: list[dict] = []
    used: set[int] = set()
    for i, t1 in enumerate(templates):
        if i in used:
            continue
        acc = dict(t1)
        acc.setdefault("sources", [t1["pattern"]])
        for j in range(i + 1, len(templates)):
            if j in used:
                continue
            # note: reference compares against the ORIGINAL t1 pattern,
            # not the running merge result (merger.py:119)
            if should_merge(t1["pattern"], templates[j]["pattern"], merge_threshold, max_edit_distance):
                acc = merge_two(acc, templates[j])
                used.add(j)
        merged.append(acc)
        used.add(i)
    return merged


def merge_patterns_zip(p1: str, p2: str) -> str:
    """The POOL's pattern merge (template_pool.py:281-293) — ``zip``
    TRUNCATES to the shorter pattern, unlike merger.py's max-length
    padding variant above (the divergence SURVEY §2.7 documents)."""
    return " ".join(a if a == b else WILDCARD for a, b in zip(p1.split(), p2.split()))


def pool_merge_templates(
    pool: list[dict], template_id1: str, template_id2: str
) -> tuple[list[dict], str | None]:
    """The reference pool-mutation API ``merge_templates``
    (template_pool.py:128-166), for the online-learning workflow of
    merging two templates BETWEEN runs: merged keeps ``template_id1``,
    pattern = zip-truncating merge, count sum, examples concatenated,
    confidence = plain min (no 0.95 decay — that is merger.py's batch
    path), ``template_id2`` removed. ``sources`` accumulate so the
    broadcast assignment map keeps routing both original patterns (the
    analogue of the reference's log_to_template re-pointing,
    template_pool.py:160-163). Pure function: returns (new_pool,
    merged_id) — (pool, None) when either id is missing."""
    by_id = {t["template_id"]: t for t in pool}
    t1, t2 = by_id.get(template_id1), by_id.get(template_id2)
    if t1 is None or t2 is None:
        return pool, None
    merged = {
        "template_id": template_id1,
        "pattern": merge_patterns_zip(t1["pattern"], t2["pattern"]),
        "count": t1.get("count", 0) + t2.get("count", 0),
        "examples": t1.get("examples", []) + t2.get("examples", []),
        "confidence": min(t1.get("confidence", 1.0), t2.get("confidence", 1.0)),
        "sources": (
            t1.get("sources", [t1["pattern"]]) + t2.get("sources", [t2["pattern"]])
        ),
    }
    out = []
    for t in pool:
        if t["template_id"] == template_id1:
            out.append(merged)
        elif t["template_id"] == template_id2:
            continue
        else:
            out.append(t)
    return out, template_id1


def pool_remove_template(pool: list[dict], template_id: str) -> tuple[list[dict], bool]:
    """``remove_template`` (template_pool.py:168-196): retire a template;
    rows whose pattern only matched it route to 'unknown' on the next
    run (the log-association cleanup analogue). Returns (new_pool,
    removed?)."""
    out = [t for t in pool if t["template_id"] != template_id]
    return out, len(out) != len(pool)


def dedup_pool_exact(templates: list[dict]) -> list[dict]:
    """Exact-pattern dedup (the pool's insert-if-absent semantics,
    template_pool.py:27-59 + :270-279): same pattern → counts sum,
    examples concat (capped 10), max confidence kept."""
    by_pattern: dict[str, dict] = {}
    for t in templates:
        cur = by_pattern.get(t["pattern"])
        if cur is None:
            cur = dict(t)
            cur.setdefault("sources", [t["pattern"]])
            by_pattern[t["pattern"]] = cur
        else:
            cur["count"] = cur.get("count", 0) + t.get("count", 0)
            cur["examples"] = (cur.get("examples", []) + t.get("examples", []))[:10]
            cur["confidence"] = max(cur.get("confidence", 0.0), t.get("confidence", 0.0))
    return [by_pattern[p] for p in sorted(by_pattern)]
