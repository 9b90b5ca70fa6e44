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
    # Candidate pruning (exact, not heuristic): should_merge rejects any
    # pair with |len(p1)−len(p2)| > max_edit_distance before all other
    # work, so only patterns within that CHARACTER-length window can ever
    # merge — bucket by length and scan just the window. This keeps the
    # greedy pass near-linear on real pools (pattern lengths spread far
    # wider than max_edit_distance=3); the worst case (every pattern
    # within one window) remains the reference's O(n²), bounded by the
    # pool cap — see the pool-cap contract in BENCH/BASELINE.md.
    by_len: dict[int, list[int]] = {}
    for idx, t in enumerate(templates):
        by_len.setdefault(len(t["pattern"]), []).append(idx)

    def candidates(i: int, plen: int) -> list[int]:
        if max_edit_distance <= 0:  # gate disabled → all later templates
            return list(range(i + 1, len(templates)))
        out = [
            j
            for length in range(plen - max_edit_distance, plen + max_edit_distance + 1)
            for j in by_len.get(length, ())
            if j > i
        ]
        out.sort()  # preserve the reference's scan order exactly
        return out

    merged: list[dict] = []
    used: set[int] = set()
    for i, t1 in enumerate(templates):
        if i in used:
            continue
        acc = dict(t1)
        acc.setdefault("sources", [t1["pattern"]])
        for j in candidates(i, len(t1["pattern"])):
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


def _slot_vote_round(templates: list[dict], min_distinct: int) -> tuple[list[dict], bool]:
    """One slot-voting pass; returns (new pool, changed?). See
    :func:`generalize_pool`."""
    from collections import defaultdict

    templates = sorted(templates, key=lambda t: t["pattern"])
    toks = [t["pattern"].split() for t in templates]

    parent = list(range(len(templates)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # patterns sharing a mask-one-position key differ at EXACTLY that
    # position (pool patterns are distinct) — O(n·L) candidate generation,
    # no all-pairs scan; transitive closure via union-find covers
    # multi-slot cross products (alice/alpha ↔ alice/bravo ↔ bob/alpha)
    groups: dict[tuple, int] = {}
    for idx, tk in enumerate(toks):
        for i in range(len(tk)):
            key = (len(tk), i, tuple(tk[:i]), tuple(tk[i + 1 :]))
            first = groups.setdefault(key, idx)
            if first != idx:
                union(first, idx)

    comps: dict[int, list[int]] = defaultdict(list)
    for i in range(len(templates)):
        comps[find(i)].append(i)

    out: list[dict] = []
    changed = False

    def _merge_members(members: list[int], merged_toks: list[str]) -> dict:
        acc = dict(templates[members[0]])
        acc.setdefault("sources", [acc["pattern"]])
        for m in members[1:]:
            t = templates[m]
            acc["count"] = acc.get("count", 0) + t.get("count", 0)
            acc["examples"] = (acc.get("examples", []) + t.get("examples", []))[:10]
            acc["confidence"] = min(
                acc.get("confidence", 1.0), t.get("confidence", 1.0)
            )
            acc["sources"] = acc["sources"] + t.get("sources", [t["pattern"]])
        acc["pattern"] = " ".join(merged_toks)
        return acc

    def _resolve(members: list[int]) -> list[dict]:
        """Vote over a member set; recurse on discriminator splits.

        A component can transitively chain DIFFERENT true templates
        (GET/... and POST/... connect through every shared path token),
        so a failed vote must not reject the whole component: partition
        by the first non-qualifying (discriminator) position's token and
        re-vote each part — within the GET part the path column still
        qualifies and merges."""
        nonlocal changed
        if len(members) == 1:
            return [templates[members[0]]]
        length = len(toks[members[0]])
        cols = [{toks[m][i] for m in members} for i in range(length)]
        varying = [i for i in range(length) if len(cols[i]) > 1]
        # the vote: a varying position is a credible variable slot iff the
        # members exhibit ≥ min_distinct different tokens there (or one
        # member already wildcarded it). A 2-way split like GET/POST is
        # NOT enough evidence — that is a discriminator, not a slot.
        bad = [
            i
            for i in varying
            if len(cols[i]) < min_distinct and WILDCARD not in cols[i]
        ]
        merged_toks = [
            WILDCARD if i in varying else toks[members[0]][i] for i in range(length)
        ]
        if not bad and any(t != WILDCARD for t in merged_toks):
            changed = True
            return [_merge_members(members, merged_toks)]
        if not bad:  # would be all-wildcard: keep split
            return [templates[m] for m in members]
        parts: dict[str, list[int]] = {}
        for m in members:
            parts.setdefault(toks[m][bad[0]], []).append(m)
        if len(parts) == 1:  # cannot split further
            return [templates[m] for m in members]
        return [t for tok in sorted(parts) for t in _resolve(parts[tok])]

    for root in sorted(comps):
        out.extend(_resolve(comps[root]))
    return out, changed


def generalize_pool(templates: list[dict], min_distinct: int = 3) -> list[dict]:
    """Drain-style cross-member SLOT VOTING over the collected pool — the
    deterministic generalization pass that closes most of the recall gap
    the LLM-free extractor leaves (VERDICT r3 item 2).

    The per-row extractor wildcards only tokens that LOOK variable in
    isolation (digits/hex/k=v); a slot holding plain words (usernames,
    job names) produces one pool pattern per value — over-splitting the
    true template. The evidence the reference's own components use at
    merge time (prefix_tree.py:241-279 fuzzy descent, merger.py:179-207
    positional merge) is CROSS-MEMBER: a token position that varies
    across otherwise-identical patterns is a variable slot. This pass
    applies exactly that vote, driver-side, over the (small) pool:

    1. connect patterns of equal token count differing at EXACTLY one
       position (hash-key candidate generation, O(n·L)); union-find
       closes multi-slot cross products transitively;
    2. a component merges iff EVERY varying position shows
       ``min_distinct``-or-more distinct tokens (or an existing ``<*>``)
       — a 2-way alternation like GET/POST is kept split (that is a
       discriminator, not a slot), which is what holds precision at 1.0;
    3. merged pattern = member tokens with varying positions wildcarded;
       counts sum, examples concat (cap 10), confidence = min,
       ``sources`` accumulate so the broadcast assignment map keeps
       routing every pre-merge pattern;
    4. repeat to fixpoint (merged patterns can enable further merges).

    Deterministic and order-free (members processed in sorted-pattern
    order), so the distributed pipeline stays partition-invariant.
    Config-gated OFF by default: the registered flagship queries keep
    the reference's exact merge semantics (and their DuckDB oracles);
    enable via ``merging.enable_slot_voting``."""
    if len(templates) < 2 or min_distinct < 2:
        return list(templates)
    cur = [dict(t) for t in templates]
    for t in cur:
        t.setdefault("sources", [t["pattern"]])
    while True:
        cur, changed = _slot_vote_round(cur, min_distinct)
        if not changed:
            return cur


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
