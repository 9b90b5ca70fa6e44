"""Text analysis for large-scale training-data pipelines.

Language ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (min-shingle
hash). All pure ``pyspark.sql.functions`` Column expressions — JVM-side,
whole-stage-codegen friendly, no Python in the hot path — and all
formulated so a DuckDB oracle can express the identical semantics
(the driver's correctness gate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword banks (deterministic; top function words).
STOPWORDS = {
    "en": ["the", "a", "an", "of", "to", "in", "and", "is", "that", "for", "it", "on", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht", "ein", "eine"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "des", "du", "que", "pour"],
    "es": ["el", "la", "los", "las", "de", "y", "es", "un", "una", "que", "en", "por"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "他"],
}

# BPE-ish word-piece tokenizer: letter runs, digit runs, single symbols.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# DuckDB rendering of ws_tokens() — THE cross-engine tokenizer twin,
# defined once next to the Spark side it mirrors (review r5: a second
# verbatim copy lived in operators/decontaminate.py; a drifting copy
# would desynchronize one oracle from every other). `.format(c=<expr>)`.
TOKENS_SQL = "list_filter(string_split(trim({c}), ' '), x -> x <> '')"


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens, empties dropped (tokenize semantics F10,
    reference prefix_tree.py:78-94). Splits on the single-space delimiter
    exactly like the reference default."""
    return F.filter(F.split(F.trim(col), " "), lambda t: t != F.lit(""))


# The LOWERCASED alphanumeric tokenizer (the lm/bm25/dsir family) —
# same single-definition rule as TOKENS_SQL above: one split regex, one
# Spark spelling, one DuckDB template, so a change (e.g. NFC
# normalization) cannot desynchronize one consumer's oracle from the
# others. operators/ranking.py re-exports TOKEN_SPLIT_RE from here.
TOKEN_SPLIT_RE = "[^a-z0-9]+"  # identical semantics in Java regex and RE2
LOWER_TOKENS_SQL = (
    f"list_filter(regexp_split_to_array(lower({{c}}), '{TOKEN_SPLIT_RE}'),"
    " x -> x <> '')"
)


def lower_tokens(col: Column) -> Column:
    """Lowercased alphanumeric tokens, empties dropped — the Spark twin
    of :data:`LOWER_TOKENS_SQL`."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(col))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish regex token count (letter runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), 0))


def stopword_hits(col: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(ws_tokens(col), lambda t: F.array_contains(words, F.lower(t))))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """stopword tokens / all tokens (0.0 when empty)."""
    n = token_count_ws(col)
    return F.when(n > 0, stopword_hits(col, lang) / n).otherwise(F.lit(0.0))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits
    (lexicographically-first language wins ties; 'und' = undetermined
    when no stopwords hit at all)."""
    langs = sorted(STOPWORDS)
    hits = {lg: stopword_hits(col, lg) for lg in langs}
    best = F.greatest(*[hits[lg] for lg in langs])
    expr = F.lit("und")
    # build reverse so earlier langs take precedence in the final CASE
    for lg in reversed(langs):
        expr = F.when((best > 0) & (hits[lg] == best), F.lit(lg)).otherwise(expr)
    return expr


def punct_ratio(col: Column) -> Column:
    """Non-alphanumeric-non-space chars / all chars (0.0 when empty)."""
    total = F.length(col)
    stripped = F.length(F.regexp_replace(col, r"[^A-Za-z0-9\s]", ""))
    return F.when(total > 0, (total - stripped) / total).otherwise(F.lit(0.0))


def mean_word_length(col: Column) -> Column:
    toks = ws_tokens(col)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def quality_score(col: Column, lang: str = "en") -> Column:
    """Composite quality in [0,1] — the classic web-text heuristics
    (length, punctuation density, stopword density, word-length sanity):

        0.25·min(1, n_chars/500)
      + 0.25·(1 − min(1, 2·punct_ratio))
      + 0.30·min(1, 4·stopword_ratio)
      + 0.20·(1 if 3 ≤ mean_word_len ≤ 10 else 0)
    """
    length_term = F.least(F.lit(1.0), F.length(col) / F.lit(500.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(col) * 2)
    stop_term = F.least(F.lit(1.0), stopword_ratio(col, lang) * 4)
    mwl = mean_word_length(col)
    word_term = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        length_term * 0.25 + punct_term * 0.25 + stop_term * 0.30 + word_term * 0.20
    )


def make_text_profile_udf(lang: str = "en"):
    """One-pass Arrow UDF computing (lang_id, quality_score, fingerprint)
    — the fast path for the combined text-profile query. Semantics are
    identical to the Column versions (:func:`lang_id`,
    :func:`quality_score`, :func:`fingerprint` with k=5), including the
    floating-point evaluation order of quality_score; equality is gated
    by the DuckDB oracle test. Self-contained closure (executors need no
    package import)."""
    stopwords = {lg: set(ws) for lg, ws in STOPWORDS.items()}
    langs = sorted(stopwords)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("lid string, quality double, fp string")
    def _profile(text):
        import hashlib as _hl
        import re as _re

        import pandas as _pd

        non_alnum = _re.compile(r"[^A-Za-z0-9\s]")
        rows = []
        for t in text:
            t = t or ""
            toks = [x for x in t.strip().split(" ") if x]
            n = len(toks)
            lowered = [x.lower() for x in toks]
            hits = {lg: sum(1 for x in lowered if x in stopwords[lg]) for lg in langs}
            best = max(hits.values()) if hits else 0
            lid = "und"
            if best > 0:
                for lg in langs:
                    if hits[lg] == best:
                        lid = lg
                        break
            nchars = len(t)
            stripped = len(non_alnum.sub("", t))
            punct = (nchars - stripped) / nchars if nchars > 0 else 0.0
            stop_ratio = (hits.get(lang, 0) / n) if n > 0 else 0.0
            mwl = (sum(len(x) for x in toks) / n) if n > 0 else 0.0
            quality = (
                min(1.0, nchars / 500.0) * 0.25
                + (1.0 - min(1.0, punct * 2)) * 0.25
                + min(1.0, stop_ratio * 4) * 0.30
                + (1.0 if 3 <= mwl <= 10 else 0.0) * 0.20
            )
            if n >= 5:
                fp = min(
                    _hl.md5(" ".join(toks[i : i + 5]).encode()).hexdigest()
                    for i in range(n - 4)
                )
            else:
                fp = _hl.md5(t.encode()).hexdigest()
            rows.append((lid, quality, fp))
        return _pd.DataFrame(rows, columns=["lid", "quality", "fp"])

    return _profile


def shingles(col: Column, k: int = 5) -> Column:
    """k-token shingles (array of space-joined k-grams); empty array when
    fewer than k tokens."""
    toks = ws_tokens(col)
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def fingerprint(col: Column, k: int = 5) -> Column:
    """Document fingerprint: min md5 over k-token shingles (a 1-perm
    MinHash — the rolling-hash-winnowing style content id). Documents
    shorter than k tokens fall back to md5 of the whole text."""
    sh = shingles(col, k)
    return F.when(
        F.size(sh) > 0, F.array_min(F.transform(sh, F.md5))
    ).otherwise(F.md5(col))
