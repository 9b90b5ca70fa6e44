"""Training-data hygiene functions: PII redaction and repetition
signals (the Gopher-rules family) — pure Column expressions (JVM,
codegen) with md5-checkable outputs so DuckDB oracles can replicate
them byte-for-byte.

PII patterns are deliberately RE2-compatible (no backrefs/lookaround)
so the exact same pattern strings run in Spark (Java regex) and DuckDB
(RE2) with identical match sets — the cross-engine redaction hash is
the correctness anchor.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: specific → general (an IP inside a phone-ish digit run
# must be taken by the IP rule first); applied as a chain in this order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,2}[ .-]?\(\d{3}\)[ .-]?\d{3}[ .-]?\d{4}|\b\d{3}[.-]\d{3}[.-]\d{4}\b", "<PHONE>"),
]


def redact_pii_col(col: Column) -> Column:
    """Chained redaction, fixed order (email → ip → phone)."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count_col(col: Column, kind: str) -> Column:
    """Match count for one PII kind (on the ORIGINAL text)."""
    pattern = next(p for name, p, _ in PII_PATTERNS if name == kind)
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("bigint")


def pii_redact_sql(expr: str) -> str:
    """DuckDB rendering of the same chain (same patterns, same order)."""
    out = expr
    for _, pattern, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out


def pii_count_sql(expr: str, kind: str) -> str:
    pattern = next(p for name, p, _ in PII_PATTERNS if name == kind)
    return f"cast(len(regexp_extract_all({expr}, '{pattern}')) as bigint)"


# --- repetition signals (Gopher-style) ------------------------------------

def dup_token_fraction(tokens: Column) -> Column:
    """1 − distinct/total: how much of the doc is repeated tokens."""
    n = F.size(tokens)
    return F.when(
        n > 0, 1.0 - F.size(F.array_distinct(tokens)) / n.cast("double")
    ).otherwise(F.lit(0.0))


def top_token_fraction(tokens: Column) -> Column:
    """Frequency share of the single most common token — the word-level
    analogue of Gopher's top-n-gram fraction. Interpreted higher-order
    expression (O(distinct×n) per row): fine for profiling passes; for a
    full-corpus hot path use the Arrow text-profile UDF pattern."""
    n = F.size(tokens)
    counts = F.transform(
        F.array_distinct(tokens),
        lambda t: F.size(F.filter(tokens, lambda x: x == t)),
    )
    return F.when(n > 0, F.array_max(counts) / n.cast("double")).otherwise(F.lit(0.0))


# --- Gopher document-quality rules (Rae et al. 2021, Appendix A1.1) --------
#
# The published rule set, restated in INTEGER arithmetic only (every
# threshold is a rational, so `ratio > 0.1` becomes `10*num > den`):
# no floats anywhere, which is what lets the DuckDB oracle reproduce
# every signal and verdict bit for bit. Signals are plain Column
# expressions over whitespace tokens and newline-split lines — pure
# JVM, zero exchanges, whole-stage codegen: the shape a 100 TB
# filtering pass must have (one scan, one map stage).

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BULLETS = ("• ", "- ", "* ")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000


def gopher_signal_cols(col: Column) -> dict[str, Column]:
    """The raw integer signals the rules compare. Words are whitespace
    tokens of the whitespace-normalized text (so newlines split words);
    lines are the non-blank newline splits of the RAW text."""
    flat = F.regexp_replace(col, r"\s+", " ")
    toks = F.filter(F.split(F.trim(flat), " "), lambda t: t != F.lit(""))
    lines = F.filter(F.split(col, "\n"), lambda l: F.trim(l) != F.lit(""))
    bullet = F.filter(
        lines,
        lambda l: F.trim(l).startswith(GOPHER_BULLETS[0])
        | F.trim(l).startswith(GOPHER_BULLETS[1])
        | F.trim(l).startswith(GOPHER_BULLETS[2]),
    )
    stops = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    sig = {
        "n_words": F.size(toks),
        "word_chars": F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.length(t)
        ),
        "n_lines": F.size(lines),
        "n_hash": F.size(F.regexp_extract_all(col, F.lit("#"), 0)),
        "n_ellipsis": F.size(F.regexp_extract_all(col, F.lit(r"\.\.\."), 0)),
        "n_bullet_lines": F.size(bullet),
        "n_ellipsis_end": F.size(F.filter(lines, lambda l: l.endswith("..."))),
        "n_alpha_words": F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))),
        "n_stop_distinct": F.size(
            F.array_distinct(F.filter(toks, lambda t: F.array_contains(stops, t)))
        ),
    }
    return {k: v.cast("bigint") for k, v in sig.items()}


def gopher_rule_cols(sig: dict[str, Column]) -> dict[str, Column]:
    """Rule verdicts from the signals (integer comparisons only).
    ok_* is True when the document PASSES that rule; keep = all pass."""
    rules = {
        # 50 <= words <= 100k
        "ok_words": (sig["n_words"] >= GOPHER_MIN_WORDS)
        & (sig["n_words"] <= GOPHER_MAX_WORDS),
        # mean word length in [3, 10]
        "ok_mean_len": (sig["word_chars"] >= 3 * sig["n_words"])
        & (sig["word_chars"] <= 10 * sig["n_words"]),
        # '#'-or-'...' symbol-to-word ratio <= 0.1
        "ok_symbol": 10 * (sig["n_hash"] + sig["n_ellipsis"]) <= sig["n_words"],
        # <= 90% of lines start with a bullet
        "ok_bullet": 10 * sig["n_bullet_lines"] <= 9 * sig["n_lines"],
        # <= 30% of lines end with an ellipsis
        "ok_ellipsis_end": 10 * sig["n_ellipsis_end"] <= 3 * sig["n_lines"],
        # >= 80% of words contain an alphabetic character
        "ok_alpha": 10 * sig["n_alpha_words"] >= 8 * sig["n_words"],
        # >= 2 distinct stop words present
        "ok_stop": sig["n_stop_distinct"] >= 2,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    rules["keep"] = keep
    return rules


GOPHER_OUT_COLS = (
    "n_words", "word_chars", "n_lines", "n_hash", "n_ellipsis",
    "n_bullet_lines", "n_ellipsis_end", "n_alpha_words", "n_stop_distinct",
    "ok_words", "ok_mean_len", "ok_symbol", "ok_bullet", "ok_ellipsis_end",
    "ok_alpha", "ok_stop", "keep",
)


def gopher_sql(input_sql: str, text_col: str = "t", id_col: str = "doc_id") -> str:
    """DuckDB rendering of signals + rules, generated here so the two
    formulations cannot drift. ``input_sql`` must yield (id_col,
    text_col); returns a complete statement projecting id_col +
    GOPHER_OUT_COLS."""
    t = text_col
    toks = (
        "list_filter(string_split(trim(regexp_replace("
        f"{t}, '\\s+', ' ', 'g')), ' '), x -> x <> '')"
    )
    lines = f"list_filter(string_split({t}, chr(10)), l -> trim(l) <> '')"
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    bullets = " or ".join(f"trim(l) like '{b}%'" for b in GOPHER_BULLETS)
    sig = {
        "n_words": "len(tk)",
        "word_chars": (
            "coalesce(list_aggregate(list_transform(tk, x -> length(x)), 'sum'), 0)"
        ),
        "n_lines": "len(ln)",
        "n_hash": f"len(regexp_extract_all({t}, '#'))",
        "n_ellipsis": f"len(regexp_extract_all({t}, '\\.\\.\\.'))",
        "n_bullet_lines": f"len(list_filter(ln, l -> {bullets}))",
        "n_ellipsis_end": "len(list_filter(ln, l -> l like '%...'))",
        "n_alpha_words": "len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))",
        "n_stop_distinct": (
            f"len(list_distinct(list_filter(tk, x -> x in ({stops}))))"
        ),
    }
    parts = [f"cast({v} as bigint) as {k}" for k, v in sig.items()]
    rules = {
        "ok_words": (
            f"(n_words >= {GOPHER_MIN_WORDS} and n_words <= {GOPHER_MAX_WORDS})"
        ),
        "ok_mean_len": "(word_chars >= 3*n_words and word_chars <= 10*n_words)",
        "ok_symbol": "(10*(n_hash + n_ellipsis) <= n_words)",
        "ok_bullet": "(10*n_bullet_lines <= 9*n_lines)",
        "ok_ellipsis_end": "(10*n_ellipsis_end <= 3*n_lines)",
        "ok_alpha": "(10*n_alpha_words >= 8*n_words)",
        "ok_stop": "(n_stop_distinct >= 2)",
    }
    rule_parts = [f"{v} as {k}" for k, v in rules.items()]
    keep = " and ".join(rules.values())
    rule_parts.append(f"({keep}) as keep")
    return (
        f"with _gin as ({input_sql}),\n"
        f"_tk as (select {id_col}, {t}, {toks} as tk, {lines} as ln from _gin),\n"
        f"_sig as (select {id_col}, {t}, {', '.join(parts)} from _tk)\n"
        f"select {id_col}, "
        + ", ".join(c for c in GOPHER_OUT_COLS if c.startswith("n_") or c == "word_chars")
        + f", {', '.join(rule_parts)} from _sig"
    )


# --- C4 line/page cleaning (Raffel et al. 2020, §2.2) ----------------------
#
# Line rules: keep only lines that (a) end in a terminal punctuation
# mark, (b) contain >= 5 words, (c) do not contain the word
# "javascript". Page rules (on the RAW page, per the paper): drop any
# page containing "lorem ipsum" or a curly brace '{', and any page
# whose retained text has fewer than 3 sentences. The corpus-level
# three-sentence-span dedup step of C4 is the separate
# `exact_substring` operator (operators/dedup.py) — this module is the
# per-document pass. Everything is a pure JVM expression chain: one
# scan, zero exchanges.

C4_LINE_MIN_WORDS = 5
C4_TERMINAL_RE = '[.!?"]$'


def c4_kept_lines(col: Column) -> Column:
    """array<string> of the retained lines (trimmed)."""
    lines = F.transform(F.split(col, "\n"), lambda l: F.trim(l))
    return F.filter(
        lines,
        lambda l: l.rlike(C4_TERMINAL_RE)
        & (
            F.size(F.filter(F.split(l, " "), lambda t: t != F.lit("")))
            >= C4_LINE_MIN_WORDS
        )
        & ~F.lower(l).contains("javascript"),
    )


def c4_stats_cols(col: Column) -> dict[str, Column]:
    """Per-page outputs: line counts, retained text, sentence count,
    and the page verdict. `clean_text` is newline-joined retained lines
    (computed for every page so the md5 is comparable even on dropped
    pages)."""
    kept = c4_kept_lines(col)
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit("[.!?]"), 0))
    lines = F.filter(F.split(col, "\n"), lambda l: F.trim(l) != F.lit(""))
    page_kept = (
        (n_sent >= 3)
        & ~F.lower(col).contains("lorem ipsum")
        & ~col.contains("{")
    )
    return {
        "n_lines": F.size(lines).cast("bigint"),
        "n_kept_lines": F.size(kept).cast("bigint"),
        "n_sentences": n_sent.cast("bigint"),
        "page_kept": page_kept,
        "clean_md5": F.md5(clean),
    }


def c4_clean_frame(df, id_col: str, text_col: str):
    """Staged-select C4 pass over a frame — the hot-path form of
    :func:`c4_stats_cols` (which inlines the kept-lines filter into
    four sibling columns and so line-filters each page ~4× under
    interpreted HOFs; same CollapseProject lesson as the A1.1 rules).
    Output columns and semantics are identical."""
    t, i = F.col(text_col), F.col(id_col)
    lines = F.filter(F.split(t, "\n"), lambda l: F.trim(l) != F.lit(""))
    s1 = df.select(i, t, lines.alias("_ln"), c4_kept_lines(t).alias("_kept"))
    s2 = s1.select(
        i, t, "_ln", "_kept", F.array_join(F.col("_kept"), "\n").alias("_clean")
    )
    s3 = s2.select(
        i,
        F.size(F.col("_ln")).cast("bigint").alias("n_lines"),
        F.size(F.col("_kept")).cast("bigint").alias("n_kept_lines"),
        F.size(F.regexp_extract_all(F.col("_clean"), F.lit("[.!?]"), 0))
        .cast("bigint")
        .alias("n_sentences"),
        (~F.lower(t).contains("lorem ipsum") & ~t.contains("{")).alias("_page_ok"),
        F.md5(F.col("_clean")).alias("clean_md5"),
    )
    return s3.select(
        i,
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        ((F.col("n_sentences") >= 3) & F.col("_page_ok")).alias("page_kept"),
        "clean_md5",
    )


def c4_sql(input_sql: str, text_col: str = "t", id_col: str = "doc_id") -> str:
    """DuckDB rendering of the same line + page rules, generated here so
    the two formulations cannot drift. ``input_sql`` must yield
    (id_col, text_col); returns a complete statement projecting
    id_col + the five stats."""
    t = text_col
    kept = (
        f"list_filter(list_transform(string_split({t}, chr(10)),"
        " l -> trim(l)),"
        f" l -> regexp_matches(l, '{C4_TERMINAL_RE}')"
        f" and len(list_filter(string_split(l, ' '), x -> x <> ''))"
        f" >= {C4_LINE_MIN_WORDS}"
        " and not contains(lower(l), 'javascript'))"
    )
    lines = f"list_filter(string_split({t}, chr(10)), l -> trim(l) <> '')"
    return (
        f"with _cin as ({input_sql}),\n"
        f"_k as (select {id_col}, {t}, {kept} as kept, {lines} as ln,\n"
        # coalesce: DuckDB's array_to_string([]) is NULL while Spark's
        # array_join([]) is '' — a fully-dropped page must yield
        # md5('')/0/false on both sides (review r5)
        f"  coalesce(array_to_string({kept}, chr(10)), '') as clean from _cin)\n"
        f"select {id_col},\n"
        "  cast(len(ln) as bigint) as n_lines,\n"
        "  cast(len(kept) as bigint) as n_kept_lines,\n"
        "  cast(len(regexp_extract_all(clean, '[.!?]')) as bigint) as n_sentences,\n"
        "  (len(regexp_extract_all(clean, '[.!?]')) >= 3\n"
        f"   and not contains(lower({t}), 'lorem ipsum')\n"
        f"   and not contains({t}, '{{')) as page_kept,\n"
        "  md5(clean) as clean_md5\n"
        "from _k"
    )


# --- Gopher repetition rules (Rae et al. 2021, Appendix A1.2) ---------------
#
# The duplicate-line / duplicate-paragraph / top-n-gram half of the
# Gopher filter, same integer-arithmetic contract as A1.1 (thresholds
# are rationals → cross-multiplied integer comparisons, no floats).
# "Duplicate" counts EVERY member of a value group with >=2 occurrences
# (so [a, a, b] has 2 duplicate lines, not 1), per the paper's
# "fraction of lines that are duplicates". The top-n-gram char mass is
# occurrences × gram length; the denominator convention here is the
# total word characters (A1.1's word_chars) for grams and the total
# line/paragraph characters for the dup rules. Per-row work is
# O(L²) in the doc's token count — each document independent, pure
# map side, no shuffle; for web-page-sized documents that is the
# standard per-doc pass every published pipeline runs.

GOPHER_REP_OUT_COLS = (
    "n_lines", "dup_lines", "dup_line_chars", "line_chars",
    "n_paras", "dup_paras", "dup_para_chars", "para_chars",
    "word_chars", "top2_chars", "top3_chars",
    "ok_dup_lines", "ok_dup_line_chars", "ok_dup_paras",
    "ok_dup_para_chars", "ok_top2", "ok_top3", "keep",
)


def _rep_units(col: Column) -> dict[str, Column]:
    """Shared arrays: non-blank trimmed lines/paragraphs and words."""
    def units(c, sep):
        return F.filter(
            F.transform(F.split(c, sep), lambda x: F.trim(x)),
            lambda x: x != F.lit(""),
        )

    flat = F.regexp_replace(col, r"\s+", " ")
    tk = F.filter(F.split(F.trim(flat), " "), lambda t: t != F.lit(""))
    return {"ln": units(col, "\n"), "pr": units(col, "\n\n"), "tk": tk}


def _grams(tk: Column, n: int) -> Column:
    """Space-joined word n-grams from an ALREADY-NAMED token column.
    ``tk`` must be a plain column reference, not the tokenizer
    expression: interpreted HOF lambdas have no subexpression sharing,
    so an inline tokenizer inside element_at re-tokenizes the document
    per gram element — measured ~74× slower on 2000-token docs (review
    r5). Building grams in a SECOND select after naming tk keeps the
    per-element work O(1)."""
    sz = F.size(tk)
    idx = F.when(sz >= n, F.sequence(F.lit(0), sz - n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tk, i + j + 1) for j in range(n)]
        ),
    )


def _chars(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0), lambda acc, v: acc + F.length(v))


# Spark higher-order functions evaluate INTERPRETED, so per-row cost is
# lambda invocations, not codegen ops. The naive duplicate/top-gram
# formulations (nested filter per element) are O(L²) lambdas per doc —
# measured 40.5s at sf0.1 vs 1.8s for the O(L log L) sorted single-fold
# forms below. The DuckDB oracle deliberately KEEPS the naive O(L²)
# algebra (native C++, instant at this scale): two independent
# formulations agreeing is a stronger check than one restated.


def _dup_stats(arr: Column) -> Column:
    """struct(cnt, chars): members of value groups occurring >= 2 times
    and their total characters — one fold over the sorted array (a
    group's 2nd member adds 2/2·len, later members add 1/len)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("cnt"),
        F.lit(0).alias("chars"),
    )

    def step(acc, v):
        run = F.when(v.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        add_c = F.when(run == 2, F.lit(2)).when(run > 2, F.lit(1)).otherwise(F.lit(0))
        add_h = (
            F.when(run == 2, 2 * F.length(v))
            .when(run > 2, F.length(v))
            .otherwise(F.lit(0))
        )
        return F.struct(
            v.alias("prev"),
            run.alias("run"),
            (acc["cnt"] + add_c).alias("cnt"),
            (acc["chars"] + add_h).alias("chars"),
        )

    return F.aggregate(
        F.array_sort(arr),
        init,
        step,
        lambda acc: F.struct(acc["cnt"].alias("cnt"), acc["chars"].alias("chars")),
    )


def _top_gram_chars(grams: Column) -> Column:
    """max over gram groups of occurrences × gram length (0 when no
    grams) — one fold over the sorted array: the running run×len of a
    group peaks at its full mass, so the running max over prefixes
    equals the max over groups."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, v):
        run = F.when(v.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            v.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run * F.length(v)).alias("best"),
        )

    return F.aggregate(F.array_sort(grams), init, step, lambda acc: acc["best"])


def gopher_repetition(df, id_col: str, text_col: str):
    """A1.2 signals + verdicts per document (staged selects so the
    expensive array pipelines evaluate once — see the A1.1 bench note).
    Verdict thresholds: dup lines 30% count / 20% chars, dup paragraphs
    30% / 20%, top 2-gram 20% of word chars, top 3-gram 18%."""
    units = _rep_units(F.col(text_col))
    with_units = df.select(
        F.col(id_col), *[v.alias(k) for k, v in units.items()]
    )
    # grams from the NAMED tk column (see _grams: inline tokenizer
    # inside the gram lambda is O(L²) under interpreted HOFs)
    with_arrays = with_units.select(
        F.col(id_col), "ln", "pr", "tk",
        _grams(F.col("tk"), 2).alias("g2"),
        _grams(F.col("tk"), 3).alias("g3"),
    )
    # dup stats as single-fold structs, staged so each fold runs once
    with_dups = with_arrays.select(
        F.col(id_col), "ln", "pr", "tk", "g2", "g3",
        _dup_stats(F.col("ln")).alias("dln"),
        _dup_stats(F.col("pr")).alias("dpr"),
    )
    sig = {
        "n_lines": F.size(F.col("ln")),
        "dup_lines": F.col("dln")["cnt"],
        "dup_line_chars": F.col("dln")["chars"],
        "line_chars": _chars(F.col("ln")),
        "n_paras": F.size(F.col("pr")),
        "dup_paras": F.col("dpr")["cnt"],
        "dup_para_chars": F.col("dpr")["chars"],
        "para_chars": _chars(F.col("pr")),
        "word_chars": _chars(F.col("tk")),
        "top2_chars": _top_gram_chars(F.col("g2")),
        "top3_chars": _top_gram_chars(F.col("g3")),
    }
    with_sig = with_dups.select(
        F.col(id_col), *[v.cast("bigint").alias(k) for k, v in sig.items()]
    )
    c = F.col
    rules = {
        "ok_dup_lines": 10 * c("dup_lines") <= 3 * c("n_lines"),
        "ok_dup_line_chars": 10 * c("dup_line_chars") <= 2 * c("line_chars"),
        "ok_dup_paras": 10 * c("dup_paras") <= 3 * c("n_paras"),
        "ok_dup_para_chars": 10 * c("dup_para_chars") <= 2 * c("para_chars"),
        "ok_top2": 100 * c("top2_chars") <= 20 * c("word_chars"),
        "ok_top3": 100 * c("top3_chars") <= 18 * c("word_chars"),
    }
    keep = None
    for r in rules.values():
        keep = r if keep is None else (keep & r)
    rules["keep"] = keep
    return with_sig.select(
        F.col(id_col),
        *[k for k in GOPHER_REP_OUT_COLS if k in sig],
        *[rules[k].alias(k) for k in GOPHER_REP_OUT_COLS if k in rules],
    )


def gopher_repetition_sql(
    input_sql: str, text_col: str = "t", id_col: str = "doc_id"
) -> str:
    """DuckDB rendering of :func:`gopher_repetition`, generated here so
    the formulations cannot drift."""
    t = text_col

    def units(sep):
        return (
            f"list_filter(list_transform(string_split({t}, {sep}),"
            " x -> trim(x)), x -> x <> '')"
        )

    tk = (
        "list_filter(string_split(trim(regexp_replace("
        f"{t}, '\\s+', ' ', 'g')), ' '), x -> x <> '')"
    )
    g2 = (
        "case when len(tk) >= 2 then list_transform(range(1, len(tk)),"
        " i -> tk[i] || ' ' || tk[i+1]) else [] end"
    )
    g3 = (
        "case when len(tk) >= 3 then list_transform(range(1, len(tk) - 1),"
        " i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) else [] end"
    )

    def dup(a):
        return f"list_filter({a}, v -> len(list_filter({a}, x -> x = v)) >= 2)"

    def chars(a):
        return f"coalesce(list_aggregate(list_transform({a}, v -> length(v)), 'sum'), 0)"

    def topg(a):
        return (
            f"coalesce(list_max(list_transform(list_distinct({a}),"
            f" u -> len(list_filter({a}, x -> x = u)) * length(u))), 0)"
        )

    sig = {
        "n_lines": "len(ln)",
        "dup_lines": f"len({dup('ln')})",
        "dup_line_chars": chars(dup("ln")),
        "line_chars": chars("ln"),
        "n_paras": "len(pr)",
        "dup_paras": f"len({dup('pr')})",
        "dup_para_chars": chars(dup("pr")),
        "para_chars": chars("pr"),
        "word_chars": chars("tk"),
        "top2_chars": topg("g2"),
        "top3_chars": topg("g3"),
    }
    rules = {
        "ok_dup_lines": "(10*dup_lines <= 3*n_lines)",
        "ok_dup_line_chars": "(10*dup_line_chars <= 2*line_chars)",
        "ok_dup_paras": "(10*dup_paras <= 3*n_paras)",
        "ok_dup_para_chars": "(10*dup_para_chars <= 2*para_chars)",
        "ok_top2": "(100*top2_chars <= 20*word_chars)",
        "ok_top3": "(100*top3_chars <= 18*word_chars)",
    }
    rule_parts = [f"{v} as {k}" for k, v in rules.items()]
    rule_parts.append(f"({' and '.join(rules.values())}) as keep")
    sig_parts = [f"cast({v} as bigint) as {k}" for k, v in sig.items()]
    return (
        f"with _rin as ({input_sql}),\n"
        f"_ar as (select {id_col}, {units('chr(10)')} as ln,\n"
        f"  {units('chr(10) || chr(10)')} as pr, {tk} as tk from _rin),\n"
        f"_ar2 as (select *, {g2} as g2, {g3} as g3 from _ar),\n"
        f"_sig as (select {id_col}, {', '.join(sig_parts)} from _ar2)\n"
        f"select {id_col}, {', '.join(k for k in sig)}, {', '.join(rule_parts)}\n"
        "from _sig"
    )


# --- C4 badwords filter (Raffel et al. 2020 §2.2, the blocklist step) ----
#
# C4 drops any page containing a word from the "List of Dirty, Naughty,
# Obscene or Otherwise Bad Words" (an external resource — callers supply
# their list; tests/queries use a small stand-in). Words match on TOKEN
# boundaries of the case-folded text (the lm/bm25 tokenizer — "word,"
# still matches); multi-word phrases match as case-folded substrings,
# counted by exact integer length arithmetic. Both signals are pure JVM
# expressions — a scan-bound map stage like the other C4 rules. The
# per-token list scan is O(L·W) interpreted work: fine for the classic
# ~400-entry list; a truly huge blocklist should go through the
# decontaminate-style broadcast-join shape instead (documented trade).

def badwords_cols(
    col: Column, *, words: Sequence[str], phrases: Sequence[str] = ()
) -> dict[str, Column]:
    """Signals: ``n_bad_words`` (token occurrences of blocklisted
    words), ``n_bad_phrases`` (substring occurrences of blocklisted
    phrases), ``ok_badwords`` (page keeps iff both are zero)."""
    _check_badlist(words, phrases)
    from .text import lower_tokens

    toks = lower_tokens(col)
    wlist = F.array(*[F.lit(w) for w in words])
    n_words = F.size(F.filter(toks, lambda t: F.array_contains(wlist, t)))
    lt = F.lower(col)
    n_phr = None
    for p in phrases:
        cnt = (
            (F.length(lt) - F.length(F.replace(lt, F.lit(p), F.lit(""))))
            / F.lit(len(p))
        ).cast("bigint")
        n_phr = cnt if n_phr is None else n_phr + cnt
    if n_phr is None:
        n_phr = F.lit(0).cast("bigint")
    n_words = F.coalesce(n_words.cast("bigint"), F.lit(0))
    n_phr = F.coalesce(n_phr, F.lit(0))
    return {
        "n_bad_words": n_words,
        "n_bad_phrases": n_phr,
        "ok_badwords": (n_words == 0) & (n_phr == 0),
    }


def _check_badlist(words: Sequence[str], phrases: Sequence[str]) -> None:
    if not words and not phrases:
        raise ValueError("blocklist is empty: supply words and/or phrases")
    import re as _re

    for w in words:
        # tokens are produced by the lower_tokens split on [^a-z0-9]+,
        # so a word containing anything else can never match a token —
        # reject it loudly instead of silently never firing (hyphenated
        # entries belong in `phrases`, which match as substrings)
        if not w or w != w.lower() or not _re.fullmatch("[a-z0-9]+", w):
            raise ValueError(
                f"blocklist words must be non-empty [a-z0-9]+ single tokens "
                f"(put punctuated/multi-word entries in phrases): {w!r}"
            )
    for p in phrases:
        if not p or p != p.lower() or "'" in p:
            # the single-quote ban keeps the generated SQL literal safe;
            # the tokenizer strips quotes anyway, so a quoted word could
            # never match on the Spark side either
            raise ValueError(
                f"blocklist phrases must be non-empty, lowercase, quote-free: {p!r}"
            )


def badwords_sql(
    input_sql: str,
    *,
    words: Sequence[str],
    phrases: Sequence[str] = (),
    text_col: str = "t",
    id_col: str = "doc_id",
) -> str:
    """DuckDB recompute of :func:`badwords_cols` over ``input_sql``,
    generated here so the two formulations cannot drift."""
    _check_badlist(words, phrases)
    from .text import LOWER_TOKENS_SQL

    wlist = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    # coalesce the text once so NULL pages read as empty — the Spark
    # side's coalesced zeros, not NULL signals
    lt = f"lower(coalesce({text_col}, ''))"
    toks = LOWER_TOKENS_SQL.format(c=f"coalesce({text_col}, '')")
    n_words = f"len(list_filter({toks}, t -> list_contains({wlist}, t)))"
    phr_terms = [
        f"((length({lt}) - length(replace({lt}, '{p}', ''))) // {len(p)})"
        for p in phrases
    ] or ["0"]
    return f"""
        with _bw as ({input_sql})
        select {id_col},
               {n_words}::BIGINT as n_bad_words,
               ({' + '.join(phr_terms)})::BIGINT as n_bad_phrases,
               ({n_words} = 0 and ({' + '.join(phr_terms)}) = 0) as ok_badwords
        from _bw
    """



# --- readability (Flesch-Kincaid grade / Flesch reading ease) --------------
# The classic prose-complexity signals, restated in exact integer
# arithmetic (micro-units) so the Spark and DuckDB spellings agree bit
# for bit. Syllables use the deterministic vowel-run heuristic: one
# syllable per maximal [aeiouy]+ run in the lowercased text, plus one
# for every vowel-less word (digits, acronyms) so no word counts zero —
# an approximation (all published syllable counters are), but a FIXED
# one, which is what a cross-engine contract needs. Sentences are
# terminal-punctuation runs ([.!?]+), clamped to >= 1 for non-empty
# text so unterminated prose still scores. All divisions are integer
# floor-divisions with non-negative operands (floor == truncate on
# every engine), taken AFTER scaling to e6 — the lm.py convention.

READABILITY_OUT_COLS = (
    "n_words", "n_sentences", "n_syllables", "fk_grade_e6", "ease_e6",
)


def readability_frame(df, id_col: str, text_col: str):
    """``(id, n_words, n_sentences, n_syllables, fk_grade_e6, ease_e6)``
    per document. ``fk_grade_e6`` = 10⁶·(0.39·w/s + 11.8·syll/w −
    15.59) (Kincaid et al. 1975), ``ease_e6`` = 10⁶·(206.835 −
    1.015·w/s − 84.6·syll/w) (Flesch 1948) — both spelled as integer
    floor-divisions of e6-scaled numerators, both NULL on empty/NULL
    text (the formulas are undefined at w = 0; zeros would fake
    "kindergarten prose"). Pure JVM expression chain, zero exchanges —
    the 100 TB scan-bound shape; signals are NAMED columns in a staged
    select before the arithmetic (the gopher HOF lesson), and the only
    interpreted HOF is the per-token vowel-less scan over the named
    token array."""
    from .text import ws_tokens

    t = F.coalesce(F.col(text_col), F.lit(""))
    sig = df.select(
        F.col(id_col),
        F.size(ws_tokens(t)).cast("bigint").alias("_w"),
        (F.size(F.split(t, "[.!?]+", -1)) - 1).cast("bigint").alias("_m"),
        (F.size(F.split(F.lower(t), "[aeiouy]+", -1)) - 1)
        .cast("bigint")
        .alias("_v"),
        F.size(F.filter(ws_tokens(t), lambda w: ~w.rlike("[aeiouyAEIOUY]")))
        .cast("bigint")
        .alias("_nv"),
    ).select(
        id_col,
        "_w",
        F.when(F.col("_w") > 0, F.greatest("_m", F.lit(1)))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("_s"),
        F.when(F.col("_w") > 0, F.col("_v") + F.col("_nv"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("_y"),
    )
    return sig.select(
        id_col,
        F.col("_w").alias("n_words"),
        F.col("_s").alias("n_sentences"),
        F.col("_y").alias("n_syllables"),
        F.when(
            F.col("_w") > 0,
            F.expr("390000 * _w div _s + 11800000 * _y div _w - 15590000"),
        )
        .cast("bigint")
        .alias("fk_grade_e6"),
        F.when(
            F.col("_w") > 0,
            F.expr("206835000 - 1015000 * _w div _s - 84600000 * _y div _w"),
        )
        .cast("bigint")
        .alias("ease_e6"),
    )


def readability_sql(
    input_sql: str, *, text_col: str = "t", id_col: str = "doc_id"
) -> str:
    """DuckDB recompute of :func:`readability_frame` over ``input_sql``
    (same tokenizer rendering, same clamps, same e6 floor-divisions),
    generated here so the two spellings cannot drift."""
    from .text import TOKENS_SQL

    t = f"coalesce({text_col}, '')"
    toks = TOKENS_SQL.format(c=t)
    return f"""
        with _rd0 as ({input_sql}),
        _rd1 as (
          select {id_col},
                 len({toks})::BIGINT as _w,
                 (len(regexp_split_to_array({t}, '[.!?]+')) - 1)::BIGINT
                   as _m,
                 (len(regexp_split_to_array(lower({t}), '[aeiouy]+')) - 1)
                   ::BIGINT as _v,
                 len(list_filter({toks},
                     w -> not regexp_matches(w, '[aeiouyAEIOUY]')))::BIGINT
                   as _nv
          from _rd0
        ),
        _rd2 as (
          select {id_col}, _w,
                 (case when _w > 0 then greatest(_m, 1) else 0 end)::BIGINT
                   as _s,
                 (case when _w > 0 then _v + _nv else 0 end)::BIGINT as _y
          from _rd1
        )
        select {id_col},
               _w as n_words, _s as n_sentences, _y as n_syllables,
               (case when _w > 0 then
                 390000 * _w // _s + 11800000 * _y // _w - 15590000
                end)::BIGINT as fk_grade_e6,
               (case when _w > 0 then
                 206835000 - 1015000 * _w // _s - 84600000 * _y // _w
                end)::BIGINT as ease_e6
        from _rd2
    """


def readability_py(text: str | None) -> tuple:
    """Reference: the five output values for one text."""
    import re as _re

    t = text or ""
    words = [w for w in t.strip().split(" ") if w]
    w = len(words)
    if w == 0:
        return 0, 0, 0, None, None
    s = max(len(_re.findall(r"[.!?]+", t)), 1)
    y = len(_re.findall(r"[aeiouy]+", t.lower())) + sum(
        1 for x in words if not _re.search(r"[aeiouyAEIOUY]", x)
    )
    fk = 390_000 * w // s + 11_800_000 * y // w - 15_590_000
    ease = 206_835_000 - 1_015_000 * w // s - 84_600_000 * y // w
    return w, s, y, fk, ease


# --- Wilson score lower bound (host/domain quality ranking) --------------

def _check_wilson_z(z_num: int, z_den: int) -> None:
    if z_num < 0 or z_den <= 0:
        raise ValueError(
            f"wilson z must be a non-negative rational, got {z_num}/{z_den}"
        )


def wilson_lower_e6(
    k: Column, n: Column, *, z_num: int = 49, z_den: int = 25
) -> Column:
    """Wilson score interval lower bound of the proportion ``k/n``,
    quantized once to integer e6 — the small-sample-honest way to rank
    hosts by a quality keep rate (E. Miller, "How Not to Sort by
    Average Rating"): a host with 2/2 kept docs must NOT outrank one
    with 180/200, and the Wilson lower bound is what a crawl
    prioritizer actually orders by.

    Cross-engine exactness: ``z = z_num/z_den`` is rational (default
    49/25 = 1.96, the 95% bound), so after multiplying through the
    closed form by ``2·n·z_den²`` the bound is

        (2·k·zd² + zn² − zn·sqrt(S / n)) / (2·(n·zd² + zn²)),
        S = 4·zd²·k·(n−k) + zn²·n

    with exactly ONE sqrt and TWO double divisions — every op
    (cast ≤ 2^53, mul, add, div, sqrt) is correctly rounded under
    IEEE 754, so identically spelled Spark and DuckDB expressions
    produce bit-identical doubles, and the single trailing HALF_UP e6
    quantization is a zero-tolerance cross-engine contract (sqrt is
    CORRECTLY rounded — a strictly safer determinism footing than the
    module's ln-based scores, which carry the documented ≤1-ulp libm
    caveat). Overflow discipline: the two quadratic-headroom products
    ``k·(n−k)`` (≤ n²/4) and the 4·zd² factor are kept apart —
    ``k·(n−k)`` is computed as an exact bigint (safe to n ≈ 6.1e9
    docs PER GROUP; beyond that Spark/DuckDB raise loudly rather than
    wrap) and the constant factor multiplies in double, so the whole
    expression is overflow-safe for any real host. k = 0 yields
    exactly 0 and k = n stays below 1e6, so the bound is always in
    [0, 1e6)."""
    _check_wilson_z(z_num, z_den)
    zd2, zn2 = z_den * z_den, z_num * z_num
    kd, nd = k.cast("bigint"), n.cast("bigint")
    s = (kd * (nd - kd)).cast("double") * F.lit(float(4 * zd2)) \
        + (F.lit(zn2) * nd).cast("double")
    num = (F.lit(2 * zd2) * kd + F.lit(zn2)).cast("double") \
        - F.lit(float(z_num)) * F.sqrt(s / nd.cast("double"))
    den = (F.lit(2) * (nd * F.lit(zd2) + F.lit(zn2))).cast("double")
    return F.round(F.lit(1_000_000.0) * num / den).cast("bigint")


def wilson_lower_e6_sql(
    k_expr: str, n_expr: str, *, z_num: int = 49, z_den: int = 25
) -> str:
    """DuckDB spelling of :func:`wilson_lower_e6`, generated here so
    the two expression trees cannot drift (same op order, one sqrt,
    two divisions, one HALF_UP round)."""
    _check_wilson_z(z_num, z_den)
    zd2, zn2 = z_den * z_den, z_num * z_num
    k, n = f"cast({k_expr} as bigint)", f"cast({n_expr} as bigint)"
    s = (f"cast({k} * ({n} - {k}) as double) * {float(4 * zd2)}"
         f" + cast({zn2} * {n} as double)")
    num = (f"cast({2 * zd2} * {k} + {zn2} as double)"
           f" - {float(z_num)} * sqrt(({s}) / cast({n} as double))")
    den = f"cast(2 * ({n} * {zd2} + {zn2}) as double)"
    return f"cast(round(1000000.0 * ({num}) / {den}) as bigint)"


def wilson_lower_e6_py(
    k: int, n: int, *, z_num: int = 49, z_den: int = 25
) -> int:
    """Driver-side reference (differential tests) — same op order."""
    import math as _math

    _check_wilson_z(z_num, z_den)
    zd2, zn2 = z_den * z_den, z_num * z_num
    s = float(k * (n - k)) * float(4 * zd2) + float(zn2 * n)
    num = float(2 * zd2 * k + zn2) - float(z_num) * _math.sqrt(s / float(n))
    den = float(2 * (n * zd2 + zn2))
    return _math.floor(1_000_000.0 * num / den + 0.5)
