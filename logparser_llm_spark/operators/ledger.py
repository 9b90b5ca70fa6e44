"""Drop ledger: per-document "why was this page dropped" provenance.

Every production cleaning pipeline is a funnel of filters (validity →
exact dedup → length → blocklist → …), and the first question its
owner asks when corpus volume moves between drops is WHERE the
documents went. Running the stages as separate queries cannot answer
that — a page failing three filters is triple-counted. The ledger
assigns every document exactly ONE stage by first-drop-wins
precedence, so the stage counts partition the corpus and the funnel
report is additive (the same reason CCNet/C4/RefinedWeb publish
attrition tables stage by stage).

Stages, in precedence order (first failure wins):

    invalid    NULL or whitespace-only text
    exact_dup  not the min-id holder of its md5(text) family
    too_short  fewer than ``min_words`` tokens
    badwords   any blocklisted token (C4 §2.2 semantics, reusing
               functions/quality.badwords_cols)
    kept       survived everything

The dedup family window runs over ALL rows (one corpus shuffle — the
dedup_exact shape): invalid rows form their own md5 families, which is
harmless because ``invalid`` outranks ``exact_dup`` in the CASE, and a
valid document can never share an md5 with an invalid one (the hash of
empty/whitespace text differs from any non-empty text's).

Exactness: every signal is integer (token counts via the repo
tokenizer, bad-token counts, the min-id comparison), and the stage is
a CASE over integer comparisons — a zero-tolerance cross-engine
contract. Scale shape: one md5-keyed window (the single corpus
shuffle) over a scan-bound JVM map stage computing all signals in the
same projection; the funnel rollup is one partial agg of the ledger
with the grand total broadcast back. No UDF, no driver loop.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LEDGER_STAGES = ("invalid", "exact_dup", "too_short", "badwords", "kept")


def drop_ledger(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int,
    badwords: Sequence[str],
) -> DataFrame:
    """Per-document drop ledger. Output: ``(id_col, n_words, n_bad,
    is_first, stage)`` — exactly one row per input row, ``stage`` one
    of :data:`LEDGER_STAGES` by first-drop-wins precedence."""
    from ..functions.quality import badwords_cols
    from ..functions.text import lower_tokens

    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")
    bw = badwords_cols(F.col(text_col), words=badwords)
    sig = df.select(
        F.col(id_col),
        F.col(text_col),
        # coalesce BEFORE tokenizing: size(split(NULL)) is -1, not 0
        F.size(lower_tokens(F.coalesce(F.col(text_col), F.lit(""))))
        .cast("bigint").alias("n_words"),
        bw["n_bad_words"].alias("n_bad"),
        (F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) == 0)
        .alias("_invalid"),
    )
    fam = Window.partitionBy(F.md5(F.coalesce(F.col(text_col), F.lit(""))))
    with_first = sig.select(
        id_col, "n_words", "n_bad", "_invalid",
        (F.min(id_col).over(fam) == F.col(id_col)).alias("is_first"),
    )
    return with_first.select(
        id_col, "n_words", "n_bad", "is_first",
        F.when(F.col("_invalid"), F.lit("invalid"))
        .when(~F.col("is_first"), F.lit("exact_dup"))
        .when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("n_bad") > 0, F.lit("badwords"))
        .otherwise(F.lit("kept"))
        .alias("stage"),
    )


def drop_ledger_sql(
    *,
    rel: str,
    id_col: str,
    text_col: str,
    min_words: int,
    badwords: Sequence[str],
) -> str:
    """DuckDB recompute of :func:`drop_ledger` — same signals, same
    family window, same CASE precedence, generated here so the two
    spellings cannot drift."""
    from ..functions.quality import _check_badlist
    from ..functions.text import LOWER_TOKENS_SQL

    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")
    _check_badlist(badwords, ())
    toks = LOWER_TOKENS_SQL.format(c=f"coalesce({text_col}, '')")
    wlist = "[" + ", ".join(f"'{w}'" for w in badwords) + "]"
    return f"""
        with _dl_sig as (
          select {id_col},
                 len({toks})::BIGINT as n_words,
                 len(list_filter({toks},
                     t -> list_contains({wlist}, t)))::BIGINT as n_bad,
                 (length(trim(coalesce({text_col}, ''))) = 0) as _invalid,
                 (min({id_col}) over (
                    partition by md5(coalesce({text_col}, ''))
                  ) = {id_col}) as is_first
          from {rel}
        )
        select {id_col}, n_words, n_bad, is_first,
               case when _invalid then 'invalid'
                    when not is_first then 'exact_dup'
                    when n_words < {min_words} then 'too_short'
                    when n_bad > 0 then 'badwords'
                    else 'kept' end as stage
        from _dl_sig
    """


def drop_funnel(ledger: DataFrame) -> DataFrame:
    """Attrition rollup of a :func:`drop_ledger` frame: one row per
    stage — ``(stage, n_docs, share_e6)`` with the share of the whole
    corpus e6-quantized once. The stages partition the corpus, so
    ``sum(n_docs)`` is exactly the input row count. One partial agg;
    the one-row grand total broadcasts back."""
    cnt = ledger.groupBy("stage").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = cnt.agg(F.sum("n_docs").alias("_t"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "stage", "n_docs",
            F.round(
                F.lit(1_000_000.0) * F.col("n_docs").cast("double")
                / F.col("_t").cast("double")
            ).cast("bigint").alias("share_e6"),
        )
    )


def drop_funnel_sql(*, ledger_sql: str) -> str:
    """DuckDB recompute of :func:`drop_funnel` over a ledger query."""
    return f"""
        with _df_ledger as ({ledger_sql}),
        _df_cnt as (
          select stage, count(*)::BIGINT as n_docs
          from _df_ledger group by 1
        )
        select stage, n_docs,
               cast(round(1000000.0 * cast(n_docs as double)
                    / cast((select sum(n_docs) from _df_cnt) as double))
                    as bigint) as share_e6
        from _df_cnt
    """


def dup_family_histogram(
    df: DataFrame, text_col: str
) -> DataFrame:
    """Duplicate-family SIZE distribution — the corpus-health summary
    read after every dedup pass: how much of the corpus is singleton
    (unique), how much sits in small families, and whether a
    pathological mega-family exists (one boilerplate page crawled a
    million times — the row that tells you to cap, not dedup). One
    row per family size: ``(family_size, n_families, n_docs,
    docs_share_e6)`` with the doc-mass share of the whole corpus
    e6-quantized once.

    Two partially-aggregable counts stacked — md5(text) → family
    size, then size → family count; the second histogram is bounded
    by distinct family sizes (tiny at any corpus scale), so the
    grand-total broadcast and share division run on a frame of at
    most a few thousand rows. NULL text hashes as empty (one family
    with every NULL/empty doc — the silent-drop lesson)."""
    fam = df.groupBy(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h")
    ).agg(F.count(F.lit(1)).alias("_fs"))
    hist = fam.groupBy(F.col("_fs").alias("family_size")).agg(
        F.count(F.lit(1)).alias("n_families")
    )
    tot = hist.agg(
        F.sum(F.col("family_size") * F.col("n_families")).alias("_t")
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "family_size", "n_families",
            (F.col("family_size") * F.col("n_families")).alias("n_docs"),
            F.round(
                F.lit(1_000_000.0)
                * (F.col("family_size") * F.col("n_families"))
                .cast("double")
                / F.col("_t").cast("double")
            ).cast("bigint").alias("docs_share_e6"),
        )
    )


def dup_family_histogram_sql(*, rel: str, text_col: str) -> str:
    """DuckDB recompute of :func:`dup_family_histogram`."""
    return f"""
        with _dfh_fam as (
          select md5(coalesce({text_col}, '')) as h, count(*)::BIGINT as fs
          from {rel} group by 1
        ),
        _dfh_hist as (
          select fs as family_size, count(*)::BIGINT as n_families
          from _dfh_fam group by 1
        )
        select family_size, n_families,
               (family_size * n_families)::BIGINT as n_docs,
               cast(round(1000000.0
                 * cast(family_size * n_families as double)
                 / cast((select sum(family_size * n_families)
                         from _dfh_hist) as double)) as bigint)
                 as docs_share_e6
        from _dfh_hist
    """
