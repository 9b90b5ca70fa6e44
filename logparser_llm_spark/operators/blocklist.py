"""Huge-blocklist document filtering as a distributed JOIN.

`functions/quality.py:badwords_cols` scans each document against a
SMALL in-expression word list — O(L·W) per row, the right trade for the
few-hundred-entry C4 list but a non-starter when the blocklist is a
TABLE (multi-million-entry URL/domain/phrase denylists, per-language
unions, licensing takedown lists). This module is the scale path that
module's docstring promises: tokenize once, reduce to per-(doc, token)
counts, and meet the blocklist in an ordinary equi-join — the list is
data, not code, so it can be any size and live in any table.

Scale shape (the part that must survive 100 TB × 10⁷ terms):

- ONE token explode feeds a partially-aggregable ``groupBy(id, token)``
  count, so a document repeating "viagra" 10⁶ times pre-reduces inside
  its map task — the shuffle carries distinct (doc, token) pairs, never
  the token stream.
- The blocklist meets the token frame in a plain equi-join on the
  token. Spark picks broadcast vs shuffle-hash by size (AQE) — at
  10⁷ terms the list side shuffles, which is exactly why this exists
  next to the in-expression variant; no UDF, no cartesian anywhere.
- Per-doc verdicts are one more partially-aggregable integer groupBy,
  then a left join back to the id universe so CLEAN documents emit a
  row too (hits 0 — the ADVICE-r4 silent-drop lesson).

Blocklist terms are matched on the single-sourced lowercased
alphanumeric tokenizer (`functions/text.py:lower_tokens` /
`LOWER_TOKENS_SQL`), so "Viagra!" and "viagra" are the same term and
the oracle cannot drift from any other token consumer. Terms that the
tokenizer would split (phrases, punctuation) are REJECTED loudly — a
phrase entry would silently never match otherwise; phrase semantics
are `decontaminate`'s gram-join shape, cross-referenced there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import LOWER_TOKENS_SQL, lower_tokens

_RESERVED = ("hits", "hit_terms", "clean", "_tok", "_cnt", "_term")


def blocklist_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocklist: DataFrame,
    term_col: str = "term",
) -> DataFrame:
    """Per-document blocklist verdicts → ``(id, hits, hit_terms,
    clean)``: total blocked-token occurrences, distinct blocked terms
    hit, and ``clean`` = no hit. Every input document emits exactly one
    row (NULL text counts as empty). See module docstring for the
    join-shape rationale vs the in-expression small-list variant."""
    if id_col in _RESERVED or text_col in _RESERVED:
        raise ValueError(f"reserved column name among {_RESERVED}")
    # single-token contract woven into the KEPT term expression (the
    # bigram_pmi dead-guard lesson): a phrase/punctuated entry would
    # tokenize to ≠1 token and silently never match.
    bl = (
        blocklist.select(lower_tokens(F.col(term_col)).alias("_ts"))
        .select(
            F.when(
                F.assert_true(
                    F.size("_ts") == 1,
                    F.concat(
                        F.lit("blocklist_join: entry is not a single "
                              "token under the shared tokenizer: "),
                        F.to_json(F.col("_ts")),
                    ),
                ).isNull(),
                F.col("_ts")[0],
            ).alias("_term")
        )
        .distinct()
    )
    toks = (
        df.select(
            F.col(id_col),
            F.explode(lower_tokens(F.coalesce(F.col(text_col), F.lit("")))
                      ).alias("_tok"),
        )
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    per_doc = (
        toks.join(bl, toks["_tok"] == bl["_term"])
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("hits"),
            F.count(F.lit(1)).alias("hit_terms"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.coalesce(F.col("hit_terms"), F.lit(0)).cast("long")
            .alias("hit_terms"),
            F.col("hits").isNull().alias("clean"),
        )
    )


def blocklist_join_sql(
    *,
    doc_source: str,
    id_col: str,
    text_col: str,
    blocklist_cte: str,
    term_col: str = "term",
) -> str:
    """DuckDB recompute of :func:`blocklist_join`, generated here so
    the two spellings cannot drift. ``blocklist_cte`` must yield the
    ``term_col`` column; terms are lowercased/tokenized with the shared
    template exactly like the Spark side."""
    tok_list = LOWER_TOKENS_SQL.format(c=f"coalesce({text_col}, '')")
    bl_tok = LOWER_TOKENS_SQL.format(c=term_col)
    return f"""
        with bl as (
          select distinct ({bl_tok})[1] as term
          from ({blocklist_cte})
        ),
        tok as (
          select {id_col}, t.tok, count(*) as cnt
          from {doc_source}, unnest({tok_list}) as t(tok)
          group by {id_col}, t.tok
        ),
        hit as (
          select tok.{id_col},
                 sum(tok.cnt) as hits,
                 count(*) as hit_terms
          from tok join bl on bl.term = tok.tok
          group by tok.{id_col}
        )
        select d.{id_col},
               cast(coalesce(h.hits, 0) as bigint) as hits,
               cast(coalesce(h.hit_terms, 0) as bigint) as hit_terms,
               h.{id_col} is null as clean
        from {doc_source} d left join hit h on h.{id_col} = d.{id_col}
    """


def blocklist_join_py(
    docs: dict,
    terms: list[str],
) -> dict:
    """Reference: ``docs`` maps id → text (or None); ``terms`` raw
    blocklist entries. Returns id → (hits, hit_terms, clean)."""
    import re

    from ..functions.text import TOKEN_SPLIT_RE

    def tok(s: str) -> list[str]:
        return [t for t in re.split(TOKEN_SPLIT_RE, (s or "").lower()) if t]

    bl = set()
    for t in terms:
        parts = tok(t)
        if len(parts) != 1:
            raise ValueError(f"not a single token: {t!r}")
        bl.add(parts[0])
    out = {}
    for i, text in docs.items():
        ts = tok(text)
        hits = sum(1 for t in ts if t in bl)
        hit_terms = len({t for t in ts if t in bl})
        out[i] = (hits, hit_terms, hits == 0)
    return out
