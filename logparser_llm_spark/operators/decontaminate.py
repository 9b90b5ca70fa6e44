"""Benchmark decontamination: flag corpus documents sharing any n-token
gram with an evaluation set — the train/test-overlap removal step every
published LLM data pipeline runs (the GPT-3 appendix's 13-gram rule,
Llama/Dolma's variants) so benchmark answers don't leak into training
data.

Scale shape — the whole point at 100 TB: the BENCHMARK side is tiny
(eval suites are a few MB against a 100 TB corpus), so its distinct
gram-hash set collapses to ONE row and broadcasts; the corpus side is
then scan + map only — per-document grams and an ``array_intersect``
against the broadcast set, ZERO shuffle over the big table (the
aggregate the registered query adds on top is partially aggregable).
No explode of the corpus gram stream, no join keyed on grams (which
would shuffle ~n_tokens rows of the 100 TB side).

Grams are md5 hashes of space-joined token windows (``functions.text.
shingles`` — the module's shared shingle definition), so the broadcast
set stays ~32 B/gram and the same construction renders verbatim in
DuckDB for the registered query's oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles

DECON_N = 5  # token-gram width (13 in the GPT-3 rule; 5 fits the corpus)


def gram_hashes(text_col, n: int = DECON_N):
    """Distinct md5 n-gram hashes of ``text_col`` as a sorted array
    (pure expression — stays in the scan stage). NULL text ⇒ empty
    array (no grams, never contaminated)."""
    return F.array_sort(
        F.array_distinct(F.transform(shingles(F.coalesce(text_col, F.lit("")), n), F.md5))
    )


def benchmark_gram_row(bench: DataFrame, text_col: str, n: int = DECON_N) -> DataFrame:
    """The benchmark's distinct gram-hash set as ONE one-column row
    (``bench_grams array<string>``, sorted) — the broadcastable form.
    Rows whose text has fewer than ``n`` tokens contribute nothing
    (they have no n-grams to leak)."""
    return (
        bench.select(F.explode(gram_hashes(F.col(text_col), n)).alias("g"))
        .agg(F.array_sort(F.collect_set("g")).alias("bench_grams"))
    )


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bench: DataFrame,
    bench_text_col: str,
    *,
    n: int = DECON_N,
) -> DataFrame:
    """Per-document contamination verdict against the benchmark: every
    input column plus ``(n_grams, n_hit, contaminated)`` where
    ``n_grams`` is the document's distinct n-gram count, ``n_hit`` how
    many of them appear anywhere in the benchmark, and ``contaminated``
    is ``n_hit > 0`` — so the keep-clean filter is just
    ``.where(~F.col("contaminated"))``. Documents shorter than ``n``
    tokens have no grams and are never contaminated (the published
    rules share this floor).

    Plan: one-row broadcast nested-loop join (the benchmark set) +
    per-row array intersect — the corpus side never shuffles."""
    if id_col not in df.columns:  # id participates in the contract
        raise ValueError(f"id_col {id_col!r} not in {df.columns}")
    grams_row = benchmark_gram_row(bench, bench_text_col, n)
    g = gram_hashes(F.col(text_col), n)
    return (
        df.crossJoin(F.broadcast(grams_row))
        .select(
            *[df[c] for c in df.columns],
            F.size(g).cast("bigint").alias("n_grams"),
            F.size(F.array_intersect(g, F.coalesce("bench_grams", F.array())))
            .cast("bigint")
            .alias("n_hit"),
        )
        .withColumn("contaminated", F.col("n_hit") > 0)
    )


def decontaminate_sql(
    corpus_cte: str,
    id_expr: str,
    text_expr: str,
    bench_cte: str,
    bench_text_expr: str,
    *,
    n: int = DECON_N,
) -> str:
    """DuckDB rendering of the same verdict (generated here — the
    zero-drift pattern): CTE chain ending in
    ``decon(id, n_grams, n_hit, contaminated)``. The relational form
    (distinct-gram join) is an independent algorithm for the same
    semantics — it recomputes every gram, so a tokenization or window
    bug on either side breaks the hash."""
    from ..functions.text import TOKENS_SQL as toks
    gram = (
        "select distinct id, md5(array_to_string(tk[i:i+{last}], ' ')) as g\n"
        "        from {src}, lateral (select unnest(range(1, len(tk) - {nm2})) as i)\n"
        "        where len(tk) >= {n}"
    )
    return f"""
      decon_corpus as (
        select {id_expr} as id, {toks.format(c=text_expr)} as tk from {corpus_cte}
      ),
      decon_bench as (
        select 0 as id, {toks.format(c=bench_text_expr)} as tk from {bench_cte}
      ),
      decon_bgrams as (
        select distinct g from (
          {gram.format(src='decon_bench', last=n - 1, nm2=n - 2, n=n)}
        )
      ),
      decon_dgrams as (
        {gram.format(src='decon_corpus', last=n - 1, nm2=n - 2, n=n)}
      ),
      decon as (
        select c.id,
               coalesce(d.n_grams, 0)::BIGINT as n_grams,
               coalesce(h.n_hit, 0)::BIGINT as n_hit,
               coalesce(h.n_hit, 0) > 0 as contaminated
        from decon_corpus c
        left join (
          select id, count(*) as n_grams from decon_dgrams group by id
        ) d using (id)
        left join (
          select dg.id, count(*) as n_hit
          from decon_dgrams dg join decon_bgrams b on dg.g = b.g
          group by dg.id
        ) h using (id)
      )"""
