"""Association-rule pair mining (Agrawal & Srikant 1994, A-Priori's
pair pass): co-occurring item pairs across baskets with exact integer
support / confidence / lift — the market-basket statistic every event
pipeline publishes ("users who hit `error` in a session also hit
`retry`"). The reference repo has no analytics beyond template counts
(parity: this is a training/analytics-pipeline extension, like the
PMI/funnel/retention family it joins).

Definitions (B = set of baskets, items deduplicated within a basket):

    support(a,b)   = pair_n                     (baskets containing both)
    conf(a→b)_e3   = 1000 · pair_n // a_n       (permille, exact)
    lift(a,b)_e6   = 1e6 · pair_n · NB // (a_n · b_n)

All pure bigint: no floats, no logs — Spark, DuckDB and Python agree
bit-exactly. Independence reads lift_e6 ≈ 1e6. The bigint headroom
bounds NB ≤ 3e6 baskets per invocation (pair_n ≤ NB so
pair_n·NB·1e6 < 2^63); the guard is WOVEN into the kept lift
expression (assert_true — a side column would be pruned and never
run). Beyond 3e6 baskets, shard by basket-hash and merge counts.

Scale shape: one groupBy collapses the corpus to distinct
(basket, item) rows; pair generation is a per-basket array self-pair
(collect_set → sorted array → flattened upper-triangle transform, all
JVM — no Python, no cross-basket shuffle) guarded by
``max_items_per_basket`` so a degenerate basket cannot square; the
pair and item counts are partially-aggregable groupBys whose outputs
are vocabulary-sized, so the enrichment joins broadcast. The DuckDB
oracle deliberately uses the INDEPENDENT self-join formulation.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NB_MAX = 3_000_000
DEFAULT_MAX_ITEMS_PER_BASKET = 1_000


def assoc_pairs(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
    *,
    min_support: int = 5,
    k: int = 100,
    nb_max: int = NB_MAX,
    max_items_per_basket: int = DEFAULT_MAX_ITEMS_PER_BASKET,
) -> DataFrame:
    """Top-``k`` item pairs by integer lift (desc), tiebroken by
    ``(item_a, item_b)`` lexicographically.

    Output: ``(item_a, item_b, pair_n, a_n, b_n, conf_ab_e3,
    conf_ba_e3, lift_e6)`` with ``item_a < item_b``. NULL items are
    dropped (a NULL event type is not an item). ``nb_max`` exists so
    tests can trip the headroom guard on small corpora.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0 < nb_max <= NB_MAX:
        raise ValueError(f"nb_max must be in 1..{NB_MAX}")
    if max_items_per_basket < 2:
        raise ValueError("max_items_per_basket must be >= 2")
    items = (
        df.where(F.col(item_col).isNotNull())
        .select(*basket_cols, F.col(item_col).alias("__it"))
        .distinct()
    )
    nb = items.select(*basket_cols).distinct().agg(
        F.count(F.lit(1)).alias("__nb")
    )
    c = items.groupBy("__it").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    baskets = items.groupBy(*basket_cols).agg(
        F.array_sort(F.collect_set("__it")).alias("__arr")
    )
    # upper-triangle pairs from the sorted per-basket array — JVM HOFs,
    # size-guarded so one degenerate basket can't emit size² rows
    arr_ok = F.when(
        F.expr(
            f"assert_true(size(__arr) <= {max_items_per_basket},"
            " 'assoc_pairs: basket exceeds max_items_per_basket')"
        ).isNull(),
        F.col("__arr"),
    )
    pairs_col = F.expr(
        "flatten(transform(__arr, (x, i) ->"
        " transform(slice(__arr, i + 2, size(__arr)), y ->"
        " struct(x as item_a, y as item_b))))"
    )
    pair_rows = (
        baskets.select(arr_ok.alias("__arr"))
        .select(F.explode(pairs_col).alias("p"))
        .select(F.col("p.item_a"), F.col("p.item_b"))
    )
    pc = (
        pair_rows.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_n"))
        .where(F.col("pair_n") >= min_support)
    )
    scored = (
        pc.join(
            F.broadcast(c.select(F.col("__it").alias("item_a"), F.col("c").alias("a_n"))),
            "item_a",
        )
        .join(
            F.broadcast(c.select(F.col("__it").alias("item_b"), F.col("c").alias("b_n"))),
            "item_b",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "pair_n",
            "a_n",
            "b_n",
            F.expr("(pair_n * 1000) div a_n").cast("bigint").alias("conf_ab_e3"),
            F.expr("(pair_n * 1000) div b_n").cast("bigint").alias("conf_ba_e3"),
            F.when(
                F.expr(
                    f"assert_true(__nb <= {nb_max},"
                    " 'assoc_pairs: corpus over bigint lift headroom')"
                ).isNull(),
                F.expr("(pair_n * __nb * 1000000) div (a_n * b_n)"),
            )
            .cast("bigint")
            .alias("lift_e6"),
        )
    )
    return scored.orderBy(
        F.col("lift_e6").desc(), F.col("item_a"), F.col("item_b")
    ).limit(k)


def assoc_pairs_sql(
    *,
    rel: str,
    basket_exprs: list[str],
    item_expr: str,
    min_support: int = 5,
    k: int = 100,
) -> str:
    """DuckDB twin of :func:`assoc_pairs` — independent formulation
    (distinct-items self-join instead of the array upper triangle).

    Each basket expression is either a bare column name or
    ``"<expr> as <alias>"``; the self-join keys on the alias names.
    """
    def _alias(e: str) -> str:
        lower = e.lower()
        return e[lower.rindex(" as ") + 4 :].strip() if " as " in lower else e

    bk = ", ".join(basket_exprs)
    keys = ", ".join(_alias(e) for e in basket_exprs)
    return f"""
        with items as (
          select distinct {bk}, {item_expr} as it
          from {rel} where {item_expr} is not null
        ),
        nb as (select count(*)::BIGINT as nb
               from (select distinct {keys} from items)),
        c as (select it, count(*)::BIGINT as c from items group by 1),
        pc as (
          select a.it as item_a, b.it as item_b,
                 count(*)::BIGINT as pair_n
          from items a join items b
            using ({keys})
          where a.it < b.it
          group by 1, 2
          having count(*) >= {min_support}
        )
        select item_a, item_b, pair_n,
               ca.c as a_n, cb.c as b_n,
               (pair_n * 1000 // ca.c)::BIGINT as conf_ab_e3,
               (pair_n * 1000 // cb.c)::BIGINT as conf_ba_e3,
               (pair_n * nb.nb * 1000000 // (ca.c * cb.c))::BIGINT as lift_e6
        from pc
          join c ca on pc.item_a = ca.it
          join c cb on pc.item_b = cb.it
          cross join nb
        order by lift_e6 desc, item_a, item_b
        limit {k}
    """


def assoc_pairs_py(
    baskets: list[list[str]], *, min_support: int = 5, k: int = 100
) -> list[tuple]:
    """Driver-side reference for :func:`assoc_pairs` (differential
    tests): same dedup, counts and integer arithmetic."""
    sets = [set(x for x in b if x is not None) for b in baskets]
    sets = [s for s in sets if s]
    nb = len(sets)
    c: dict = {}
    pc: dict = {}
    for s in sets:
        for it in s:
            c[it] = c.get(it, 0) + 1
        for a, b in combinations(sorted(s), 2):
            pc[(a, b)] = pc.get((a, b), 0) + 1
    out = [
        (a, b, n, c[a], c[b],
         n * 1000 // c[a], n * 1000 // c[b],
         n * nb * 1_000_000 // (c[a] * c[b]))
        for (a, b), n in pc.items()
        if n >= min_support
    ]
    out.sort(key=lambda r: (-r[7], r[0], r[1]))
    return out[:k]
