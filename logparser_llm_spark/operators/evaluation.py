"""Binary-classifier evaluation in exact integer arithmetic: the full
precision/recall/F1 operating curve and ROC-AUC over scored documents —
the EVALUATE step of the published quality-classifier recipes (GPT-3's
quality head, CCNet's language head, Gopher's rule filters are all
tuned by exactly these curves before a threshold ships).

The reference engine has no evaluation surface; this sits in the repo's
beyond-reference training-data tier and completes the classifier story:
train (operators/classifier.py) → predict → **evaluate** → pick the
production threshold.

Contract: scores are INTEGERS (the repo-wide quantized-score
convention — classifier micro-nats, DSIR micro-nats, token counts all
qualify), labels are booleans. Ties are handled exactly: the curve has
one row per DISTINCT score (every achievable operating point, nothing
interpolated), and AUC uses the Mann-Whitney rank form with the exact
tie term::

    AUC · (2·P·N) = Σ_s  pos_s · (2·neg_below_s + neg_s)

which is an integer, so ``auc_e6 = num · 1e6 // (2·P·N)`` is exact and
identical in Spark, DuckDB and Python — no float summation anywhere,
every division a floor of non-negative operands (Spark ``div`` ==
DuckDB ``//`` == Python ``//`` on non-negatives).

Scale shape (what must survive 100 TB): the corpus collapses FIRST into
a partially-aggregable per-distinct-score rollup ``(score, n, n_pos)``
— the only pass over the data, map-side combinable — and every curve /
AUC statistic is a window or sum over that rollup. The ordered window
runs single-partition BY DESIGN over the aggregated frame (the
burst_hours pattern: thousands-to-millions of rows however large the
corpus); if distinct quantized scores ever approach corpus cardinality,
pre-bucket the score (integer floor-divide by a coarser quantum — the
loghist sketch trade) before calling these.

Headroom: ``2·P·N·1e6`` must stay under 2^63, i.e. ``P·N ≤ 4.6e12``
(about three million documents per class). Enforced with a loud
``assert_true`` woven into the kept AUC expression (the bigram_pmi
lesson — a guard in a dropped column is pruned and never runs); beyond
that, evaluate on a deterministic sample (operators/sampling.py) or
widen to DECIMAL.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_E6 = 1_000_000
# P·N bound keeping 2·P·N·1e6 < 2^63
_PN_MAX = 4_600_000_000_000

_EVAL_RESERVED = (
    "score", "n", "n_pos", "n_neg", "tp", "fp", "fn",
    "precision_e6", "recall_e6", "f1_e6", "auc_e6",
)


def _check_eval_input(df: DataFrame, score_col: str, label_col: str) -> None:
    types = dict(df.dtypes)
    if score_col not in types:
        raise ValueError(f"unknown score column {score_col!r}")
    if label_col not in types:
        raise ValueError(f"unknown label column {label_col!r}")
    if types[score_col] not in ("int", "bigint", "smallint", "tinyint"):
        raise ValueError(
            f"score column {score_col!r} must be integral (got "
            f"{types[score_col]}) — quantize first, the repo-wide "
            "integer-score convention"
        )
    if types[label_col] != "boolean":
        raise ValueError(
            f"label column {label_col!r} must be boolean (got "
            f"{types[label_col]})"
        )


def _rollup(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """The one pass over the data: per-distinct-score counts,
    partially aggregable (map-side combinable)."""
    return (
        df.groupBy(F.col(score_col).cast("bigint").alias("score"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(label_col).cast("bigint")).alias("n_pos"),
        )
        .withColumn("n_neg", F.col("n") - F.col("n_pos"))
    )


def eval_curve(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Every achievable operating point of the decision rule
    ``predict positive iff score >= threshold``: one row per distinct
    score value, with exact integer confusion counts and floor-divided
    ``precision_e6`` / ``recall_e6`` / ``f1_e6``.

    Output: ``(score, n, n_pos, n_neg, tp, fp, fn, precision_e6,
    recall_e6, f1_e6)``. A corpus with zero positives raises at
    execution (recall is undefined); zero negatives is legal here
    (precision is still defined) — only AUC needs both classes.
    """
    _check_eval_input(df, score_col, label_col)
    r = _rollup(df, score_col, label_col)
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot_pos = F.sum("n_pos").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    scored = r.select(
        "score",
        "n",
        "n_pos",
        "n_neg",
        F.sum("n_pos").over(w).alias("tp"),
        F.sum("n_neg").over(w).alias("fp"),
        tot_pos.alias("__p"),
    )
    return scored.select(
        "score",
        "n",
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        (F.col("__p") - F.col("tp")).alias("fn"),
        F.expr(f"tp * {_E6} div (tp + fp)").alias("precision_e6"),
        # the guard is woven INTO the kept expression (assert_true is
        # NULL on success, raises on violation) — a side column would
        # be pruned by Catalyst and never run
        F.when(
            F.expr(
                "assert_true(__p > 0,"
                " 'eval_curve: no positive labels — recall undefined')"
            ).isNull(),
            F.expr(f"tp * {_E6} div __p"),
        ).alias("recall_e6"),
        F.expr(f"2 * tp * {_E6} div (2 * tp + fp + (__p - tp))").alias(
            "f1_e6"
        ),
    )


def eval_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """One-row ROC-AUC: ``(n_pos, n_neg, auc_e6)`` with
    ``auc_e6 = (Σ_s pos_s·(2·neg_below_s + neg_s)) · 1e6 // (2·P·N)``
    — the Mann-Whitney rank statistic with the exact midrank tie term,
    pure integer arithmetic. Raises at execution when either class is
    empty (AUC undefined) or ``P·N`` exceeds the bigint headroom."""
    _check_eval_input(df, score_col, label_col)
    r = _rollup(df, score_col, label_col)
    wb = Window.orderBy(F.col("score").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    terms = r.select(
        "n_pos",
        "n_neg",
        (
            F.col("n_pos")
            * (2 * F.coalesce(F.sum("n_neg").over(wb), F.lit(0)) + F.col("n_neg"))
        ).alias("__t"),
    )
    agg = terms.agg(
        F.sum("n_pos").alias("n_pos"),
        F.sum("n_neg").alias("n_neg"),
        F.sum("__t").alias("__num"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.when(
            F.expr(
                "assert_true(n_pos > 0 and n_neg > 0,"
                " 'eval_auc: needs both classes present')"
            ).isNull()
            & F.expr(
                f"assert_true(n_pos * n_neg <= {_PN_MAX},"
                " 'eval_auc: corpus over bigint AUC headroom — sample"
                " or widen to DECIMAL')"
            ).isNull(),
            F.expr(f"__num * {_E6} div (2 * n_pos * n_neg)"),
        )
        .cast("bigint")
        .alias("auc_e6"),
    )


def calibration_bins(
    df: DataFrame, score_col: str, label_col: str, *, bin_width: int
) -> DataFrame:
    """Reliability diagram: fixed-width score bins with the observed
    positive rate per bin — the third standard evaluation artifact next
    to the PR curve and AUC (a score is CALIBRATED when pos_permille
    tracks the bin).

    Binning and the mean are exact FLOOR division in pure integer
    arithmetic (``(x - pmod(x, w)) div w`` — the events.py lesson), so
    negative scores bin identically in Spark, DuckDB and Python.
    Output: ``(bin, bin_lo, n, n_pos, pos_permille, score_sum,
    mean_score_floor)`` — one partially-aggregable groupBy, no window,
    map-side combinable however large the corpus.
    """
    _check_eval_input(df, score_col, label_col)
    if not (isinstance(bin_width, int) and bin_width >= 1):
        raise ValueError(f"bin_width must be a positive int, got {bin_width}")
    w = int(bin_width)
    s = f"cast({score_col} as bigint)"
    binned = df.select(
        F.expr(f"({s} - pmod({s}, {w})) div {w}").alias("bin"),
        F.col(score_col).cast("bigint").alias("__score"),
        F.col(label_col).cast("bigint").alias("__y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("n_pos"),
        F.sum("__score").alias("score_sum"),
    )
    return agg.select(
        "bin",
        (F.col("bin") * w).alias("bin_lo"),
        "n",
        "n_pos",
        F.expr("n_pos * 1000 div n").alias("pos_permille"),
        "score_sum",
        F.expr("(score_sum - pmod(score_sum, n)) div n").alias(
            "mean_score_floor"
        ),
    )


# --- oracle ------------------------------------------------------------


def _floor_div_sql(x: str, d: str) -> str:
    """DuckDB exact floor division (``//`` truncates on integers)."""
    return f"(({x}) - ((({x}) % ({d}) + ({d})) % ({d}))) // ({d})"


def calibration_sql(
    *, rel: str, score_col: str, label_col: str, bin_width: int
) -> str:
    """DuckDB twin of :func:`calibration_bins`."""
    w = int(bin_width)
    if w < 1:
        raise ValueError(f"bin_width must be a positive int, got {bin_width}")
    b = _floor_div_sql(f"{score_col}::BIGINT", str(w))
    m = _floor_div_sql("score_sum", "n")
    return f"""
        with a as (
          select {b} as bin,
                 count(*)::BIGINT as n,
                 sum(case when {label_col} then 1 else 0 end)::BIGINT as n_pos,
                 sum({score_col}::BIGINT)::BIGINT as score_sum
          from {rel} group by 1
        )
        select bin, (bin * {w})::BIGINT as bin_lo, n, n_pos,
               (n_pos * 1000 // n)::BIGINT as pos_permille,
               score_sum, ({m})::BIGINT as mean_score_floor
        from a
    """


def calibration_py(
    rows: Iterable[tuple[int, bool]], *, bin_width: int
) -> list[tuple]:
    """Reference over ``(score, label)`` pairs (Python ``//`` floors
    natively — the spelling the engine twins must reproduce)."""
    w = int(bin_width)
    per: dict[int, list[int]] = {}
    for s, y in rows:
        b = int(s) // w
        c = per.setdefault(b, [0, 0, 0])
        c[0] += 1
        c[1] += 1 if y else 0
        c[2] += int(s)
    return sorted(
        (b, b * w, n, p, p * 1000 // n, ss, ss // n)
        for b, (n, p, ss) in per.items()
    )


def _rollup_sql(rel: str, score_col: str, label_col: str) -> str:
    return f"""_r as (
          select {score_col}::BIGINT as score,
                 count(*)::BIGINT as n,
                 sum(case when {label_col} then 1 else 0 end)::BIGINT as n_pos,
                 sum(case when {label_col} then 0 else 1 end)::BIGINT as n_neg
          from {rel} group by 1
        )"""


def eval_curve_sql(*, rel: str, score_col: str, label_col: str) -> str:
    """DuckDB twin of :func:`eval_curve`, generated here so the two
    spellings cannot drift. ``rel`` is a relation or parenthesized
    subquery yielding (score_col, label_col)."""
    return f"""
        with {_rollup_sql(rel, score_col, label_col)},
        c as (
          select score, n, n_pos, n_neg,
                 sum(n_pos) over (order by score desc
                   rows between unbounded preceding and current row) as tp,
                 sum(n_neg) over (order by score desc
                   rows between unbounded preceding and current row) as fp,
                 sum(n_pos) over () as p
          from _r
        )
        select score, n, n_pos, n_neg, tp::BIGINT as tp, fp::BIGINT as fp,
               (p - tp)::BIGINT as fn,
               (tp * {_E6} // (tp + fp))::BIGINT as precision_e6,
               (tp * {_E6} // p)::BIGINT as recall_e6,
               (2 * tp * {_E6} // (2 * tp + fp + (p - tp)))::BIGINT as f1_e6
        from c
    """


def eval_auc_sql(*, rel: str, score_col: str, label_col: str) -> str:
    """DuckDB twin of :func:`eval_auc`."""
    return f"""
        with {_rollup_sql(rel, score_col, label_col)},
        b as (
          select n_pos, n_neg,
                 n_pos * (2 * coalesce(sum(n_neg) over (order by score asc
                   rows between unbounded preceding and 1 preceding), 0)
                   + n_neg) as t
          from _r
        )
        select sum(n_pos)::BIGINT as n_pos,
               sum(n_neg)::BIGINT as n_neg,
               (sum(t) * {_E6} // (2 * sum(n_pos) * sum(n_neg)))::BIGINT
                 as auc_e6
        from b
    """


# --- driver-side reference (differential tests) ------------------------


def eval_py(
    rows: Iterable[tuple[int, bool]]
) -> tuple[list[tuple], tuple[int, int, int]]:
    """Reference over ``(score, label)`` pairs → (curve rows sorted by
    score desc, (n_pos, n_neg, auc_e6)). Same integer algebra as the
    engines; floor division on non-negative operands throughout."""
    per: dict[int, list[int]] = {}
    for s, y in rows:
        c = per.setdefault(int(s), [0, 0])
        c[0 if y else 1] += 1
    p = sum(c[0] for c in per.values())
    n = sum(c[1] for c in per.values())
    if p == 0:
        raise ValueError("no positive labels")
    curve = []
    tp = fp = 0
    for s in sorted(per, reverse=True):
        pos, neg = per[s]
        tp += pos
        fp += neg
        curve.append(
            (
                s, pos + neg, pos, neg, tp, fp, p - tp,
                tp * _E6 // (tp + fp),
                tp * _E6 // p,
                2 * tp * _E6 // (2 * tp + fp + (p - tp)),
            )
        )
    if n == 0:
        raise ValueError("no negative labels")
    num = 0
    below = 0
    for s in sorted(per):
        pos, neg = per[s]
        num += pos * (2 * below + neg)
        below += neg
    return curve, (p, n, num * _E6 // (2 * p * n))


def eval_auc_py(rows: Sequence[tuple[int, bool]]) -> int:
    """Just the ``auc_e6`` of :func:`eval_py` (convenience)."""
    return eval_py(rows)[1][2]


# --- Cohen's kappa -----------------------------------------------------------


def cohens_kappa(
    df: DataFrame, group_col: str, rater_a: str, rater_b: str
) -> DataFrame:
    """Per-group Cohen's kappa between two label columns — the
    chance-corrected agreement a pipeline owner checks before
    substituting a cheap heuristic rater for an expensive one (raw
    agreement is inflated whenever one label dominates; kappa is the
    agreement beyond what label marginals alone produce). Classic
    exact-rational form over counts:

        kappa = (n·agree − Σ_l a_l·b_l) / (n² − Σ_l a_l·b_l)

    with a_l/b_l the per-rater label marginals — numerator and
    denominator exact bigints, ONE e6 quantization at the end with
    explicit sign handling (Spark's ``div`` truncates toward zero
    while DuckDB's ``//`` floors — they agree only on non-negative
    operands, so the sign is peeled first; kappa < 0 = worse than
    chance is a real outcome). A group where chance agreement is
    total (both raters constant on the same label: denominator 0)
    emits NULL kappa — agreement is undefined there, not perfect.
    NULL labels count as the literal label '∅' so partially-rated
    rows neither vanish nor crash (the r4 lesson).

    Exactness bound: n² ≤ 2⁶³ needs n ≤ 3·10⁹ rows per group —
    enforced by a woven assert (the ks_drift/mixture_jsd headroom
    pattern).

    Scale shape: ONE scan → (group, a, b) partial-agg counts; the
    agree sum, both marginals and the Σ a_l·b_l cross term all derive
    from that small counts frame (two partial re-aggs + one tiny
    label-keyed equi-join — never a row-level self-join). Output:
    (group, n, agree, kappa_e6)."""
    g = F.col(group_col).alias("g")
    a = F.coalesce(F.col(rater_a).cast("string"), F.lit("∅")).alias("a")
    b = F.coalesce(F.col(rater_b).cast("string"), F.lit("∅")).alias("b")
    cnt = df.select(g, a, b).groupBy("g", "a", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_g = cnt.groupBy("g").agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c"))
              .otherwise(F.lit(0))).alias("agree"),
    ).select(
        "g", "agree",
        F.when(
            F.assert_true(
                F.col("n") <= F.lit(3_000_000_000),
                F.lit("cohens_kappa exactness bound: <= 3e9 rows per "
                      "group — sample upstream"),
            ).isNull(),
            F.col("n"),
        ).alias("n"),
    )
    ma = cnt.groupBy("g", "a").agg(F.sum("c").alias("na"))
    mb = cnt.groupBy("g", "b").agg(F.sum("c").alias("nb"))
    cross = (
        ma.join(mb, (ma["g"] == mb["g"]) & (ma["a"] == mb["b"]))
        .groupBy(ma["g"].alias("g"))
        .agg(F.sum(F.col("na") * F.col("nb")).alias("pe_num"))
    )
    out = per_g.join(cross, "g", "left").select(
        "g", "n", "agree",
        F.coalesce("pe_num", F.lit(0)).alias("pe_num"),
    )
    num = F.col("n") * F.col("agree") - F.col("pe_num")
    den = F.col("n") * F.col("n") - F.col("pe_num")
    kappa = F.when(den == 0, F.lit(None).cast("bigint")).otherwise(
        F.when(num >= 0, F.expr("(n * agree - pe_num) * 1000000 "
                                "div (n * n - pe_num)"))
        .otherwise(-F.expr("(pe_num - n * agree) * 1000000 "
                           "div (n * n - pe_num)"))
        .cast("bigint")
    )
    return out.select(
        F.col("g").alias(group_col),
        F.col("n"),
        F.col("agree"),
        kappa.alias("kappa_e6"),
    )


def cohens_kappa_sql(
    *, rel: str, group_col: str, rater_a: str, rater_b: str
) -> str:
    """DuckDB recompute of :func:`cohens_kappa` — same counts algebra,
    same sign-peeled single quantization, generated here so the two
    spellings cannot drift."""
    return f"""
        with _ck_cnt as (
          select {group_col} as g,
                 coalesce(cast({rater_a} as varchar), '∅') as a,
                 coalesce(cast({rater_b} as varchar), '∅') as b,
                 count(*)::BIGINT as c
          from {rel} group by 1, 2, 3
        ),
        _ck_n as (
          select g, sum(c)::BIGINT as n,
                 sum(case when a = b then c else 0 end)::BIGINT as agree
          from _ck_cnt group by 1
        ),
        _ck_ma as (select g, a, sum(c)::BIGINT as na from _ck_cnt group by 1, 2),
        _ck_mb as (select g, b, sum(c)::BIGINT as nb from _ck_cnt group by 1, 2),
        _ck_pe as (
          select ma.g, sum(ma.na * mb.nb)::BIGINT as pe_num
          from _ck_ma ma join _ck_mb mb on ma.g = mb.g and ma.a = mb.b
          group by 1
        )
        select n.g as {group_col}, n.n, n.agree,
               case
                 when n.n * n.n - coalesce(p.pe_num, 0) = 0 then NULL
                 when n.n * n.agree - coalesce(p.pe_num, 0) >= 0 then
                   (n.n * n.agree - coalesce(p.pe_num, 0)) * 1000000
                     // (n.n * n.n - coalesce(p.pe_num, 0))
                 else
                   -((coalesce(p.pe_num, 0) - n.n * n.agree) * 1000000
                     // (n.n * n.n - coalesce(p.pe_num, 0)))
               end::BIGINT as kappa_e6
        from _ck_n n left join _ck_pe p on p.g = n.g
    """


# --- multi-class confusion scorecard -----------------------------------------


def confusion_scorecard(
    df: DataFrame, truth_col: str, pred_col: str
) -> DataFrame:
    """Per-class confusion scorecard for a multi-class classifier —
    the piece the eval family (PR curve, ROC-AUC, calibration, kappa)
    was missing: for every TRUE class, support, predicted count, tp,
    and exact-integer precision/recall/F1. The F1 law is the exact
    rational ``2·tp / (n_true + n_pred)`` (algebraically equal to the
    harmonic mean — no nested divisions, ONE e6 quantization).
    Classes that are predicted but never true still surface (support
    0, recall NULL); classes never predicted get precision NULL —
    undefined is NULL, not 0. NULL labels count as the literal '∅'
    class (the kappa convention).

    Scale shape: ONE (truth, pred) partial-agg count; every statistic
    derives from that small matrix frame (two partial re-aggs + one
    full-outer class join). Output: (class, n_true, n_pred, tp,
    precision_e6, recall_e6, f1_e6)."""
    t = F.coalesce(F.col(truth_col).cast("string"), F.lit("∅"))
    p = F.coalesce(F.col(pred_col).cast("string"), F.lit("∅"))
    cnt = df.select(t.alias("t"), p.alias("p")).groupBy("t", "p").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_t = cnt.groupBy(F.col("t").alias("cls")).agg(
        F.sum("c").alias("n_true"),
        F.sum(F.when(F.col("p") == F.col("t"), F.col("c"))
              .otherwise(0)).alias("tp"),
    )
    per_p = cnt.groupBy(F.col("p").alias("cls")).agg(
        F.sum("c").alias("n_pred")
    )
    out = per_t.join(per_p, "cls", "full_outer").select(
        "cls",
        F.coalesce("n_true", F.lit(0)).cast("bigint").alias("n_true"),
        F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
        F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
    )
    return out.select(
        F.col("cls").alias("class"),
        "n_true",
        "n_pred",
        "tp",
        F.when(F.col("n_pred") == 0, F.lit(None).cast("bigint"))
        .otherwise(F.expr("tp * 1000000 div n_pred"))
        .alias("precision_e6"),
        F.when(F.col("n_true") == 0, F.lit(None).cast("bigint"))
        .otherwise(F.expr("tp * 1000000 div n_true"))
        .alias("recall_e6"),
        F.when(
            F.col("n_true") + F.col("n_pred") == 0,
            F.lit(None).cast("bigint"),
        )
        .otherwise(F.expr("2 * tp * 1000000 div (n_true + n_pred)"))
        .alias("f1_e6"),
    )


def confusion_scorecard_sql(
    *, rel: str, truth_col: str, pred_col: str
) -> str:
    """DuckDB recompute of :func:`confusion_scorecard` — same matrix
    algebra, same NULL-for-undefined rules, generated here so the two
    spellings cannot drift."""
    return f"""
        with _cs_c as (
          select coalesce(cast({truth_col} as varchar), '∅') as t,
                 coalesce(cast({pred_col} as varchar), '∅') as p,
                 count(*)::BIGINT as c
          from {rel} group by 1, 2
        ),
        _cs_t as (
          select t as cls, sum(c)::BIGINT as n_true,
                 sum(case when p = t then c else 0 end)::BIGINT as tp
          from _cs_c group by 1
        ),
        _cs_p as (select p as cls, sum(c)::BIGINT as n_pred
                  from _cs_c group by 1)
        select coalesce(t.cls, p.cls) as class,
               coalesce(t.n_true, 0)::BIGINT as n_true,
               coalesce(p.n_pred, 0)::BIGINT as n_pred,
               coalesce(t.tp, 0)::BIGINT as tp,
               case when coalesce(p.n_pred, 0) = 0 then NULL
                    else coalesce(t.tp, 0) * 1000000
                         // p.n_pred end::BIGINT as precision_e6,
               case when coalesce(t.n_true, 0) = 0 then NULL
                    else coalesce(t.tp, 0) * 1000000
                         // t.n_true end::BIGINT as recall_e6,
               case when coalesce(t.n_true, 0) + coalesce(p.n_pred, 0)
                      = 0 then NULL
                    else 2 * coalesce(t.tp, 0) * 1000000
                         // (coalesce(t.n_true, 0)
                             + coalesce(p.n_pred, 0))
               end::BIGINT as f1_e6
        from _cs_t t full outer join _cs_p p on p.cls = t.cls
    """
