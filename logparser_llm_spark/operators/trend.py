"""Group-wise least-squares trend slopes with exact rational integer
arithmetic — "is this event type's daily volume growing?" computed as
the OLS slope over (x = day, y = count) per group, the monitoring
statistic every telemetry pipeline derives from its aggregates (the
reference stops at raw counts; parity-wise this extends its A-family).

For each group with points (xᵢ, yᵢ), i = 1..n:

    num = n·Σxy − Σx·Σy          den = n·Σx² − (Σx)²   (≥ 0)
    slope = num / den            (den = 0 ⇔ single distinct x → NULL)

Everything up to the final division is bigint-exact, so num/den are
hash-identical across Spark, DuckDB and Python; the published
``slope_e6 = floor(1e6·num / den)`` uses the SIGN-SAFE floor spelling
(``(x − pmod(x, d)) div d`` in Spark, the equivalent `%`-normalized
form in DuckDB, bare ``//`` in Python — the calibration-bins lesson:
num is legitimately negative for falling trends and truncation would
disagree with floor there).

Overflow discipline: x is CENTERED per group (x' = x − min(x), one
window over the same key the groupBy shuffles on, so Catalyst reuses
the exchange) which shrinks Σx² from epoch-scale to span-scale; the
remaining ``1e6·num`` headroom (|num| ≤ 2^63/1e6 ≈ 9.2e12) is guarded
with an ``assert_true`` WOVEN into the kept slope expression, never a
prunable side column. At 100 TB the input to this operator is already
a per-(group, x) aggregate — group-count × span rows — so the window
and groupBy run on a tiny frame; the corpus pass is the upstream
partially-aggregable count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NUM_ABS_MAX = (1 << 63) // 1_000_000 - 1  # |num| bound so 1e6·num fits bigint


def group_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    *,
    num_abs_max: int = NUM_ABS_MAX,
) -> DataFrame:
    """Per-group OLS slope: ``(group_cols…, n, slope_num, slope_den,
    slope_e6)``.

    ``x_col`` and ``y_col`` must be integer-typed (epoch days, counts,
    integer micro-units) — the exactness contract starts at the inputs.
    Groups whose x values are all equal emit ``slope_e6 = NULL`` with
    ``slope_den = 0`` rather than being dropped. ``num_abs_max``
    exists so tests can trip the headroom guard on small frames.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if not 0 < num_abs_max <= NUM_ABS_MAX:
        raise ValueError(f"num_abs_max must be in 1..{NUM_ABS_MAX}")
    for c, kind in ((x_col, "x_col"), (y_col, "y_col")):
        dtype = dict(df.dtypes).get(c)
        if dtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"{kind} {c!r} must be integer-typed for exact arithmetic, "
                f"got {dtype!r}"
            )
    w = Window.partitionBy(*group_cols)
    centered = df.select(
        *group_cols,
        (F.col(x_col) - F.min(x_col).over(w)).cast("bigint").alias("__x"),
        F.col(y_col).cast("bigint").alias("__y"),
    )
    agg = centered.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    # staged named columns (the house lesson: no common subexpression
    # inside one select), then the sign-safe floor on the named pair:
    # (x - pmod(x, d)) div d with d > 0 — pmod is non-negative, so the
    # quotient is the mathematical floor even for negative numerators
    out = agg.select(
        *group_cols,
        "n",
        F.expr("n * __sxy - __sx * __sy").alias("slope_num"),
        F.expr("n * __sxx - __sx * __sx").alias("slope_den"),
    )
    staged = out.select(
        *group_cols,
        "n",
        "slope_num",
        "slope_den",
        F.when(
            F.expr(
                f"assert_true(abs(slope_num) <= {num_abs_max},"
                " 'group_trend: slope numerator over 1e6 headroom')"
            ).isNull(),
            F.col("slope_num") * 1_000_000,
        ).alias("__gn"),
    )
    return staged.select(
        *group_cols,
        "n",
        "slope_num",
        "slope_den",
        F.when(
            F.col("slope_den") > 0,
            F.expr("(__gn - pmod(__gn, slope_den)) div slope_den"),
        )
        .cast("bigint")
        .alias("slope_e6"),
    )


def group_trend_sql(
    *, rel: str, group_exprs: list[str], x_expr: str, y_expr: str
) -> str:
    """DuckDB twin of :func:`group_trend`. Same centering, same sums,
    same sign-safe floor division."""
    def _alias(e: str) -> str:
        lower = e.lower()
        return e[lower.rindex(" as ") + 4 :].strip() if " as " in lower else e

    gk = ", ".join(group_exprs)
    keys = ", ".join(_alias(e) for e in group_exprs)
    gnum = "(slope_num * 1000000)"
    floor_div = (
        f"({gnum} - (({gnum} % slope_den + slope_den) % slope_den))"
        " // slope_den"
    )
    return f"""
        with pts as (
          select {gk}, ({x_expr})::BIGINT as x, ({y_expr})::BIGINT as y
          from {rel}
        ),
        centered as (
          select {keys},
                 x - min(x) over (partition by {keys}) as cx, y
          from pts
        ),
        agg as (
          select {keys},
                 count(*)::BIGINT as n,
                 sum(cx)::BIGINT as sx, sum(y)::BIGINT as sy,
                 sum(cx * y)::BIGINT as sxy, sum(cx * cx)::BIGINT as sxx
          from centered group by {keys}
        ),
        staged as (
          select {keys}, n,
                 (n * sxy - sx * sy)::BIGINT as slope_num,
                 (n * sxx - sx * sx)::BIGINT as slope_den
          from agg
        )
        select {keys}, n, slope_num, slope_den,
               (case when slope_den > 0 then {floor_div} end)::BIGINT
                 as slope_e6
        from staged
    """


def group_trend_py(points: dict[str, list[tuple[int, int]]]) -> dict[str, tuple]:
    """Driver-side reference for :func:`group_trend` (differential
    tests): group → (n, slope_num, slope_den, slope_e6|None)."""
    out: dict[str, tuple] = {}
    for g, pts in points.items():
        xs = [x for x, _ in pts]
        mx = min(xs)
        cx = [x - mx for x in xs]
        ys = [y for _, y in pts]
        n = len(pts)
        sx, sy = sum(cx), sum(ys)
        sxy = sum(a * b for a, b in zip(cx, ys))
        sxx = sum(a * a for a in cx)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        out[g] = (n, num, den, (num * 1_000_000) // den if den > 0 else None)
    return out
