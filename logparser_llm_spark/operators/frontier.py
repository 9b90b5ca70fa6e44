"""Crawl-frontier politeness scheduling.

A polite crawler fetches at most one URL per host per delay interval
(RFC 9309 leaves the rate to the crawler; every production crawler
implements per-host spacing). At 10^11 frontier URLs "assign each URL
its fetch slot" is a DATA operation: one shuffle on the host, a
partition-parallel rank, pure integer arithmetic for the schedule —
never a driver-side queue.

Determinism contract: within a host, URLs are ordered by the portable
md5 of their id (tie-broken by the id itself), NOT by id order — hash
order interleaves sources fairly (consecutive ids from one ingest
batch don't monopolize the host's early slots) and is reproducible
across engines, unlike arrival order. All arithmetic is non-negative
integer multiply/floor-divide, so the schedule is bit-exact in Spark,
DuckDB (:func:`fetch_schedule_sql`) and Python.

Scale shape: ONE hash partition by host (the window is
partition-parallel — a 10^7-URL host ranks inside its own partition;
for a host so hot it skews a partition, cap it upstream with
``sampling.py`` source caps). No UDF, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("slot", "cycle", "sched_ms", "_ord")


def fetch_schedule(
    df: DataFrame,
    id_col: str,
    host_col: str,
    *,
    delay_ms: int = 1000,
    per_cycle: int = 32,
) -> DataFrame:
    """Per-host fetch slots → every input row plus ``slot`` (0-based
    fetch order within the host, md5-interleaved), ``cycle``
    (= slot div per_cycle — the crawl round this URL lands in) and
    ``sched_ms`` (= slot · delay_ms — the politeness offset from the
    host's first fetch)."""
    if delay_ms < 1 or per_cycle < 1:
        raise ValueError("delay_ms and per_cycle must be >= 1")
    clash = set(_RESERVED) & {id_col, host_col}
    if clash or any(c in _RESERVED for c in df.columns):
        bad = sorted(clash or (set(df.columns) & set(_RESERVED)))
        raise ValueError(f"reserved output column name(s): {bad}")
    w = Window.partitionBy(host_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    slot = F.row_number().over(w) - F.lit(1)
    return (
        df.withColumn("slot", slot.cast("long"))
        .withColumn(
            "cycle", F.expr(f"slot div {per_cycle}").cast("long")
        )
        .withColumn("sched_ms", (F.col("slot") * delay_ms).cast("long"))
    )


def fetch_schedule_sql(
    *,
    source: str,
    id_col: str,
    host_col: str,
    delay_ms: int = 1000,
    per_cycle: int = 32,
) -> str:
    """DuckDB recompute of :func:`fetch_schedule` (same md5 interleave,
    same integer arithmetic), generated here so the two spellings
    cannot drift. ``source`` is a relation or parenthesized subquery."""
    if delay_ms < 1 or per_cycle < 1:
        raise ValueError("delay_ms and per_cycle must be >= 1")
    return f"""
        select {id_col}, {host_col},
               slot,
               cast(slot // {per_cycle} as bigint) as cycle,
               cast(slot * {delay_ms} as bigint) as sched_ms
        from (
          select {id_col}, {host_col},
                 cast(row_number() over (
                   partition by {host_col}
                   order by md5(cast({id_col} as varchar)), {id_col}
                 ) - 1 as bigint) as slot
          from {source}
        ) t
    """


def fetch_schedule_py(
    rows: list[tuple],
    *,
    delay_ms: int = 1000,
    per_cycle: int = 32,
) -> dict:
    """Reference over (id, host) rows → id → (slot, cycle, sched_ms)."""
    import hashlib
    from collections import defaultdict

    if delay_ms < 1 or per_cycle < 1:
        raise ValueError("delay_ms and per_cycle must be >= 1")
    by_host = defaultdict(list)
    for i, h in rows:
        by_host[h].append(i)
    out = {}
    for h, ids in by_host.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for slot, i in enumerate(ids):
            out[i] = (slot, slot // per_cycle, slot * delay_ms)
    return out


def politeness_audit(
    df: DataFrame,
    host_col: str,
    ts_col: str,
    *,
    min_gap_us: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Crawl-politeness COMPLIANCE audit — the inverse of
    :func:`fetch_schedule`: given actual fetch logs, did the crawler
    HONOR the per-host delay? For every fetch after a host's first,
    the gap to that host's previous fetch in integer epoch micros,
    flagged ``violation`` when the gap is strictly under
    ``min_gap_us``. The audit every crawl operator runs when a
    webmaster complains — and the output is per-fetch, so the
    offending burst is identifiable, not just countable.

    One host-keyed shuffle, then a partition-parallel ``lag`` window
    per host (the fetch_schedule shape); all-integer comparison, so
    the flag is bit-decidable cross-engine. If the log can carry
    equal-microsecond fetches for one host, pass ``tiebreak_col`` (a
    unique id) — without it, WHICH tied row receives the 0 gap is
    partition-placement-dependent, exactly like any un-tiebroken
    window. Equal timestamps produce a gap of 0, which is (correctly)
    a violation for any positive delay. A host's FIRST fetch has no
    gap (NULL) and is never a violation. Output: input columns plus
    ``gap_us`` and ``violation``."""
    if min_gap_us < 1:
        raise ValueError(f"min_gap_us must be >= 1, got {min_gap_us}")
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(host_col).orderBy(*order)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    return df.withColumn("gap_us", gap.cast("bigint")).withColumn(
        "violation",
        F.coalesce(F.col("gap_us") < F.lit(min_gap_us), F.lit(False)),
    )


def politeness_audit_sql(
    *, rel: str, host_col: str, ts_col: str, min_gap_us: int,
    cols: str, tiebreak_col: str | None = None,
) -> str:
    """DuckDB recompute of :func:`politeness_audit` — same lag window,
    same strict comparison, generated here so the two spellings cannot
    drift. ``cols`` is the projected input column list."""
    if min_gap_us < 1:
        raise ValueError(f"min_gap_us must be >= 1, got {min_gap_us}")
    order = ts_col + (f", {tiebreak_col}" if tiebreak_col else "")
    return f"""
        select {cols},
               cast({ts_col} - lag({ts_col}) over (
                 partition by {host_col} order by {order}
               ) as bigint) as gap_us,
               coalesce(({ts_col} - lag({ts_col}) over (
                 partition by {host_col} order by {order}
               )) < {min_gap_us}, false) as violation
        from {rel}
    """


# --- time-decayed activity (recrawl priority) --------------------------------


def decayed_activity(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    horizon_days: int = 30,
    recent_days: int = 7,
) -> DataFrame:
    """Exponentially time-decayed activity per key — the recrawl-
    priority signal a crawl scheduler feeds its frontier (a host whose
    pages changed yesterday outranks one with the same lifetime volume
    spread over a quiet month). Half-life = one day, spelled EXACTLY:
    an event ``age`` whole days before the corpus's newest date weighs
    ``2^(horizon_days - age)`` (a bigint shift — no float decay), 0
    beyond the horizon, so every engine sums the identical integers.

    Per key: ``n_events`` (all rows, decayed-out and NULL-ts included),
    ``n_recent`` (rows with age < ``recent_days``), ``score`` (the
    decayed bigint sum), ``recent_share_e6`` (n_recent·10⁶ DIV
    n_events — event-count based, exact integer division) and ``rank``
    (1 = hottest; score desc, key asc — total order). A NULL timestamp
    contributes weight 0 but still counts in n_events (the r4
    silent-drop lesson: rows never vanish).

    Overflow headroom (Spark 4 runs ANSI — an overflow would RAISE,
    not wrap): score <= n_events·2^horizon, so horizon_days <= 40
    keeps 8·10⁶ events per key exact; recent_share_e6 needs
    n_events <= 9.2·10¹². Both bounds validated/documented, far above
    any per-key mass the pipeline shuffles.

    Scale shape: one 1-row global max-date aggregate broadcast back
    (the training_mix anchor shape), per-row weights in pure codegen,
    ONE partially-aggregable groupBy(key) with map-side combine; the
    rank window runs over the already-aggregated n_keys-row frame,
    never the event stream. Output: (key, n_events, n_recent, score,
    recent_share_e6, rank)."""
    if not 1 <= horizon_days <= 40:
        raise ValueError(
            f"horizon_days must be in [1, 40], got {horizon_days}"
        )
    if not 1 <= recent_days <= horizon_days:
        raise ValueError(
            "recent_days must be in [1, horizon_days], got "
            f"{recent_days}"
        )
    anchor = df.agg(F.max(F.to_date(ts_col)).alias("_anchor_d"))
    age = F.datediff(F.col("_anchor_d"), F.to_date(ts_col))
    aged = df.crossJoin(F.broadcast(anchor)).select(
        F.col(key_col).alias("key"), age.alias("_age")
    )
    # shiftleft's bit count must be a column here, which the Python DSL
    # doesn't accept — the SQL spelling compiles to the same codegen
    weight = F.when(
        F.col("_age") <= horizon_days,
        F.expr(f"shiftleft(cast(1 as bigint), {horizon_days} - _age)"),
    ).otherwise(F.lit(0).cast("bigint"))
    agg = aged.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.coalesce(
                (F.col("_age") < recent_days).cast("bigint"), F.lit(0)
            )
        ).alias("n_recent"),
        F.sum(F.coalesce(weight, F.lit(0))).alias("score"),
    )
    w = Window.orderBy(F.desc("score"), F.col("key"))
    return agg.select(
        "key",
        "n_events",
        "n_recent",
        "score",
        F.expr("n_recent * 1000000 div n_events").alias(
            "recent_share_e6"
        ),
        F.row_number().over(w).cast("int").alias("rank"),
    )


def decayed_activity_sql(
    *,
    rel: str,
    key_col: str,
    ts_col: str,
    horizon_days: int = 30,
    recent_days: int = 7,
) -> str:
    """DuckDB recompute of :func:`decayed_activity` — same shift
    weights, same anchor cross join, same integer division, generated
    here so the two spellings cannot drift."""
    if not 1 <= horizon_days <= 40:
        raise ValueError(
            f"horizon_days must be in [1, 40], got {horizon_days}"
        )
    if not 1 <= recent_days <= horizon_days:
        raise ValueError(
            "recent_days must be in [1, horizon_days], got "
            f"{recent_days}"
        )
    return f"""
        with _da_anchor as (
          select max(cast({ts_col} as date)) as _anchor_d from {rel}
        ),
        _da_agg as (
          select {key_col} as key,
                 count(*)::BIGINT as n_events,
                 coalesce(sum(case when date_diff('day',
                     cast({ts_col} as date), _anchor_d)
                     < {recent_days} then 1 else 0 end), 0)::BIGINT
                   as n_recent,
                 coalesce(sum(case when date_diff('day',
                     cast({ts_col} as date), _anchor_d)
                     <= {horizon_days}
                   then (1::BIGINT << ({horizon_days} - date_diff('day',
                     cast({ts_col} as date), _anchor_d)))
                   else 0 end), 0)::BIGINT as score
          from {rel} cross join _da_anchor
          group by 1
        )
        select key, n_events, n_recent, score,
               (n_recent * 1000000 // n_events)::BIGINT
                 as recent_share_e6,
               cast(row_number() over (order by score desc, key)
                 as integer) as rank
        from _da_agg
    """


# --- sitemap discovery coverage ----------------------------------------------

_LOC_PATTERN = r"<loc>([^<]+)</loc>"


def sitemap_coverage(
    sitemaps: DataFrame,
    host_col: str,
    xml_col: str,
    crawled: DataFrame,
    crawled_host_col: str,
    url_col: str,
) -> DataFrame:
    """Sitemap discovery-gap audit — for each host, how much of what the
    site DECLARES (its sitemap ``<loc>`` entries) did the crawl actually
    fetch, and how much was fetched that the site never declared? The
    two failure modes a crawl operator watches: a coverage gap means the
    frontier is starving a host; orphan fetches mean the crawler is
    burning budget on undeclared (often parameter-explosion) URLs.

    Per host: ``n_declared`` / ``n_crawled`` (distinct URLs each side),
    ``n_both``, ``n_gap`` (declared-only), ``n_orphan`` (crawled-only),
    and ``coverage_e6`` (n_both·10⁶ DIV n_declared; 0 for an empty
    sitemap). Every count is a distinct-URL count, so repeated fetches
    of one URL don't inflate coverage.

    Scale shape: the natural full-outer join on url would SHUFFLE the
    whole fetch log (Spark cannot broadcast a full-outer side). Instead
    the audit decomposes into a broadcast semi-join (n_both) and a
    broadcast anti-join (n_orphan) against the declared set — the
    sitemap side is host-cardinality-bounded (URLs a site declares,
    ≤50k/host by protocol), so the 10¹²-row fetch log is scanned twice
    but never shuffled; n_gap falls out arithmetically
    (declared − both). The per-host rollups are map-side-combinable
    aggs; the final stitch joins tiny per-host frames. Output rows: one
    per host appearing on either side (full outer over the TINY
    aggregates — hosts with an empty crawl or no sitemap both
    surface)."""
    loc = F.regexp_extract_all(
        F.coalesce(F.col(xml_col), F.lit("")), F.lit(_LOC_PATTERN), 1
    )
    # explode_outer: a host whose sitemap is NULL/empty keeps one
    # (host, NULL) row, so it still surfaces with n_declared = 0 (the
    # r4 silent-drop lesson); NULL urls never join, and n_declared
    # counts only real locs
    declared = (
        sitemaps.select(
            F.col(host_col).alias("host"), F.explode_outer(loc).alias("url")
        )
        .distinct()
    )
    crawled_d = crawled.select(
        F.col(crawled_host_col).alias("host"), F.col(url_col).alias("url")
    ).distinct()
    n_declared = declared.groupBy("host").agg(
        F.count("url").alias("n_declared")
    )
    n_crawled = crawled_d.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_crawled")
    )
    n_both = (
        crawled_d.join(F.broadcast(declared), ["host", "url"], "left_semi")
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    stitched = (
        n_declared.join(n_crawled, "host", "full_outer")
        .join(n_both, "host", "full_outer")
        .select(
            "host",
            F.coalesce("n_declared", F.lit(0)).alias("n_declared"),
            F.coalesce("n_crawled", F.lit(0)).alias("n_crawled"),
            F.coalesce("n_both", F.lit(0)).alias("n_both"),
        )
    )
    return stitched.select(
        "host",
        "n_declared",
        "n_crawled",
        "n_both",
        (F.col("n_declared") - F.col("n_both")).alias("n_gap"),
        (F.col("n_crawled") - F.col("n_both")).alias("n_orphan"),
        F.when(F.col("n_declared") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("n_both * 1000000 div n_declared"))
        .alias("coverage_e6"),
    )


def sitemap_coverage_sql(
    *,
    sitemaps_rel: str,
    host_col: str,
    xml_col: str,
    crawled_rel: str,
    crawled_host_col: str,
    url_col: str,
) -> str:
    """DuckDB recompute of :func:`sitemap_coverage` by the INDEPENDENT
    algebra — one full-outer join over the distinct URL sets plus
    conditional counts (the spelling the Spark side deliberately avoids
    at scale), so a broken semi/anti decomposition breaks the hash."""
    return f"""
        with _sc_decl as (
          -- left join lateral keeps empty/NULL-sitemap hosts as a
          -- (host, NULL) row — the Spark side's explode_outer
          select distinct s.host, u.url
          from (
            select {host_col} as host,
                   regexp_extract_all(coalesce({xml_col}, ''),
                          '{_LOC_PATTERN}', 1) as urls
            from {sitemaps_rel}
          ) s
          left join lateral (select unnest(s.urls) as url) u on true
        ),
        _sc_crawl as (
          select distinct {crawled_host_col} as host, {url_col} as url
          from {crawled_rel}
        ),
        _sc_full as (
          select coalesce(d.host, c.host) as host,
                 (d.url is not null) as declared,
                 (c.url is not null) as crawled
          from _sc_decl d
          full outer join _sc_crawl c
            on d.host = c.host and d.url = c.url
        ),
        _sc_agg as (
          select host,
                 sum(case when declared then 1 else 0 end)::BIGINT
                   as n_declared,
                 sum(case when crawled then 1 else 0 end)::BIGINT
                   as n_crawled,
                 sum(case when declared and crawled then 1 else 0
                     end)::BIGINT as n_both
          from _sc_full group by 1
        )
        select host, n_declared, n_crawled, n_both,
               (n_declared - n_both)::BIGINT as n_gap,
               (n_crawled - n_both)::BIGINT as n_orphan,
               case when n_declared = 0 then 0
                    else n_both * 1000000 // n_declared
               end::BIGINT as coverage_e6
        from _sc_agg
    """


# --- crawl day-coverage gaps -------------------------------------------------


def crawl_gaps(df: DataFrame, host_col: str, ts_col: str) -> DataFrame:
    """Per-host crawl CONTINUITY audit — the inverse question to
    :func:`politeness_audit` (too fast?) and :func:`decayed_activity`
    (how fresh?): did the crawler keep SHOWING UP? Over each host's
    distinct active days: first/last day, ``n_active``, the calendar
    ``span_days`` (inclusive), ``n_missed`` = span − active,
    ``longest_gap`` (max whole missed-day run strictly inside the
    span; 0 when every day is covered) and ``coverage_e6`` =
    n_active·10⁶ DIV span. A host whose longest_gap is a week tells
    you its frontier entry starved — per-host, so the offending
    scheduler shard is identifiable.

    All integer date arithmetic on distinct days (never raw fetches).
    NULL timestamps are excluded from day coverage but surface the
    host: a host with ONLY NULL ts emits (0 active, 0 span, NULL
    days, 0 coverage) rather than vanishing.

    Scale shape: one (host, day) DISTINCT partial agg collapses the
    10¹²-fetch log to ≤ hosts × days rows; the gap window (lag per
    host over its own days) runs partition-parallel on that tiny
    frame; one final per-host rollup. Output: (host, first_day,
    last_day, n_active, span_days, n_missed, longest_gap,
    coverage_e6)."""
    days = (
        df.select(
            F.col(host_col).alias("host"),
            F.to_date(ts_col).alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("host").orderBy("day")
    gaps = days.where(F.col("day").isNotNull()).withColumn(
        "gap",
        F.datediff(F.col("day"), F.lag("day").over(w)) - 1,
    )
    per_host = gaps.groupBy("host").agg(
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("n_active"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("bigint")
        .alias("longest_gap"),
    )
    hosts = days.select("host").distinct()
    return (
        hosts.join(per_host, "host", "left")
        .select(
            "host",
            "first_day",
            "last_day",
            F.coalesce("n_active", F.lit(0)).cast("bigint")
            .alias("n_active"),
            F.coalesce(
                F.datediff("last_day", "first_day") + 1, F.lit(0)
            )
            .cast("bigint")
            .alias("span_days"),
            F.coalesce("longest_gap", F.lit(0)).alias("longest_gap"),
        )
        .select(
            "host",
            "first_day",
            "last_day",
            "n_active",
            "span_days",
            (F.col("span_days") - F.col("n_active")).alias("n_missed"),
            "longest_gap",
            F.when(F.col("span_days") == 0, F.lit(0).cast("bigint"))
            .otherwise(F.expr("n_active * 1000000 div span_days"))
            .alias("coverage_e6"),
        )
    )


def crawl_gaps_sql(*, rel: str, host_col: str, ts_col: str) -> str:
    """DuckDB recompute of :func:`crawl_gaps` — same distinct-day lag
    window, same integer laws, generated here so the two spellings
    cannot drift."""
    return f"""
        with _cg_days as (
          select distinct {host_col} as host, cast({ts_col} as date) as day
          from {rel}
        ),
        _cg_gap as (
          select host, day,
                 date_diff('day', lag(day) over (
                   partition by host order by day
                 ), day) - 1 as gap
          from _cg_days where day is not null
        ),
        _cg_agg as (
          select host, min(day) as first_day, max(day) as last_day,
                 count(*)::BIGINT as n_active,
                 coalesce(max(gap), 0)::BIGINT as longest_gap
          from _cg_gap group by 1
        ),
        _cg_hosts as (select distinct host from _cg_days)
        select h.host, a.first_day, a.last_day,
               coalesce(a.n_active, 0)::BIGINT as n_active,
               coalesce(date_diff('day', a.first_day, a.last_day) + 1,
                        0)::BIGINT as span_days,
               (coalesce(date_diff('day', a.first_day, a.last_day) + 1, 0)
                - coalesce(a.n_active, 0))::BIGINT as n_missed,
               coalesce(a.longest_gap, 0)::BIGINT as longest_gap,
               case when coalesce(date_diff('day', a.first_day,
                                            a.last_day) + 1, 0) = 0
                    then 0
                    else coalesce(a.n_active, 0) * 1000000
                         // (date_diff('day', a.first_day, a.last_day) + 1)
               end::BIGINT as coverage_e6
        from _cg_hosts h left join _cg_agg a on a.host = h.host
    """


# --- URL parameter-explosion detector ----------------------------------------


def param_explosion(
    df: DataFrame, host_col: str, url_col: str
) -> DataFrame:
    """Per-host URL parameter-explosion audit — the crawl-budget trap
    detector: a host serving the same path under thousands of query
    strings (session ids, tracking params, faceted search) burns
    fetch budget on duplicate content. Per host: distinct full URLs,
    distinct paths (query+fragment stripped), ``urls_per_path_e3``
    (the explosion ratio), the single WORST path's distinct-URL count
    and the path itself (smallest such path on ties — deterministic).
    Read next to :func:`~..functions.web.surt_key`: this measures how
    much the canonicalizer WOULD collapse, host by host, before you
    pay for the fetches.

    NULL URLs count as the empty string (rows never vanish). Path =
    the URL up to the first ``?`` or ``#`` — one anchored regex
    replace, identical in Java regex and RE2.

    Scale shape: one (host, path) partial agg over distinct URLs
    (count-distinct pre-aggregates per partition after the first
    distinct), one per-host rollup, and the worst-path argmax via the
    tiny max-join (the ks_drift pattern) — the URL stream is scanned
    once. Output: (host, n_urls, n_paths, urls_per_path_e3,
    max_path_urls, top_path)."""
    path = F.regexp_replace(
        F.coalesce(F.col(url_col), F.lit("")), "[?#].*$", ""
    )
    per_path = (
        df.select(
            F.col(host_col).alias("host"),
            F.coalesce(F.col(url_col), F.lit("")).alias("url"),
            path.alias("path"),
        )
        .distinct()
        .groupBy("host", "path")
        .agg(F.count(F.lit(1)).alias("pu"))
    )
    per_host = per_path.groupBy("host").agg(
        F.sum("pu").alias("n_urls"),
        F.count(F.lit(1)).alias("n_paths"),
        F.max("pu").alias("max_path_urls"),
    )
    worst = (
        per_host.select("host", F.col("max_path_urls").alias("pu"))
        .join(per_path, ["host", "pu"])
        .groupBy("host")
        .agg(F.min("path").alias("top_path"))
    )
    return (
        per_host.join(worst, "host")
        .select(
            "host",
            F.col("n_urls").cast("bigint").alias("n_urls"),
            F.col("n_paths").cast("bigint").alias("n_paths"),
            F.expr("n_urls * 1000 div n_paths")
            .cast("bigint")
            .alias("urls_per_path_e3"),
            F.col("max_path_urls").cast("bigint").alias("max_path_urls"),
            "top_path",
        )
    )


def param_explosion_sql(
    *, rel: str, host_col: str, url_col: str
) -> str:
    """DuckDB recompute of :func:`param_explosion` — same anchored
    strip, same two-phase argmax, generated here so the two spellings
    cannot drift."""
    return f"""
        with _pe_d as (
          select distinct {host_col} as host,
                 coalesce({url_col}, '') as url,
                 regexp_replace(coalesce({url_col}, ''),
                                '[?#].*$', '') as path
          from {rel}
        ),
        _pe_p as (
          select host, path, count(*)::BIGINT as pu
          from _pe_d group by 1, 2
        ),
        _pe_h as (
          select host, sum(pu)::BIGINT as n_urls,
                 count(*)::BIGINT as n_paths,
                 max(pu)::BIGINT as max_path_urls
          from _pe_p group by 1
        ),
        _pe_w as (
          select h.host, min(p.path) as top_path
          from _pe_h h
          join _pe_p p on p.host = h.host and p.pu = h.max_path_urls
          group by 1
        )
        select h.host, h.n_urls, h.n_paths,
               (h.n_urls * 1000 // h.n_paths)::BIGINT as urls_per_path_e3,
               h.max_path_urls, w.top_path
        from _pe_h h join _pe_w w on w.host = h.host
    """


# --- robots.txt Sitemap directives -------------------------------------------

_SITEMAP_PATTERN = r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"


def sitemap_directives(
    df: DataFrame, host_col: str, robots_col: str
) -> DataFrame:
    """Per-host ``Sitemap:`` directive extraction from robots.txt
    bodies (RFC 9309 §2.3 allows any number, anywhere in the file,
    case-insensitive) — the missing half of the discovery loop:
    robots_filter answers "may I fetch", :func:`sitemap_coverage`
    audits what a sitemap declared, THIS finds the sitemaps in the
    first place. Per host: ``n_decls`` (directive lines),
    ``n_distinct`` (hosts often repeat the line), and ``first_url``
    (min — deterministic representative). Hosts with a NULL/empty
    robots body or no directives emit a zero row (rows never
    vanish). The line anchor is the shared multiline
    case-insensitive pattern — (?im) means the same thing in Java
    regex and RE2.

    Scale shape: pure scan-side regexp_extract_all + explode_outer
    into ONE partially-aggregable per-host rollup; the robots frame
    is host-cardinality-sized to begin with."""
    urls = F.regexp_extract_all(
        F.coalesce(F.col(robots_col), F.lit("")),
        F.lit(_SITEMAP_PATTERN),
        1,
    )
    exploded = df.select(
        F.col(host_col).alias("host"), F.explode_outer(urls).alias("u")
    )
    return exploded.groupBy("host").agg(
        F.count("u").cast("bigint").alias("n_decls"),
        F.countDistinct("u").cast("bigint").alias("n_distinct"),
        F.min("u").alias("first_url"),
    )


def sitemap_directives_sql(
    *, rel: str, host_col: str, robots_col: str
) -> str:
    """DuckDB recompute of :func:`sitemap_directives` — same (?im)
    pattern, same LEFT JOIN LATERAL zero-row rule, generated here so
    the two spellings cannot drift."""
    return f"""
        with _sd_u as (
          select b.host, u.u
          from (
            select {host_col} as host,
                   regexp_extract_all(coalesce({robots_col}, ''),
                     '{_SITEMAP_PATTERN}', 1) as us
            from {rel}
          ) b
          left join lateral (select unnest(b.us) as u) u on true
        )
        select host, count(u)::BIGINT as n_decls,
               count(distinct u)::BIGINT as n_distinct,
               min(u) as first_url
        from _sd_u group by 1
    """
