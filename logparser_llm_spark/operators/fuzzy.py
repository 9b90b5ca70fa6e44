"""Edit-distance-1 fuzzy self-join by deletion-neighborhood banding
(FastSS, Bocek et al. 2007; popularized as SymSpell) — find all pairs
of short strings within Levenshtein distance 1 WITHOUT the all-pairs
cartesian: typo'd URLs, near-identical titles, off-by-one-character
hostnames.

The banding is EXACT for d = 1, not heuristic: two strings s, t with
ed(s, t) <= 1 always share a key in {s} ∪ del1(s) (delete one position)
—
  substitution at i:  del_i(s) = del_i(t)
  insertion into s:   deleting the inserted char from t yields s, and
                      s is its own identity key
  deletion from s:    symmetric
so generating |s|+1 keys per string and equi-joining on the key has NO
false negatives; false positives (e.g. transpositions at distance 2)
are removed by one exact `levenshtein` verify per candidate — Spark's
built-in JVM expression, no UDF. This is the same
candidates-then-verify discipline as the repo's n-gram/simhash joins,
with a bound that is exact rather than probabilistic.

Scale shape: one explode to |s|+1 keys (strings are validated short —
the operator targets titles/URLs/hostnames, not documents), one
key-keyed equi-self-join producing Σ_key k² candidate rows (each key
bucket is tiny for real string distributions; a pathological shared
key would surface in key_skew_audit), distinct on the id pair BEFORE
the verify so each pair pays one levenshtein, id1 < id2 so each
unordered pair appears once. Output includes ed = 0 pairs (exact
duplicates) — callers wanting strictly-typo pairs filter ed = 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deletion keys per string = length + 1; beyond this the operator is
# the wrong tool (use the n-gram/simhash joins for document text)
FUZZY_MAX_LEN = 256


def fuzzy_join_ed1(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """All unordered pairs (id1 < id2) with ``levenshtein(s1, s2) <= 1``
    → (id1, id2, s1, s2, ed). NULL strings are excluded (no edit
    distance to a non-value); over-long strings raise at execution via
    a woven assert_true rather than silently exploding the key fan."""
    s = df.select(
        F.col(id_col).alias("_id"),
        F.when(
            F.expr(
                # coalesce inside the guard: length(NULL) is NULL and
                # assert_true(NULL) raises — NULL rows must reach the
                # isNotNull filter below, not die here
                f"assert_true(length(coalesce({str_col}, '')) <= "
                f"{FUZZY_MAX_LEN},"
                f" 'fuzzy_join_ed1: string over {FUZZY_MAX_LEN} chars —"
                f" use the n-gram/simhash joins for long text')"
            ).isNull(),
            F.col(str_col),
        ).alias("_s"),
    ).where(F.col("_s").isNotNull())
    # identity key at position -1, deletion keys at 0..len-1
    keys = s.select(
        "_id", "_s",
        F.explode(
            F.sequence(F.lit(-1), F.length("_s") - 1)
        ).alias("_p"),
    ).select(
        "_id", "_s",
        F.when(F.col("_p") < 0, F.col("_s"))
        .otherwise(
            F.concat(
                F.substring(F.col("_s"), 1, F.col("_p")),
                F.substring(
                    F.col("_s"), F.col("_p") + 2,
                    F.length("_s") - F.col("_p") - 1,
                ),
            )
        )
        .alias("_k"),
    ).distinct()  # one (id, key) row even when deletions collide ("aa")
    cand = (
        keys.select(F.col("_id").alias("id1"), F.col("_s").alias("s1"), "_k")
        .join(
            keys.select(F.col("_id").alias("id2"), F.col("_s").alias("s2"),
                        "_k"),
            "_k",
        )
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "s1", "s2")
        .distinct()
    )
    return (
        cand.withColumn("ed", F.levenshtein("s1", "s2").cast("bigint"))
        .where(F.col("ed") <= 1)
    )


def fuzzy_join_ed1_oracle_sql(*, rel: str, id_col: str, str_col: str) -> str:
    """INDEPENDENT-algebra oracle: brute-force all pairs with only the
    trivially-correct length-difference prune (|len1 − len2| > 1 ⇒
    ed > 1), then exact levenshtein — no deletion keys anywhere, so a
    false negative in the banding breaks the row-count/hash, which is
    the point. Small-scale only (quadratic); the operator is the scale
    path."""
    return f"""
        select a.{id_col} as id1, b.{id_col} as id2,
               a.{str_col} as s1, b.{str_col} as s2,
               levenshtein(a.{str_col}, b.{str_col})::BIGINT as ed
        from {rel} a join {rel} b
          on a.{id_col} < b.{id_col}
         and abs(length(a.{str_col}) - length(b.{str_col})) <= 1
        where a.{str_col} is not null and b.{str_col} is not null
          and levenshtein(a.{str_col}, b.{str_col}) <= 1
    """


# --- sorted-neighborhood blocking (merge/purge) ------------------------------


def snm_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    *,
    window: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs (Hernández & Stolfo's
    merge/purge, SIGMOD 1995) — the third blocking paradigm next to
    this module's deletion-neighborhood banding and dedup.py's LSH:
    sort the corpus by a blocking key and pair every record with its
    ``window − 1`` successors in that order. Guarantees exactly
    ``n·(window−1) − C(window−1, 2)`` candidates (boundary-truncated) —
    a LINEAR candidate budget regardless of key skew, the property
    LSH and banding cannot give — at the price of recall limited to
    what the sort key brings adjacent (the classic multi-pass remedy:
    union several snm_pairs runs over different keys).

    Ordering is total: (key, id) — equal keys tie-break on the id, so
    the pairing is deterministic and partition-invariant. Output:
    (id_a, id_b, key_a, key_b, dist) with ``dist`` = rank distance in
    [1, window−1]; id_a is the EARLIER record in sort order. Callers
    verify candidates with their comparator (levenshtein etc.).

    Scale shape: the global order comes from
    :func:`~logparser_llm_spark.operators.packing.global_rank` (range
    shuffle + partition-parallel local ranks + a bounded driver pass —
    never the single-task empty-window row_number); the pairing is a
    ``window−1``-way explode of probe positions joined back on the
    bigint position — one equi-join whose fan-out is the candidate
    budget itself."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    from .packing import global_rank

    reserved = {"_snm_key", "_snm_pos", "_probe"}
    if reserved & set(df.columns):
        raise ValueError(f"reserved column name(s): {sorted(reserved & set(df.columns))}")
    # total order: key, then zero-padded non-negative id — lexicographic
    # == numeric for the pad width. The concat order equals (key, id)
    # order only if ids are non-negative and no key byte sorts at or
    # below the \x01 separator (the prefix-key case) — the asserts are
    # WOVEN into the consumed sort-key expression (a standalone assert
    # column would be pruned by Catalyst and never execute)
    k = F.coalesce(F.col(key_col), F.lit(""))
    guard = (
        (F.col(id_col) >= 0)
        & (F.col(id_col) < F.lit(10**18))
        & ~F.contains(k, F.lit("\x00"))
        & ~F.contains(k, F.lit("\x01"))
    )
    skey = F.when(
        F.assert_true(
            guard,
            F.lit("snm_pairs requires non-negative ids < 10^18 and keys "
                  "without \\x00/\\x01 bytes"),
        ).isNull(),
        F.concat(k, F.lit("\x01"),
                 F.lpad(F.col(id_col).cast("string"), 20, "0")),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        k.alias("key"),
        skey.alias("_snm_key"),
    )
    ranked = global_rank(
        base, "_snm_key", out_col="_snm_pos",
        num_partitions=num_partitions,
    ).drop("_snm_key")
    probes = ranked.select(
        F.col("id").alias("id_a"),
        F.col("key").alias("key_a"),
        F.col("_snm_pos"),
        F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("_d"),
    ).select(
        "id_a",
        "key_a",
        "_d",
        (F.col("_snm_pos") + F.col("_d")).alias("_probe"),
    )
    right = ranked.select(
        F.col("_snm_pos").alias("_probe"),
        F.col("id").alias("id_b"),
        F.col("key").alias("key_b"),
    )
    return probes.join(right, "_probe").select(
        "id_a",
        "id_b",
        "key_a",
        "key_b",
        F.col("_d").cast("bigint").alias("dist"),
    )


def snm_pairs_oracle_sql(
    *, rel: str, id_col: str, key_col: str, window: int = 5
) -> str:
    """INDEPENDENT-algebra oracle for :func:`snm_pairs`: the
    single-node window spelling (row_number over the total order +
    self-join on rank distance) that the Spark side deliberately
    avoids at scale — a broken prefix-sum rank or probe join breaks
    the row set."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    return f"""
        with _snm_r as (
          select {id_col} as id, coalesce({key_col}, '') as key,
                 row_number() over (
                   order by coalesce({key_col}, ''), {id_col}
                 ) - 1 as pos
          from {rel}
        )
        select a.id as id_a, b.id as id_b,
               a.key as key_a, b.key as key_b,
               (b.pos - a.pos)::BIGINT as dist
        from _snm_r a
        join _snm_r b
          on b.pos > a.pos and b.pos <= a.pos + {window - 1}
    """
