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
