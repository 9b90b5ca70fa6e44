"""Hash functions: log keys, template-prefix buckets, sink routing.

All hashes are md5-based so they are *portable* — identical in Spark SQL,
DuckDB and Python ``hashlib`` — which is what makes routed-row-set parity
checkable across engines (the reference uses md5 for both its log cache
key, log_entry.py:25-27, and its pattern index, template_pool.py:295-302).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def log_hash_col(col: Column) -> Column:
    """md5 of the cleaned log = the exact-match cache key (F11)."""
    return F.md5(col)


def log_hash(text: str) -> str:
    return hashlib.md5(text.encode()).hexdigest()


def pattern_bucket_col(pattern: Column, delimiter: str = " ") -> Column:
    """First-3-token md5[:8] bucket (F12, template_pool.py:295-302).

    Used as the pool's partition/bucket key so similar-template probes
    prune to one bucket.
    """
    tokens3 = F.slice(F.split(pattern, delimiter), 1, 3)
    return F.substring(F.md5(F.array_join(tokens3, "_")), 1, 8)


def pattern_bucket(pattern: str) -> str:
    key = "_".join(pattern.split()[:3])
    return hashlib.md5(key.encode()).hexdigest()[:8]


def sink_id_col(template_id: Column, num_sinks: int) -> Column:
    """Portable fan-out bucket: int(md5[:8], 16) % K.

    Deliberately md5-based (not ``F.hash``) so the same routing is
    reproducible in DuckDB (``('0x'||substr(md5(x),1,8))::bigint % K``)
    and Python — routed-row equality is part of the north rule.
    """
    return F.pmod(
        F.conv(F.substring(F.md5(template_id), 1, 8), 16, 10).cast("bigint"),
        F.lit(num_sinks),
    )


def sink_id(template_id: str, num_sinks: int) -> int:
    return int(hashlib.md5(template_id.encode()).hexdigest()[:8], 16) % num_sinks


def sink_id_sql(expr: str, num_sinks: int) -> str:
    """DuckDB-SQL rendering of the same routing function (for oracles)."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT % {num_sinks})"
