"""Content-defined chunking (CDC): rolling-hash chunk boundaries for
storage-level dedup of a crawl corpus.

Fixed-size chunking breaks on any insertion (every later chunk shifts);
CONTENT-defined boundaries — cut wherever a rolling hash of the last
``w`` characters hits 0 mod ``d`` — realign immediately after an edit,
so two near-identical pages share every chunk outside the edited
region. This is the dedup shape crawl STORAGE uses (rsync/LBFS/backup
systems): the corpus-wide duplicated-chunk mass is exactly the bytes a
chunk store would not write twice.

This implementation is the position-independent form: every
hash-match position is a boundary, no min/max chunk clamp. The clamped
variant is sequential per document (a boundary's eligibility depends on
the previous boundary); the unclamped form is embarrassingly parallel,
SQL-expressible, and keeps the core CDC property (identical ``w``-char
context ⇒ identical boundary decision). Average chunk length ≈ the
boundary rate of the corpus alphabet under ``h % d`` (measured ~39
chars at d=64 on the test corpus — ASCII prose is not uniform mod d;
determinism, not uniformity, is the contract).

Scale shape: boundary detection is a per-row map (no shuffle) — the
JVM expression path keeps it inside the scan stage; the Arrow path
(default for volume) computes all windows of a document in one
vectorized ``sliding_window_view @ pows`` product. The only shuffle in
the registered query is the chunk-hash groupBy, partially aggregable.

Cross-engine contract: the hash is pure integer arithmetic over
character CODEPOINTS (``ascii()`` in Spark and DuckDB, ``ord`` in
Python/numpy — identical for the ASCII corpora this repo seeds;
documented, not sniffed), so :func:`cdc_chunks_sql` regenerates the
whole chunker in DuckDB with zero tolerance, and the registered
query's oracle recomputes every boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CDC_W = 8          # rolling window (chars)
CDC_B = 31         # polynomial base
CDC_M = 1 << 20    # hash modulus
CDC_D = 64         # boundary divisor: cut where h % d == 0


def _check_cdc(w: int, b: int, m: int, d: int) -> None:
    if not all(isinstance(x, int) and x >= 2 for x in (w, b, m, d)):
        raise ValueError(f"cdc params must be ints >= 2, got w={w} b={b} m={m} d={d}")
    if d > m:
        raise ValueError(f"cdc divisor d={d} must not exceed modulus m={m}")


def _pows(w: int, b: int, m: int) -> list[int]:
    return [pow(b, j, m) for j in range(w)]


def _cuts_expr(text: str, w: int, b: int, m: int, d: int) -> str:
    """Spark SQL expression producing the sorted cut-position array of
    ``text`` (0 and length(text) always included)."""
    pows = ",".join(map(str, _pows(w, b, m)))
    hash_i = (
        f"aggregate(sequence(0, {w - 1}), cast(0 as bigint), "
        f"(acc, j) -> (acc + ascii(substring({text}, i - j, 1)) "
        f"* element_at(array({pows}), j + 1)) % {m})"
    )
    return (
        f"case when length({text}) < {w} then array(0, length({text})) else "
        f"array_sort(array_distinct(concat(array(0), "
        f"filter(transform(sequence({w}, length({text})), "
        f"i -> if(({hash_i}) % {d} = 0, i, -1)), x -> x != -1), "
        f"array(length({text}))))) end"
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    w: int = CDC_W,
    b: int = CDC_B,
    m: int = CDC_M,
    d: int = CDC_D,
    impl: str = "arrow",
) -> DataFrame:
    """Explode ``text_col`` into content-defined chunks:
    ``(<id_col>, chunk_idx, chunk)`` with ``chunk_idx`` 0-based in
    document order; concatenating a document's chunks in order yields
    the text exactly (tested property). NULL/empty texts yield no rows.

    ``impl='expr'`` is the pure JVM expression path (scan-stage, the
    semantics reference); ``impl='arrow'`` (default) computes each
    document's windows in one vectorized numpy product — equality-tested
    against the expr path, ~an order of magnitude faster on interpreted
    higher-order-function-heavy rows (the simhash precedent)."""
    _check_cdc(w, b, m, d)
    if impl == "expr":
        cuts = F.expr(_cuts_expr(text_col, w, b, m, d))
        chunks = F.expr(
            "transform(sequence(1, size(__cuts) - 1), "
            f"k -> struct(k - 1 as chunk_idx, "
            f"substring({text_col}, element_at(__cuts, k) + 1, "
            "element_at(__cuts, k + 1) - element_at(__cuts, k)) as chunk))"
        )
        return (
            df.where(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
            .withColumn("__cuts", cuts)
            .select(id_col, F.explode(chunks).alias("c"))
            .select(id_col, "c.chunk_idx", "c.chunk")
        )
    if impl != "arrow":
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")

    import pandas as pd  # noqa: F401 (signature requirement)

    pows = _pows(w, b, m)

    def fn(batches):
        import numpy as np
        import pandas as pd

        pv = np.array(pows[::-1], dtype=np.int64)
        for pdf in batches:
            out_id, out_idx, out_chunk = [], [], []
            for did, s in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                if s is None or len(s) == 0:
                    continue
                n = len(s)
                if n < w:
                    cuts = [0, n]
                else:
                    # dtype must stay explicitly little-endian ('<u4') to
                    # match the '<U' buffer on big-endian hosts
                    codes = np.frombuffer(
                        np.array([s], dtype=f"<U{n}").tobytes(), dtype="<u4"
                    ).astype(np.int64)
                    wins = np.lib.stride_tricks.sliding_window_view(codes, w)
                    h = (wins % m * pv % m).sum(axis=1) % m
                    ends = (np.nonzero(h % d == 0)[0] + w).tolist()
                    cuts = [0] + ends
                    if cuts[-1] != n:
                        cuts.append(n)
                for k in range(1, len(cuts)):
                    out_id.append(did)
                    out_idx.append(k - 1)
                    out_chunk.append(s[cuts[k - 1]:cuts[k]])
            yield pd.DataFrame(
                {"__id": out_id, "chunk_idx": out_idx, "chunk": out_chunk}
            )

    id_type = dict(df.select(id_col, text_col).dtypes)[id_col]
    out = df.select(id_col, text_col).mapInPandas(
        fn, f"__id {id_type}, chunk_idx int, chunk string"
    )
    return out.select(F.col("__id").alias(id_col), "chunk_idx", "chunk")


def cdc_chunks_sql(
    stream_cte: str,
    id_expr: str,
    text_expr: str,
    *,
    w: int = CDC_W,
    b: int = CDC_B,
    m: int = CDC_M,
    d: int = CDC_D,
) -> str:
    """DuckDB rendering of the whole chunker (generated here — the
    pagerank/bloom zero-drift pattern). Ends in
    ``cdc_chunks(id, chunk_idx, chunk)``; NULL/empty texts yield no
    rows, matching the Spark side."""
    _check_cdc(w, b, m, d)
    pows = "[" + ",".join(map(str, _pows(w, b, m))) + "]"
    return f"""
      cdc_src as (
        select {id_expr} as id, {text_expr} as s from {stream_cte}
        where {text_expr} is not null and length({text_expr}) > 0
      ),
      cdc_cuts as (
        select id, s,
          case when length(s) < {w} then [0, length(s)] else
            list_sort(list_distinct(list_concat(list_concat([0],
              list_filter(
                list_transform(range({w}, length(s) + 1),
                  i -> case when
                    list_aggregate(
                      list_transform(range(0, {w}),
                        j -> (ascii(substr(s, (i - j)::INT, 1))
                              * ({pows})[j + 1]) % {m}),
                      'sum') % {m} % {d} = 0
                  then i else -1 end),
                x -> x <> -1)),
              [length(s)])))
          end as cut
        from cdc_src
      ),
      cdc_chunks as (
        select id, k - 2 as chunk_idx,
               substr(s, (cut[k - 1] + 1)::INT, (cut[k] - cut[k - 1])::INT) as chunk
        from cdc_cuts, unnest(range(2, len(cut) + 1)) as g(k)
      )"""


# --- driver-side reference (differential tests) ------------------------

def cdc_chunks_py(
    s: str, *, w: int = CDC_W, b: int = CDC_B, m: int = CDC_M, d: int = CDC_D
) -> list[str]:
    _check_cdc(w, b, m, d)
    if not s:
        return []
    n = len(s)
    if n < w:
        return [s]
    pows = _pows(w, b, m)
    cuts = [0]
    for i in range(w, n + 1):
        h = sum(ord(s[i - 1 - j]) * pows[j] for j in range(w)) % m
        if h % d == 0:
            cuts.append(i)
    if cuts[-1] != n:
        cuts.append(n)
    return [s[a:e] for a, e in zip(cuts, cuts[1:])]


# --- token-window chunking (pretraining context windows) ----------------

def _check_window(chunk_tokens: int, stride_tokens: int) -> None:
    if not (isinstance(chunk_tokens, int) and chunk_tokens >= 1
            and isinstance(stride_tokens, int) and stride_tokens >= 1):
        raise ValueError(
            f"chunk_tokens and stride_tokens must be ints >= 1, "
            f"got {chunk_tokens}/{stride_tokens}"
        )


def token_window_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int,
    stride_tokens: int,
) -> DataFrame:
    """Fixed-size overlapping token windows — the context-window chunker
    a pretraining/RAG pipeline runs over every document (the sibling of
    sequence packing in operators/packing.py: packing fills fixed
    budgets ACROSS documents, this slices windows WITHIN one).

    Tokens are the repo's whitespace tokens (functions/text.ws_tokens —
    single-definition rule); window starts are ``0, stride, 2·stride, …
    < n_tokens``; the final window may be a partial tail (kept — that's
    the training convention). Output grain is one row per window:
    ``(<id_col>, chunk_idx, start_tok, n_tokens, chunk_text)`` with
    ``chunk_text`` the space-rejoined slice (original whitespace runs
    collapse — documented, the tokenize semantics). Zero-token docs
    (empty or NULL text) emit NO rows by contract; left-join the id
    frame to reattach them.

    Scale shape: a pure per-row map + explode — no shuffle anywhere,
    whole-stage codegen, the window arithmetic all JVM array
    expressions. At 100 TB this is a scan-bound stage like the C4/
    Gopher filters.
    """
    from ..functions.text import ws_tokens

    _check_window(chunk_tokens, stride_tokens)
    if id_col in {"chunk_idx", "start_tok", "n_tokens", "chunk_text"}:
        raise ValueError(f"id_col {id_col!r} collides with an output column")
    toks = df.select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks")
    ).select(
        id_col, "__toks",
        F.expr(
            f"filter(sequence(0, greatest(size(__toks) - 1, 0), {stride_tokens}),"
            " s -> s < size(__toks))"
        ).alias("__starts"),
    )
    return toks.select(
        id_col,
        F.posexplode("__starts").alias("chunk_idx", "start_tok"),
        "__toks",
    ).select(
        id_col,
        "chunk_idx",
        "start_tok",
        F.expr(f"slice(__toks, start_tok + 1, {chunk_tokens})").alias("__chunk"),
    ).select(
        id_col,
        "chunk_idx",
        "start_tok",
        F.size("__chunk").alias("n_tokens"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )


def token_window_sql(
    *,
    src: str,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    stride_tokens: int,
) -> str:
    """DuckDB recompute of :func:`token_window_chunks`, generated here
    so the two formulations cannot drift. Yields the same five
    columns."""
    from ..functions.text import TOKENS_SQL

    _check_window(chunk_tokens, stride_tokens)
    toks = TOKENS_SQL.format(c=text_col)
    return f"""
        with __tw_toks as (
          select {id_col}, {toks} as s from {src}
        ),
        __tw_starts as (
          select {id_col}, s, st,
                 (st // {stride_tokens})::INT as chunk_idx
          from __tw_toks,
               unnest(list_filter(range(0, len(s), {stride_tokens}),
                                  x -> x < len(s))) as g(st)
        )
        select {id_col}, chunk_idx, st::INT as start_tok,
               len(s[st + 1 : st + {chunk_tokens}])::INT as n_tokens,
               array_to_string(s[st + 1 : st + {chunk_tokens}], ' ') as chunk_text
        from __tw_starts
    """


def token_window_py(
    text: str, *, chunk_tokens: int, stride_tokens: int
) -> list[tuple[int, int, int, str]]:
    """Reference recompute: ``[(chunk_idx, start_tok, n_tokens,
    chunk_text)]`` (whitespace tokens, empties dropped)."""
    _check_window(chunk_tokens, stride_tokens)
    toks = [t for t in (text or "").split(" ") if t]
    # ws_tokens splits on the single-space delimiter; other whitespace
    # stays inside tokens, matching the Spark/DuckDB twins
    out = []
    for idx, st in enumerate(range(0, len(toks), stride_tokens)):
        chunk = toks[st:st + chunk_tokens]
        out.append((idx, st, len(chunk), " ".join(chunk)))
    return out
