"""Distributed BPE vocabulary training (SURVEY §2.14 extension).

Classic byte-pair-encoding merge learning (Sennrich et al. 2016,
public algorithm): start from characters, repeatedly merge the most
frequent adjacent symbol pair. The scale-correct Spark shape:

- The corpus collapses ONCE to a distinct-word frequency table
  (explode + groupBy) — after that, every merge round works on the
  vocab-sized table (10^5-10^6 rows regardless of corpus size), never
  the corpus again. This is exactly why BPE trains on 100 TB: the
  active set is the vocabulary, weighted by counts.
- Each round = one keyed shuffle (pair counts, map-side combined) +
  a ONE-ROW collect (the argmax pair) + a map-only merge application
  (Arrow-batched pandas UDF — adjacent-pair rewriting is inherently
  sequential per word, parallel across words).
- Deterministic: ties break on (count desc, left asc, right asc), so
  the learned merge sequence is reproducible at any parallelism.
- Lineage is cut with localCheckpoint every few rounds so K rounds
  don't stack K plans.

Not SQL-expressible as one query (the merge choice each round depends
on the previous round's data), so this ships with an exact-equivalence
test against a pure-Python reference implementation instead of a
DuckDB oracle; the registry entry is rows-only.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

END_MARK = "</w>"  # word-end marker, per the original construction
# Adjudicated round 6: interleaved A/B at sf0.1 (24 merges) showed no
# consistent difference between checkpointing every 1/2/4/8 rounds
# (5.9-7.4 s, ordering tracked JVM warm-up, not the knob) — the vocab
# table is small enough that recomputing up to 7 stacked merge UDFs
# costs about the same as a checkpoint write. 8 keeps lineage bounded.
CHECKPOINT_EVERY = 8

# Python-side tokenization MUST match the Spark plan's split(lower(trim(
# text)), '\s+'): Java regex \s is ASCII-only ([ \t\n\x0B\f\r]), so the
# encode path splits with re.ASCII — a unicode-aware str.split() would
# break words at NBSP/ideographic spaces that training kept intact
_WS_RE = re.compile(r"\s+", re.ASCII)


def tokenize_words(text: str) -> list[str]:
    return [w for w in _WS_RE.split((text or "").lower()) if w]


def _word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    words = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("word")
    return (
        docs.select(words)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _symbolize(wf: DataFrame) -> DataFrame:
    # word -> [c1, c2, ..., cn</w>]: the end marker fuses to the last
    # character so merges can't cross word boundaries
    syms = F.expr(
        f"transform(split(word, ''), (c, i) -> "
        f"IF(i = length(word) - 1, c || '{END_MARK}', c))"
    )
    return wf.select(F.col("word"), F.col("freq"), syms.alias("syms"))


def _pair_counts(sym: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), "
        "(s, i) -> struct(s AS left, syms[i + 1] AS right))"
    )
    return (
        sym.filter(F.size("syms") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("count"))
    )


def _merge_udf(left: str, right: str):
    merged = left + right

    @F.pandas_udf(ArrayType(StringType()))
    def apply_merge(syms: pd.Series) -> pd.Series:
        def one(arr):
            out = []
            i, n = 0, len(arr)
            while i < n:
                if i + 1 < n and arr[i] == left and arr[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(arr[i])
                    i += 1
            return out

        return syms.map(lambda a: one(list(a)))

    return apply_merge


def train_bpe_merges(
    docs: DataFrame, n_merges: int = 32, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` BPE merges; returns [(rank, left, right, count)].
    The driver receives ONE row per round — never the vocabulary."""
    sym = _symbolize(_word_freqs(docs, text_col)).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            _pair_counts(sym)
            .orderBy(F.desc("count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append((rank, row["left"], row["right"], int(row["count"])))
        sym = sym.withColumn(
            "syms", _merge_udf(row["left"], row["right"])(F.col("syms"))
        )
        if (rank + 1) % CHECKPOINT_EVERY == 0:
            sym = sym.localCheckpoint()
    return merges


def bpe_merges_query(spark, sf_dir, n_merges: int = 24):
    """Registry form: learned merge table over the documents corpus."""
    from ..io import load

    docs = load(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs, n_merges=n_merges)
    return spark.createDataFrame(
        merges, "rank BIGINT, left STRING, right STRING, count BIGINT"
    )


def register(reg) -> None:
    # iterative + data-dependent per round: rows-only driver check; exact
    # equivalence to a pure-Python reference is pinned in tests/test_bpe.py
    reg.add("bpe_train_merges", bpe_merges_query)


def encode_with_merges(
    docs: DataFrame, merges: list[tuple[int, str, str, int]], text_col: str = "text"
) -> DataFrame:
    """Apply a learned merge table: adds `tokens ARRAY<STRING>` and
    `n_tokens BIGINT`. Map-only — the merge ranks ride to executors in
    the UDF closure (vocab-sized, the classic broadcast-side object);
    greedy lowest-rank-first application per word, the standard BPE
    encode. No shuffle at any size."""
    ranks = {(left, right): rank for rank, left, right, _count in merges}

    @F.pandas_udf(ArrayType(StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        def word_tokens(w):
            syms = [c if i < len(w) - 1 else c + END_MARK for i, c in enumerate(w)]
            while len(syms) >= 2:
                best, at = None, -1
                for i, pair in enumerate(zip(syms, syms[1:])):
                    r = ranks.get(pair)
                    if r is not None and (best is None or r < best):
                        best, at = r, i
                if best is None:
                    break
                syms[at : at + 2] = [syms[at] + syms[at + 1]]
            return syms

        def one(t):
            out = []
            for w in tokenize_words(t):
                out.extend(word_tokens(w))
            return out

        return texts.map(one)

    return docs.withColumn("tokens", encode(F.col(text_col))).withColumn(
        "n_tokens", F.size("tokens").cast("bigint")
    )
