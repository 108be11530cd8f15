"""Distributed BPE tokenizer training (Sennrich et al. 2016, the
merge-pair algorithm GPT-2's byte-level tokenizer popularized) —
Spark-first.

The scale insight every production BPE trainer uses: the corpus is
scanned ONCE into a (word, freq) table — vocabulary-sized, orders of
magnitude smaller than the token stream — and ALL merge iterations
run over that table. Re-expressed in Spark terms: one big
tokenize+groupBy job over 100 TB, then each merge round costs two
small jobs over the word-frequency table (a weighted pair count +
a map-only symbol rewrite), with ``localCheckpoint`` truncating the
iteration's lineage so round 1000's plan is as small as round 1's.
Nothing per-row ever reaches Python during training; the in-array
pair merge is a native ``F.aggregate`` fold (greedy left-to-right,
exactly the reference algorithm's scan order).

Encoding (``apply_bpe``) IS per-row sequential — merge rank lookup
inside a while-loop — so it ships as an Arrow-batched pandas UDF
with the learned ranks broadcast in the closure: the documented
slow-path escape hatch (SURVEY §2.8 U2), amortized to one python
worker call per Arrow batch.

Reference anchor: the reference repo has no tokenizer plane
(reference: Traffic-Prediction-Modelling.ipynb is numeric-only); this
is LLM-pipeline extension surface, cited to the published algorithm.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import tokens

END_OF_WORD = "▁"  # visible end-of-word marker (sentencepiece's)


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace tokens — the ONE corpus-sized job
    of BPE training. Case is preserved (byte/char fidelity is the
    point of BPE)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _to_symbols(word: Column) -> Column:
    """Initial symbol sequence: characters, with the end-of-word
    marker appended as its own trailing symbol (Sennrich's '</w>'
    convention; the marker keeps "est"-as-suffix distinct from
    "est"-as-prefix)."""
    return F.concat(F.split(word, ""), F.array(F.lit(END_OF_WORD)))


def pair_freqs(words: DataFrame, symbols_col: str = "symbols") -> DataFrame:
    """Corpus-weighted adjacent-symbol-pair counts over the word
    table: (a, b, pair_freq). The relational form of the reference
    algorithm's get_stats(): explode each word's adjacent pairs,
    weight by the word's corpus frequency, aggregate. Pair rows are
    alphabet²-bounded in practice — tiny next to the word table."""
    sym = F.col(symbols_col)
    pairs = F.arrays_zip(
        F.slice(sym, 1, F.size(sym) - 1).alias("a"),
        F.slice(sym, 2, F.size(sym) - 1).alias("b"),
    )
    return (
        words.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def merge_pair_column(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into the single
    symbol a+b, as a native fold (no UDF): walk the array once,
    appending each symbol unless it completes the target pair with
    the accumulator's last element — the exact scan order of the
    reference implementation, so overlapping runs ("aaa" under
    ("a","a")) resolve identically: (aa)(a)."""
    merged = F.lit(a + b)
    return F.aggregate(
        symbols,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list [(a, b), ...] (rank = position).

    Each round: (1) one weighted pair-count aggregate over the word
    table and a deterministic argmax (ties broken lexicographically,
    so training is layout-independent); (2) one map-only symbol
    rewrite. ``localCheckpoint`` every ``checkpoint_every`` rounds
    truncates lineage — without it round N's plan nests N folds and
    analysis time, not data, becomes the wall. Stops early when no
    pair reaches ``min_pair_freq`` (merging singletons is noise).

    The driver holds only the merge list and each round's 1-row
    argmax — never the word table.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1: {num_merges}")
    words = (
        word_freqs(df, text_col)
        .select(_to_symbols(F.col("word")).alias("symbols"), "freq")
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for i in range(num_merges):
        top = (
            pair_freqs(words)
            .orderBy(F.desc("pair_freq"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_freq"] < min_pair_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.select(
            merge_pair_column(F.col("symbols"), a, b).alias("symbols"),
            "freq",
        )
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned merges as a (rank, a, b) frame — the persistable
    model artifact (write it, `apply_bpe` consumers read it)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    )


def apply_bpe(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Encode documents with learned merges: (id, bpe_tokens,
    n_bpe_tokens). Arrow-batched pandas UDF (per-word sequential
    rank-lookup loop — the algorithm is inherently ordered, the
    justified Python boundary); ranks ride the closure broadcast,
    KBs for any practical merge count."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def encode_word(word: str) -> list[str]:
            got = cache.get(word)
            if got is not None:
                return got
            syms = list(word) + [END_OF_WORD]
            while len(syms) > 1:
                best_rank, best_i = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_i is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            cache[word] = syms
            return syms

        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").split():
                toks.extend(encode_word(w))
            out.append(toks)
        return pd.Series(out)

    return df.select(
        F.col(id_col),
        encode(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))
