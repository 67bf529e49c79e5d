"""Distributed BPE tokenizer training (Sennrich et al., ACL'16 —
the GPT-2/RoBERTa tokenizer learning step).

The classic two-level structure maps exactly onto Spark:

- ONE corpus pass builds the word-frequency table (the canonical
  wordcount shuffle). Everything after runs on that table — at 100 TB
  the corpus is petabytes but the distinct-word table is millions of
  rows, so the expensive part is a single map-side-combined pass.
- Each merge round runs on the VOCABULARY table: count adjacent
  symbol pairs weighted by word frequency (one bounded shuffle), pick
  the most frequent pair (deterministic tie-break: count desc, pair
  asc), apply the merge with a codegen `regexp_replace` over the
  space-joined symbol string. The only driver state is the merge
  list (n_merges rows); the vocab table is localCheckpointed per
  round so lineage stays flat — the same discipline as the k-means
  trainer.

No DuckDB oracle (iterative with data-dependent stopping — the
driver records a rows-only check); correctness is pinned against a
pure-Python reference BPE in tests/test_round4_ops.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions.localrel import local_df

from cocoindex_data_ingestion_spark.functions.text import tokenize

END_OF_WORD = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) — the single corpus-sized pass."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word → space-joined character symbols + end-of-word marker
    (``'low'`` → ``'l o w </w>'``), the classic BPE start state."""
    return words.select(
        F.concat(
            F.array_join(F.split(F.col("word"), ""), " "),
            F.lit(" " + END_OF_WORD),
        ).alias("syms"),
        "cnt",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count. The transform
    lambda runs interpreted, but ONLY over the vocabulary table
    (words × short symbol arrays), never the corpus."""
    # sequence(1, 0) would run DESCENDING (Spark sequence reverses
    # when end < start) — guard single-symbol rows out first
    pairs = F.expr(
        "transform(sequence(1, size(split(syms, ' ')) - 1),"
        " i -> concat(split(syms, ' ')[i - 1], ' ', split(syms, ' ')[i]))"
    )
    return (
        vocab.filter(F.size(F.split(F.col("syms"), " ")) >= 2)
        .select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 30,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    Returns ``[(rank, left, right, pair_count), ...]`` in merge
    order. Stops early when the best remaining pair's weighted count
    drops below ``min_pair_count``.
    """
    vocab = _initial_symbols(word_frequencies(docs, text_col))
    vocab = vocab.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        pair, n = top[0]["pair"], int(top[0]["n"])
        left, right = pair.split(" ", 1)
        merges.append((rank, left, right, n))
        # merge every ' left right ' occurrence (space-padded so only
        # whole symbols match); codegen regexp_replace on the vocab
        pat = (
            r"(?<=(^| ))"
            + re.escape(left)
            + " "
            + re.escape(right)
            + r"(?=( |$))"
        )
        vocab = vocab.select(
            F.regexp_replace(
                F.col("syms"), pat, left.replace("$", r"\$") + right
            ).alias("syms"),
            "cnt",
        ).localCheckpoint(eager=False)
    return merges


def bpe_merges_df(
    docs: DataFrame,
    n_merges: int = 30,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """The learned merge table as a DataFrame
    ``(rank, left, right, merged, pair_count)``."""
    spark = docs.sparkSession
    merges = bpe_train(docs, n_merges, min_pair_count, text_col)
    return local_df(
        spark,
        [(r, l, rt, l + rt, n) for r, l, rt, n in merges],
        "rank long, left string, right string, merged string, pair_count long",
    )


def encode_words(
    words: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Apply a learned merge list to a word table: the encode path.

    The merge sequence compiles into ONE chained codegen
    ``regexp_replace`` expression (n_merges nested replaces, no
    loop at runtime), evaluated over the DISTINCT-word table — the
    scale discipline: encoding cost is vocabulary-sized, and the
    corpus only pays a wordcount + join. Returns the input plus
    ``n_tokens`` (symbols after all merges; includes the ``</w>``
    fold into the final token, as in the trainer)."""
    syms = F.concat(
        F.array_join(F.split(F.col("word"), ""), " "),
        F.lit(" " + END_OF_WORD),
    )
    for _rank, left, right, _n in merges:
        pat = (
            r"(?<=(^| ))"
            + re.escape(left)
            + " "
            + re.escape(right)
            + r"(?=( |$))"
        )
        syms = F.regexp_replace(syms, pat, left + right)
    return words.withColumn(
        "n_tokens", F.size(F.split(syms, " ")).cast("long")
    )


def learned_fertility(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    group_col: str = "lang",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Tokenizer-quality evaluation with the LEARNED merges: tokens
    per word and characters per token per group — the fertility
    statistic computed against the trained tokenizer instead of the
    regex approximation (the full train → encode → evaluate
    lifecycle).

    Corpus side is one wordcount pass per group; the encode runs on
    the distinct (group, word) table only."""
    from cocoindex_data_ingestion_spark.functions.compare import (
        stable_round,
    )

    wc = (
        docs.select(
            F.col(group_col), F.explode(tokenize(text_col)).alias("word")
        )
        .groupBy(group_col, "word")
        .agg(F.count("*").alias("c"))
    )
    enc = encode_words(wc, merges)
    return (
        enc.groupBy(group_col)
        .agg(
            F.sum("c").alias("n_words"),
            F.sum(F.col("n_tokens") * F.col("c")).alias("n_tokens"),
            F.sum(F.length("word") * F.col("c")).alias("n_chars"),
        )
        .select(
            group_col,
            "n_words",
            "n_tokens",
            stable_round(
                F.col("n_tokens") / F.col("n_words").cast("double"), round_to
            ).alias("tokens_per_word"),
            stable_round(
                F.col("n_chars") / F.col("n_tokens").cast("double"), round_to
            ).alias("chars_per_token"),
        )
        .orderBy(group_col)
    )
