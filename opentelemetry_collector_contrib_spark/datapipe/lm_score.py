"""Corpus-frequency word-rarity scoring — the CCNet/Gopher-style
LM-quality-filter skeleton over the documents table.

A perplexity filter scores each document against a language model of
the corpus; the distributed skeleton is (1) build the model = one
aggregation over exploded words, (2) score = join every document word
against it, (3) reduce per document.  Here the "model" is the exact
unigram frequency table, and the per-doc reductions are integer
statistics (rare-word count/fraction, min/total frequency) so results
are exactly reproducible across engines — swap step (3)'s columns for
``-mean(log p)`` when a smoothed LM is wanted (float log sums are
order-sensitive; see textstats for the left-assoc-fold recipe).

Scale shape: the frequency table is Zipf-skewed but the aggregation is
two-phase (map-side combine), and the score join is keyed by word —
broadcast when the vocabulary fits (typical after min-count pruning),
else a shuffle join whose hot keys are exactly the words that matter
least (high-frequency words are never "rare").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import words_udf


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact corpus unigram frequencies: (word, n) — one two-phase
    aggregation over the exploded (order-preserving) word stream."""
    return (docs.select(F.explode(words_udf(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def rarity_scores(docs: DataFrame, rare_max_count: int = 2,
                  id_col: str = "doc_id", text_col: str = "text",
                  broadcast_vocab: bool = True) -> DataFrame:
    """Per-doc rarity statistics against the corpus frequency table.

    Output: (id, n_words, n_rare, rare_frac, min_count, sum_count).
    ``n_rare`` counts word OCCURRENCES whose corpus frequency is
    <= rare_max_count; docs with no words score null min_count and
    zero fractions.
    """
    freq = unigram_counts(docs, text_col)
    if broadcast_vocab:
        freq = F.broadcast(freq)
    w = docs.select(F.col(id_col).alias("id"),
                    F.explode_outer(words_udf(F.col(text_col)))
                    .alias("word"))
    joined = w.join(freq, "word", "left")   # null word rows keep the doc
    return (joined.groupBy("id")
            .agg(F.count("word").alias("n_words"),
                 F.sum(F.when(F.col("n") <= rare_max_count, 1)
                       .otherwise(0)).cast("bigint").alias("n_rare"),
                 F.min("n").alias("min_count"),
                 F.coalesce(F.sum("n"), F.lit(0)).cast("bigint")
                 .alias("sum_count"))
            .withColumn(
                "rare_frac",
                F.when(F.col("n_words") > 0,
                       F.col("n_rare").cast("double")
                       / F.col("n_words").cast("double"))
                .otherwise(F.lit(0.0)))
            .select("id", "n_words", "n_rare", "rare_frac", "min_count",
                    "sum_count"))
