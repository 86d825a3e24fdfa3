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


def tfidf_keywords(docs: DataFrame, top_k: int = 5,
                   id_col: str = "doc_id", text_col: str = "text",
                   broadcast_vocab: bool = True) -> DataFrame:
    """Per-document TF-IDF keyword extraction: the top-k words by
    ``tf * ln(N / df)`` (classic idf; ties broken by word asc).

    Output: (id, rank, word, tf, df, score).  Documents whose words all
    appear in every document (idf = 0) still emit rows — rank order
    then falls back to the word tiebreak, deterministically.

    Scale shape: ONE aggregation keyed by (doc, word) produces term
    frequencies; document frequencies reduce that same frame keyed by
    word (map-side combine on both); N arrives as a broadcast 1-row
    aggregate (never a driver collect); the idf join is broadcast when
    the vocabulary fits (post min-count pruning it usually does), else
    a shuffle join on the word key; top-k is a rank window keyed by the
    doc — O(doc) groups, uniform.
    """
    from pyspark.sql import Window
    from .dedup import words_udf
    words = docs.select(F.col(id_col).alias("id"),
                        F.explode(words_udf(F.col(text_col))).alias("word"))
    tf = words.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    n_docs = docs.agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (tf.join(dfreq, "word")
              .join(F.broadcast(n_docs), how="cross")
              .withColumn(
                  "score",
                  F.col("tf").cast("double")
                  * F.log(F.col("n_docs").cast("double")
                          / F.col("df").cast("double"))))
    w = Window.partitionBy("id").orderBy(F.col("score").desc(),
                                         F.col("word").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("id", "rank", "word", "tf", "df", "score"))
