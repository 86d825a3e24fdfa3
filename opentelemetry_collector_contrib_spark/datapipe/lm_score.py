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


BOS = "<s>"


def bigram_logprob(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   broadcast_model: bool = True) -> DataFrame:
    """Smoothed bigram-LM scoring — the actual perplexity-filter math
    (the module docstring's promised step-3 swap): every document is
    scored by its average add-one-smoothed bigram log-probability
    against the exact corpus bigram model,

        p(w_i | w_{i-1}) = (c2(prev, w) + 1) / (c1(prev) + V)

    with a BOS context for the first word, c1(prev) = Σ_w c2(prev,w)
    and V = |distinct following words|.

    Float discipline (cross-engine reproducible): per-term ln over
    integer-exact rationals, then a LEFT-ASSOCIATIVE fold of the
    per-doc terms in word order (F.aggregate over a position-sorted
    array == DuckDB list_reduce over list(lp ORDER BY pos)); the only
    engine-sensitive ops are ln and one division, absorbed by
    round(,6).

    Scale shape: model = one two-phase aggregation over exploded
    bigrams; scoring = joins keyed by (prev, w) — broadcast when the
    (min-count-prunable) model fits, else shuffle joins on uniform
    hashed pairs.  The per-doc reduce carries O(words) lp values
    through one exchange keyed by doc.

    Output: (id, n_bigrams, avg_lp).
    """
    # prev = words[pos] (element_at is 1-indexed, pos is 0-indexed,
    # so element_at(ws, pos) IS the previous word) — no lag window
    bi = docs.select(
        F.col(id_col).alias("id"),
        words_udf(F.col(text_col)).alias("ws")).select(
        "id", F.posexplode("ws").alias("pos", "w"),
        F.col("ws"))
    bi = bi.withColumn(
        "prev",
        F.when(F.col("pos") == 0, F.lit(BOS))
         .otherwise(F.element_at("ws", F.col("pos")))).drop("ws")
    c2 = bi.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    v = c2.agg(F.countDistinct("w").alias("V"))
    if broadcast_model:
        c2, c1 = F.broadcast(c2), F.broadcast(c1)
    scored = (bi.join(c2, ["prev", "w"]).join(c1, "prev")
              .crossJoin(F.broadcast(v))
              .withColumn(
                  "lp",
                  F.log((F.col("c2") + 1).cast("double")
                        / (F.col("c1") + F.col("V")).cast("double"))))
    per_doc = (scored.groupBy("id")
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    F.sort_array(F.collect_list(F.struct("pos", "lp")))
                    .alias("terms")))
    total = F.expr(
        "aggregate(transform(terms, t -> t.lp), CAST(0.0 AS DOUBLE),"
        " (a, x) -> a + x)")
    return per_doc.select(
        "id", F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(total / F.col("n_bigrams"), 6).alias("avg_lp"))


def bigram_logprob_sql(words_sql: str, src: str = "documents") -> str:
    """DuckDB twin of bigram_logprob (same smoothing, same fold order)."""
    return f"""docs AS (
  SELECT doc_id AS id, {words_sql} AS ws FROM {src}),
bi AS (
  SELECT id, i - 1 AS pos,
         CASE WHEN i = 1 THEN '{BOS}' ELSE ws[i - 1] END AS prev,
         ws[i] AS w
  FROM docs, UNNEST(generate_series(1, len(ws))) AS t(i)),
c2 AS (SELECT prev, w, count(*)::BIGINT AS c2 FROM bi GROUP BY prev, w),
c1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY prev),
vv AS (SELECT count(DISTINCT w)::BIGINT AS V FROM c2),
scored AS (
  SELECT bi.id, bi.pos,
         ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + vv.V AS DOUBLE)) AS lp
  FROM bi JOIN c2 ON bi.prev = c2.prev AND bi.w = c2.w
          JOIN c1 ON bi.prev = c1.prev
          CROSS JOIN vv),
per_doc AS (
  SELECT id, count(*)::BIGINT AS n_bigrams,
         list(lp ORDER BY pos) AS lps
  FROM scored GROUP BY id)
SELECT id, n_bigrams,
       round(list_reduce(lps, (a, b) -> a + b) / n_bigrams, 6) AS avg_lp
FROM per_doc"""


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
