"""Lexical retrieval over the `documents` table: BM25 scoring and
per-document TF-IDF top terms.

These are the ranking/feature half of a training-data pipeline's text
stack (the dedup/quality half lives in text.py / dedup.py): BM25 powers
"find documents like this query" curation sweeps, TF-IDF top-terms is
the classic cheap document descriptor for clustering / topic sampling.

Scale shape (both ops):
  * tokenization is an in-row Catalyst expression (split / filter /
    explode) — narrow, codegen'd, linear;
  * corpus statistics (document frequency, avg doc length) are tiny
    keyed/global aggregates with map-side partial aggregation — the
    hot-key concern of a stopword term is absorbed by partial agg
    because COUNT is algebraic;
  * the per-(doc, term) join back to corpus stats broadcasts (term
    vocabulary ≪ corpus; the BM25 path filters to the query's terms
    BEFORE the explode, so its exploded row count is |matching tokens|,
    not |all tokens|);
  * final top-k is TakeOrderedAndProject (BM25, global k) or a
    WindowGroupLimit-eligible per-doc rank (TF-IDF) — never a global
    sort of the corpus.

Determinism: only +,-,*,/ on doubles plus one ln() per term (rounded
to 6 decimals at the end); ties broken on ids. Cross-checked against
DuckDB by tools/oracle_check.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _doc_tokens(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return docs.select("doc_id", F.size(toks).alias("dl"), toks.alias("toks"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Okapi BM25 (Robertson/Sparck Jones; the Lucene-default
    ln(1 + (N - df + .5)/(df + .5)) idf) of `query_terms` against every
    document; global top-k rows (score desc, doc_id asc).

    The query-term filter runs INSIDE the token array before explode,
    so the shuffled/exploded volume is only matching tokens. df and
    corpus stats are one-row / |terms|-row aggregates joined back by
    broadcast. Returns (doc_id, n_terms_hit, score).
    """
    tokd = _doc_tokens(docs)
    stats = tokd.agg(
        F.avg("dl").alias("avgdl"), F.count("*").alias("n_docs")
    )
    hits = tokd.select(
        "doc_id",
        "dl",
        F.explode(F.filter("toks", lambda t: t.isin(*query_terms))).alias("term"),
    )
    tf = hits.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_), "term").join(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (1.0 + k1)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    per_term = scored.select(
        "doc_id", "term", (idf * tf_part).alias("term_score")
    )
    ranked = (
        per_term.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.round(F.sum("term_score"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(top_k)
    )
    return ranked


def tfidf_top_terms(docs: DataFrame, top_k: int = 3) -> DataFrame:
    """Per-document top-k terms by TF-IDF (tf * ln(N/df)), ties broken
    alphabetically — the cheap document descriptor used for topic
    clustering and stratified corpus sampling.

    One explode → (doc, term) tf agg → term df agg joined back → per-doc
    rank. The df join is deliberately NOT hint-broadcast: the
    vocabulary scales with the corpus (a table that grows with the
    data is never broadcast-safe) — AQE broadcasts it while it is
    small and shuffle-joins on the term key at scale, where both sides
    already carry term-keyed partitioning from their aggregates. The
    rank window partitions by doc_id with a row_number()<=k filter,
    which Spark executes as WindowGroupLimit (per-partition top-k
    heap, no full sort of the posting set).
    Returns (doc_id, term, tf, df, tfidf, rank).
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        tf.join(df_, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "term", "tf", "df", "tfidf", F.col("rank").cast("long").alias("rank"))
    )
