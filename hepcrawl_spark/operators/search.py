"""BM25 keyword search over the corpus: inverted index + ranked retrieval.

The retrieval counterpart to the embedding ANN family (`similarity.py`,
`pq.py`): a term-based index a corpus pipeline needs for decontamination
audits, "which documents mention X" forensics, and hybrid (keyword +
vector) retrieval. Classic Okapi/Lucene BM25, re-expressed Spark-first:

- **Build** (`build_bm25_index`): one tokenize-explode, then two
  key-partitioned aggregations — per-(term, doc) term frequency and
  per-doc length — DENORMALIZED into a single postings table
  ``(term, doc_id, tf, dl, df)``. Carrying ``dl`` and ``df`` in the
  posting row costs a few bytes but removes BOTH query-time joins: at
  serving time a query touches only its own terms' postings.
- **Serve** (`bm25_topk`): the query term set broadcast-joins the
  postings (at scale: postings written partitioned/bucketed BY TERM, so
  the term filter is partition pruning and the scan is
  O(sum df(term)) — the inverted-index access path, not a corpus scan),
  per-posting contributions are pure column arithmetic, and one
  groupBy(query_id, doc_id) + per-query top-k window finishes.

Scoring (Lucene variant, non-negative idf):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))

``N`` and ``avgdl`` are two exact-integer scalars collected at build
time (the model, not the data — same contract as ``dsir_logratio``).

Reference context: beyond-reference (hepcrawl has no search); tokens use
the shared ``dedup.normalize_text`` so the index agrees with the dedup/
langid family and the DuckDB oracle twin.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text


@dataclass
class BM25Index:
    postings: DataFrame  # (term, doc_id, tf, dl, df)
    n_docs: int
    total_len: int

    @property
    def avgdl(self) -> float:
        return self.total_len / self.n_docs if self.n_docs else 0.0


def build_bm25_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> BM25Index:
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("term"),
    )
    tf = base.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = base.groupBy("doc_id").agg(F.count("*").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    postings = tf.join(dl, "doc_id").join(df_t, "term").select(
        "term", "doc_id", "tf", "dl", "df"
    )
    stats = dl.agg(
        F.count("*").alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    return BM25Index(
        postings=postings,
        n_docs=int(stats["n"] or 0),
        total_len=int(stats["total"] or 0),
    )


def bm25_topk(
    index: BM25Index,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``queries``: (query_id, term) rows — the query's term multiset is
    collapsed to a set (standard bag-of-words BM25). Returns
    (query_id, doc_id, score, rank)."""
    qt = queries.select("query_id", "term").distinct()
    n, avgdl = F.lit(float(index.n_docs)), F.lit(float(index.avgdl))
    idf = F.log(
        F.lit(1.0) + (n - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfn = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (1.0 - b + F.lit(b) * F.col("dl") / avgdl)
    )
    contrib = index.postings.join(F.broadcast(qt), "term").select(
        "query_id", "doc_id", (idf * tfn).alias("c")
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid
    glue between this module's BM25 ranks and the ANN family's cosine
    ranks: score(d) = sum over lists of 1/(c + rank_list(d)).

    Each input carries (query_id, id_col, rank). RRF only consumes RANKS,
    so keyword scores and cosine scores never need calibrating against
    each other. The union is tiny (top-k per list per query); one
    groupBy + per-query window finishes — nothing touches the corpus.
    """
    unioned = ranked_lists[0].select("query_id", id_col, "rank")
    for df in ranked_lists[1:]:
        unioned = unioned.unionByName(df.select("query_id", id_col, "rank"))
    fused = unioned.groupBy("query_id", id_col).agg(
        F.sum(1.0 / (F.lit(float(c)) + F.col("rank"))).alias("rrf_score"),
        F.count("*").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
