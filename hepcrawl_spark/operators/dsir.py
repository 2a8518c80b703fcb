"""DSIR-style importance resampling: select raw-pool documents that look
like a target domain (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling").

Method, re-expressed Spark-first:

1. **Fit** bag-of-hashed-ngrams models over the target corpus (p) and the
   raw pool (q): every unigram+bigram hashes into one of ``num_buckets``
   buckets; each model is just the per-bucket occurrence count vector.
2. **Score** each raw document by its log importance weight
   ``log w(x) = sum_grams [log p(bucket) - log q(bucket)]`` under add-alpha
   smoothing.
3. **Sample** k documents without replacement with probability
   proportional to ``w(x)^(1/T)`` via the Gumbel top-k trick
   (key = logw/T + Gumbel noise; take the k largest keys).

Scale shape (the whole point of doing this in Spark):

- Fitting is ONE explode + groupBy(bucket) per corpus — map-side partial
  aggregation reduces each partition to at most ``num_buckets`` rows, so
  the shuffle moves O(partitions x buckets) counts, never the text. At
  100 TB with 2^16 buckets that is a few MB per partition.
- The bucket-count vectors are tiny (<= num_buckets rows); the log-ratio
  array is computed driver-side and shipped back as a one-row BROADCAST
  (BroadcastNestedLoopJoin of a single row — no shuffle, no skew).
- Scoring is a NARROW per-row fold (``F.aggregate`` over the gram array
  with ``element_at`` into the broadcast array): whole-stage-codegen'd
  column expressions, zero Python, zero shuffle.
- Sampling is a global top-k = ``orderBy(...).limit(k)`` which Spark
  executes as TakeOrderedAndProject (per-partition heap + driver merge of
  k rows), NOT a full sort shuffle.

Hashes use the portable md5 recipe (``functions/hashing.portable_hash32``)
so a DuckDB oracle reproduces bucket ids bit-identically; the Gumbel
uniform is the same md5 recipe offset by +0.5/2^32 so u is never 0 or 1.

Reference context: hepcrawl has no data-selection stage (its filters are
rule-based, e.g. ``hepcrawl/spiders/elsevier_spider.py`` allowlists); this
module is part of the beyond-reference LLM-pipeline suite alongside
operators/dedup.py and operators/textstats.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import normalize_text

DEFAULT_BUCKETS = 512  # tests/oracle scale; production: 2**16 (DSIR paper)


def gram_buckets(
    text_col: Column | str = "text", num_buckets: int = DEFAULT_BUCKETS
) -> Column:
    """array<bigint> of hashed-ngram bucket ids (unigrams + bigrams, one
    entry per OCCURRENCE — multiplicity matters for the count models).

    Tokens come from the same whitespace-collapse normalization the dedup
    family uses, so the DuckDB twin is ``string_split`` of the shared
    ``_NORM_SQL`` expression.
    """
    toks = F.split(normalize_text(text_col), " ")
    n = F.size(toks)
    # bigrams: zip_with over the two shifted slices; slice length 0 when a
    # doc has a single token (slice/zip_with of empty arrays -> empty).
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 7), 16, 10).cast("bigint"),
            F.lit(num_buckets),
        ),
    )


def bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(bucket, cnt) occurrence counts — the fitted hashed-ngram model.

    One explode + groupBy(bucket): partial aggregation caps the shuffle at
    ``num_buckets`` rows per input partition regardless of corpus size.
    """
    return (
        docs.select(
            F.explode(gram_buckets(text_col, num_buckets)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_logratio(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> list[float]:
    """Per-bucket ``log p_target - log q_raw`` under add-``alpha``
    smoothing, as a plain list (length ``num_buckets``).

    Collecting here is O(num_buckets) scalars — the model, not the data.
    """
    tc = dict(bucket_counts(target, text_col, num_buckets).collect())
    rc = dict(bucket_counts(raw, text_col, num_buckets).collect())
    t_tot = sum(tc.values())
    r_tot = sum(rc.values())
    td = t_tot + alpha * num_buckets
    rd = r_tot + alpha * num_buckets
    return [
        math.log((tc.get(b, 0) + alpha) / td)
        - math.log((rc.get(b, 0) + alpha) / rd)
        for b in range(num_buckets)
    ]


def dsir_score(
    raw: DataFrame,
    logratio: list[float],
    text_col: str = "text",
    out_col: str = "logw",
) -> DataFrame:
    """Append the log importance weight: a narrow fold over the doc's gram
    buckets into the broadcast log-ratio array. No shuffle, no Python.
    """
    spark = SparkSession.getActiveSession() or raw.sparkSession
    # one-row broadcast carrier: keeps the (possibly 2^16-entry) array out
    # of the plan's literal tree and ships it once per executor.
    arr = spark.createDataFrame(
        [([float(x) for x in logratio],)], "__dsir_lr: array<double>"
    )
    num_buckets = len(logratio)
    scored = raw.crossJoin(F.broadcast(arr)).withColumn(
        out_col,
        F.aggregate(
            gram_buckets(text_col, num_buckets),
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(F.col("__dsir_lr"), (b + 1).cast("int")),
        ),
    )
    return scored.drop("__dsir_lr")


def gumbel_key(
    logw_col: Column | str,
    id_col: Column | str = "doc_id",
    seed: str = "dsir",
    temperature: float = 1.0,
) -> Column:
    """Gumbel top-k sampling key: ``logw/T - ln(-ln(u))`` with u a
    deterministic uniform in (0,1) from the portable md5 recipe — the doc's
    fate is a pure function of (id, seed), stable across runs/retries.

    u = (first-8-hex-of-md5 + 0.5) / 2^32 — the +0.5 keeps u strictly
    inside (0,1) so neither log can hit 0 or -inf.
    """
    w = F.col(logw_col) if isinstance(logw_col, str) else logw_col
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(seed))), 1, 8), 16, 10
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))
    return w / F.lit(float(temperature)) - F.log(-F.log(u))


def dsir_sample(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "logw",
    seed: str = "dsir",
    temperature: float = 1.0,
) -> DataFrame:
    """Sample ``k`` docs without replacement with probability proportional
    to ``exp(logw)^(1/T)`` (Gumbel top-k). ``orderBy().limit(k)`` compiles
    to TakeOrderedAndProject — per-partition heaps, no global sort shuffle.
    """
    key = gumbel_key(logw_col, id_col, seed, temperature).alias("__dsir_key")
    return (
        scored.withColumn("__dsir_key", key)
        .orderBy(F.col("__dsir_key").desc(), F.col(id_col))
        .limit(k)
        .drop("__dsir_key")
    )


def dsir_select(
    target: DataFrame,
    raw: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    seed: str = "dsir",
    temperature: float = 1.0,
) -> DataFrame:
    """Fit + score + sample in one call (the paper's end-to-end recipe)."""
    lr = dsir_logratio(target, raw, text_col, num_buckets, alpha)
    scored = dsir_score(raw, lr, text_col)
    return dsir_sample(scored, k, id_col, "logw", seed, temperature)
