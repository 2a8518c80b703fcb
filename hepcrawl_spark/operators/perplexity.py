"""CCNet-style language-model perplexity filtering (Wenzek et al. 2020).

CCNet scores every web document by the perplexity of a small LM trained on
a trusted target corpus (Wikipedia in the paper) and keeps/labels docs by
score tercile — low-perplexity text "looks like" the target. The full
KenLM 5-gram model doesn't fit a relational engine, but its job here is a
RANKING signal, and a hashed add-alpha bigram LM preserves the ranking
machinery while staying 100 % expressible as DataFrame ops (and therefore
oracle-checkable bit-for-bit):

    log p(w_i | w_{i-1}) = ln( (c2[b2(w_{i-1} w_i)] + a)
                             / (c1[b1(w_{i-1})] + a * B) )
    cross_entropy(doc)   = -(1/n_bigrams) * sum_i log p(w_i | w_{i-1})
    perplexity           = exp(cross_entropy)

where c1/c2 are hashed unigram/bigram occurrence counts over the target
corpus (the same portable-md5 bucket recipe as ``operators/dsir.py``).

Scale shape — identical to DSIR's, which is the point:

- **Fit** is one explode + groupBy(bucket) per gram order; map-side
  partial aggregation caps the shuffle at ``num_buckets`` rows per
  partition. The model IS the two count vectors (O(B) scalars collected
  driver-side — the model, never the data).
- **Score** ships the two vectors back as a one-row broadcast and folds
  ``zip_with(context_buckets, bigram_buckets)`` into them with
  ``F.aggregate`` + ``element_at`` — narrow, zero shuffle, zero Python,
  whole-stage codegen.
- **Tercile split** needs two scalar thresholds: one
  ``percentile_approx`` aggregate (t-digest, single reduce) collected to
  the driver and compared as literals — never a global sort.

Reference context: hepcrawl has no statistical quality stage; this joins
the beyond-reference LLM-pipeline suite (Gopher rules in textstats.py,
DSIR in dsir.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import normalize_text
from .dsir import DEFAULT_BUCKETS


def _bucket(g: Column, num_buckets: int) -> Column:
    return F.pmod(
        F.conv(F.substring(F.md5(g), 1, 7), 16, 10).cast("bigint"),
        F.lit(num_buckets),
    )


def _toks(text_col: Column | str) -> Column:
    return F.split(normalize_text(text_col), " ")


def context_buckets(
    text_col: Column | str = "text", num_buckets: int = DEFAULT_BUCKETS
) -> Column:
    """Unigram bucket of each bigram's CONTEXT token (positions 1..n-1)."""
    toks = _toks(text_col)
    n = F.size(toks)
    ctx = F.slice(toks, 1, F.greatest(n - 1, F.lit(0)))
    return F.transform(ctx, lambda t: _bucket(t, num_buckets))


def bigram_buckets(
    text_col: Column | str = "text", num_buckets: int = DEFAULT_BUCKETS
) -> Column:
    """Bigram bucket ids, positionally aligned with ``context_buckets``."""
    toks = _toks(text_col)
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.transform(pairs, lambda g: _bucket(g, num_buckets))


@dataclass
class BigramLM:
    """Hashed add-alpha bigram model: two bucket-count vectors."""

    unigram: list[int]
    bigram: list[int]
    alpha: float
    num_buckets: int


def fit_bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> BigramLM:
    """Fit the count model over the target corpus. One explode +
    groupBy(bucket) per gram order; collecting is O(num_buckets)."""
    uni = dict(
        corpus.select(
            F.explode(
                F.transform(
                    _toks(text_col), lambda t: _bucket(t, num_buckets)
                )
            ).alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    )
    bi = dict(
        corpus.select(
            F.explode(bigram_buckets(text_col, num_buckets)).alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    )
    return BigramLM(
        unigram=[int(uni.get(b, 0)) for b in range(num_buckets)],
        bigram=[int(bi.get(b, 0)) for b in range(num_buckets)],
        alpha=float(alpha),
        num_buckets=num_buckets,
    )


def lm_score(
    docs: DataFrame,
    model: BigramLM,
    text_col: str = "text",
) -> DataFrame:
    """Append ``n_bigrams``, ``cross_entropy`` (nats/bigram) and
    ``perplexity``. Docs under two normalized tokens get NULLs — there is
    no bigram evidence to score.

    The two count vectors ride a one-row broadcast (like
    ``dsir.dsir_score``); the per-doc pass is a fold over the zipped
    (context, bigram) bucket arrays — narrow and codegen'd.
    """
    spark = SparkSession.getActiveSession() or docs.sparkSession
    carrier = spark.createDataFrame(
        [(
            [float(x) for x in model.unigram],
            [float(x) for x in model.bigram],
        )],
        "__lm_uni: array<double>, __lm_bi: array<double>",
    )
    a = F.lit(model.alpha)
    ab = F.lit(model.alpha * model.num_buckets)
    ctx = context_buckets(text_col, model.num_buckets)
    big = bigram_buckets(text_col, model.num_buckets)
    pairs = F.zip_with(
        ctx, big, lambda c, b: F.struct(c.alias("c"), b.alias("b"))
    )
    sumlog = F.aggregate(
        pairs,
        F.lit(0.0),
        lambda acc, p: acc
        + F.log(
            (F.element_at(F.col("__lm_bi"), (p["b"] + 1).cast("int")) + a)
            / (F.element_at(F.col("__lm_uni"), (p["c"] + 1).cast("int")) + ab)
        ),
    )
    n = F.size(ctx)
    ce = F.when(n > 0, -sumlog / n)
    out = (
        docs.crossJoin(F.broadcast(carrier))
        .withColumn("n_bigrams", n.cast("long"))
        .withColumn("cross_entropy", ce)
        .withColumn("perplexity", F.exp(ce))
    )
    return out.drop("__lm_uni", "__lm_bi")


def perplexity_terciles(
    scored: DataFrame,
    col: str = "perplexity",
    out_col: str = "ppl_bucket",
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet's head/middle/tail split: two approximate quantile thresholds
    (one t-digest aggregate, two scalars to the driver) compared as
    literals — no global sort, no window over the whole corpus. NULL
    scores stay NULL-labelled."""
    row = scored.filter(F.col(col).isNotNull()).agg(
        F.percentile_approx(col, [1.0 / 3.0, 2.0 / 3.0], accuracy).alias("q")
    ).collect()[0]
    q = row["q"] or [float("inf"), float("inf")]
    c = F.col(col)
    return scored.withColumn(
        out_col,
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c <= float(q[0]), F.lit("head"))
        .when(c <= float(q[1]), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def ccnet_filter(
    target: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    keep: tuple[str, ...] = ("head", "middle"),
) -> DataFrame:
    """End-to-end CCNet recipe: fit on target, score, tercile, keep the
    low-perplexity buckets."""
    model = fit_bigram_lm(target, text_col, num_buckets, alpha)
    labelled = perplexity_terciles(lm_score(docs, model, text_col))
    return labelled.filter(F.col("ppl_bucket").isin(*keep))
