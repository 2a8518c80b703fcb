"""Hashed-feature batch perceptron: a trainable document-quality
classifier whose training AND scoring are exact integer arithmetic —
deterministic under any partitioning, reproducible bit-for-bit by a SQL
oracle.

The fastText-style recipe (hashed bag-of-ngrams linear classifier —
Joulin et al. 2016) with the perceptron update rule (Collins 2002) in
place of logistic loss: integer weights mean the per-epoch gradient is a
SUM OF INTEGERS, which commutes exactly — no floating-point
order-sensitivity across partitions, engines, or reruns. Logistic
training would be ulp-order-dependent through every epoch; the perceptron
trades a calibrated probability for exactness and keeps the part that
matters for a corpus filter: a learned linear ranking over hashed n-gram
features.

Per epoch (batch update):

1. Score every doc under the current weights — a narrow integer fold of
   the doc's gram-bucket array into a one-row broadcast weight array
   (identical plan shape to ``dsir.dsir_score``: zero Python, zero
   shuffle).
2. Misclassified = ``label * score <= 0`` (epoch 0 starts at w = 0, so
   every doc is misclassified and the first update is the class-difference
   of bucket counts — a useful centroid-ish init).
3. Gradient: explode misclassified docs' gram buckets, ONE
   groupBy(bucket) agg of ``sum(label)`` — partial aggregation caps the
   shuffle at ``num_buckets`` rows per partition regardless of corpus
   size; the collected gradient is O(num_buckets) scalars (the model, not
   the data — same rule as the DSIR log-ratio).
4. Driver-side ``w += lr * grad`` over plain ints.

At 100 TB each epoch is one documents-scan + one bounded shuffle;
``epochs`` is a small constant (the perceptron on hashed features
saturates in a handful of passes). Scoring a corpus under the frozen
model is a single narrow map.

Features reuse ``dsir.gram_buckets`` (md5-hashed unigrams + bigrams of
the dedup-family normalized tokens) so one tokenization contract serves
selection (DSIR) and classification.

Reference context: hepcrawl's quality decisions are hand-written rule
filters (e.g. ``hepcrawl/spiders/elsevier_spider.py`` allowlists); this
module adds the learned-filter stage of a modern corpus pipeline beside
the rule-based gopher/C4 passes in operators/textstats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dsir import gram_buckets

DEFAULT_BUCKETS = 256


def perceptron_score(
    docs: DataFrame,
    weights: list[int],
    text_col: str = "text",
    out_col: str = "score",
) -> DataFrame:
    """Append the integer classifier score ``sum_b w[b] * count_b(doc)``.
    One-row broadcast carrier + whole-stage-codegen fold — no shuffle, no
    Python (the same plan family as ``dsir.dsir_score``)."""
    spark = SparkSession.getActiveSession() or docs.sparkSession
    arr = spark.createDataFrame(
        [([int(x) for x in weights],)], "__pw: array<bigint>"
    )
    fold = F.aggregate(
        gram_buckets(text_col, len(weights)),
        F.lit(0).cast("bigint"),
        lambda acc, b: acc + F.element_at(F.col("__pw"), (b + 1).cast("int")),
    )
    return (
        docs.crossJoin(F.broadcast(arr))
        .withColumn(out_col, fold)
        .drop("__pw")
    )


def perceptron_train(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    epochs: int = 3,
    lr: int = 1,
) -> list[int]:
    """Train a batch perceptron over hashed gram features; returns the
    integer weight vector (length ``num_buckets``).

    ``label_col`` must hold +1 / -1. Each epoch runs one scan (score +
    misclassified filter + gram explode) and one bounded groupBy(bucket)
    shuffle; the update itself is O(num_buckets) driver scalars. All
    arithmetic is integer-exact, so the trained weights are a pure
    function of (corpus, params) — independent of partitioning or
    execution order.
    """
    if lr <= 0 or epochs <= 0:
        raise ValueError("need lr >= 1 and epochs >= 1")
    w = [0] * num_buckets
    lbl = F.col(label_col).cast("bigint")
    for _ in range(epochs):
        mis = perceptron_score(docs, w, text_col, "__ps").filter(
            lbl * F.col("__ps") <= 0
        )
        grad_rows = (
            mis.select(
                lbl.alias("__lbl"),
                F.explode(gram_buckets(text_col, num_buckets)).alias("bucket"),
            )
            .groupBy("bucket")
            .agg(F.sum("__lbl").alias("g"))
            .collect()
        )
        if not grad_rows:
            break  # linearly separated — converged
        for r in grad_rows:
            w[int(r["bucket"])] += lr * int(r["g"])
    return w
