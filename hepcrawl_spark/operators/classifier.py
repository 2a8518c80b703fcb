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

Per epoch (batch update), ONE fused Arrow pass over the corpus:

1. Each task scores its docs under the current weights (integer fold of
   the doc's gram buckets into the weight array, carried as a NumPy
   closure — identical recipe to ``dsir.dsir_score``).
2. Misclassified = ``label * score <= 0`` (epoch 0 starts at w = 0, so
   every doc is misclassified and the first update is the class-difference
   of bucket counts — a useful centroid-ish init).
3. The same task accumulates misclassified docs' per-bucket label sums in
   a local Counter — a partial aggregate capping the shuffle at
   ``num_buckets`` rows per task regardless of corpus size; the collected
   gradient is O(num_buckets) scalars (the model, not the data — same
   rule as the DSIR log-ratio).
4. Driver-side ``w += lr * grad`` over plain ints.

At 100 TB each epoch is one documents-scan + one bounded shuffle;
``epochs`` is a small constant (the perceptron on hashed features
saturates in a handful of passes). Scoring a corpus under the frozen
model is a single narrow map.

Features reuse the DSIR tokenization contract (``dsir.py_gram_ids``, the
Python twin of ``dsir.gram_buckets`` — md5-hashed unigrams + bigrams of
the dedup-family normalized tokens) so one contract serves selection
(DSIR) and classification.

Reference context: hepcrawl's quality decisions are hand-written rule
filters (e.g. ``hepcrawl/spiders/elsevier_spider.py`` allowlists); this
module adds the learned-filter stage of a modern corpus pipeline beside
the rule-based gopher/C4 passes in operators/textstats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import spread
from .dsir import py_gram_ids

DEFAULT_BUCKETS = 256


def perceptron_score(
    docs: DataFrame,
    weights: list[int],
    text_col: str = "text",
    out_col: str = "score",
) -> DataFrame:
    """Append the integer classifier score ``sum_b w[b] * count_b(doc)``.
    One Arrow pass, no shuffle: tokenize+hash in Python/hashlib
    (``dsir.py_gram_ids``, bit-identical to the JVM gram_buckets) and fold
    the weight array held as a NumPy closure. Integer sums commute, so the
    scores are exactly the old fold's values; replaces a per-gram
    interpreted element_at lambda (guide §4.2)."""
    import pandas as pd

    if out_col in docs.columns:
        # old withColumn semantics replaced an existing score column
        docs = docs.drop(out_col)
    num_buckets = len(weights)
    out_schema = T.StructType(
        list(docs.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def _score(batches):
        import numpy as np

        w = np.asarray([int(x) for x in weights], dtype=np.int64)
        for pdf in batches:
            vals = [
                int(w[py_gram_ids(txt, num_buckets)].sum()) if txt is not None else None
                for txt in pdf[text_col]
            ]
            out = pdf.copy()
            dt = "object" if any(v is None for v in vals) else "int64"
            out[out_col] = pd.Series(vals, index=pdf.index, dtype=dt)
            yield out

    return spread(docs).mapInPandas(_score, out_schema)


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
    import pandas as pd

    w = [0] * num_buckets
    grad_schema = T.StructType(
        [T.StructField("bucket", T.LongType()), T.StructField("g", T.LongType())]
    )
    narrow = spread(docs.select(label_col, text_col))
    for _ in range(epochs):
        # One fused Arrow pass per epoch: score each doc under the current
        # weights AND accumulate the misclassified docs' per-bucket label
        # sums in a task-local Counter (a partial aggregate — at most
        # num_buckets rows per task cross the shuffle). Replaces the old
        # two-pass epoch (score fold + explode/groupBy), which tokenized
        # and hashed the corpus twice; every sum is integer, so the
        # trained weights are bit-identical.
        cur_w = list(w)

        def _grad(batches, cur_w=cur_w):
            import numpy as np
            from collections import Counter

            wa = np.asarray(cur_w, dtype=np.int64)
            c: Counter = Counter()
            for pdf in batches:
                for lab, txt in zip(pdf[label_col], pdf[text_col]):
                    # pd.isna also catches the NaN a nullable int label
                    # column becomes in Arrow; the old SQL filter evaluated
                    # NULL * score <= 0 to NULL -> row excluded
                    if txt is None or pd.isna(lab):
                        continue
                    ids = py_gram_ids(txt, num_buckets)
                    if int(lab) * int(wa[ids].sum()) <= 0:
                        lab_i = int(lab)
                        for b in ids:
                            c[b] += lab_i
            if c:
                yield pd.DataFrame({"bucket": list(c.keys()), "g": list(c.values())})

        grad_rows = (
            narrow.mapInPandas(_grad, grad_schema)
            .groupBy("bucket")
            .agg(F.sum("g").alias("g"))
            .collect()
        )
        if not grad_rows:
            break  # linearly separated — converged
        for r in grad_rows:
            w[int(r["bucket"])] += lr * int(r["g"])
    return w
