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

- Fitting is ONE Arrow pass + groupBy(bucket) per corpus — each task folds
  its batches into a Counter (a per-task partial aggregate of at most
  ``num_buckets`` rows), so the shuffle moves O(tasks x buckets) counts,
  never the text. At 100 TB with 2^16 buckets that is a few MB per task.
- The bucket-count vectors are tiny (<= num_buckets rows); the log-ratio
  array is computed driver-side and shipped back inside the scoring
  closure (O(num_buckets) doubles per task — no shuffle, no skew).
- Scoring is a NARROW per-row fold over the gram ids into that array,
  done in the same Arrow pass that tokenizes and hashes: zero shuffle,
  one Python boundary crossing for the text column only.
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
import re as _re
from hashlib import md5 as _md5

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import spread
from .dedup import normalize_text

DEFAULT_BUCKETS = 512  # tests/oracle scale; production: 2**16 (DSIR paper)

# Python twin of the tokenizer behind gram_buckets. re.ASCII makes \s the
# same [ \t\n\x0B\f\r] class Java regex uses (Spark's regexp_replace), so
# token boundaries are bit-identical across the JVM and Python paths.
_WS_RE = _re.compile(r"\s+", _re.ASCII)


def py_gram_ids(text: str, num_buckets: int) -> list[int]:
    """Python twin of :func:`gram_buckets`: same normalization (lower,
    ASCII-whitespace collapse, trim), same unigram-then-bigram order, same
    md5-prefix bucket ids. Kept bit-identical so the Arrow fast paths below
    reproduce the JVM/oracle values exactly (verified by the x24/x25/x47
    oracle queries and test_dsir/test_classifier)."""
    s = _WS_RE.sub(" ", text.lower()).strip(" ")
    toks = s.split(" ")
    grams = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
    return [
        int(_md5(g.encode("utf-8")).hexdigest()[:7], 16) % num_buckets
        for g in grams
    ]


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

    One Arrow pass + groupBy(bucket): each task folds its batches into a
    Counter (a per-task partial aggregate, at most ``num_buckets`` rows per
    task) and the final groupBy sums those partials — integer-exact, so the
    fitted model is unchanged. The tokenize+md5 work runs in Python/hashlib
    (``py_gram_ids``) instead of the former explode over an interpreted
    ``transform`` lambda: one corpus pass at sf1-scale drops ~8.4 s → <1 s
    (guide §4.2 — bulk work in native batch code, only (bucket, cnt) pairs
    cross the boundary).
    """
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("bucket", T.LongType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def _partials(batches):
        from collections import Counter

        c: Counter = Counter()
        for pdf in batches:
            for txt in pdf[text_col]:
                if txt is not None:
                    c.update(py_gram_ids(txt, num_buckets))
        if c:
            yield pd.DataFrame(
                {"bucket": list(c.keys()), "cnt": list(c.values())}
            )

    return (
        spread(docs.select(text_col))
        .mapInPandas(_partials, schema)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
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
    """Append the log importance weight: one Arrow pass that tokenizes,
    hashes and folds each doc's gram buckets into the log-ratio array held
    as a NumPy closure (shipped once per task). No shuffle.

    The fold accumulates LEFT-TO-RIGHT in gram order via ``cumsum`` (numpy
    cumsum is a sequential scan, not pairwise summation), so every logw is
    bit-identical to the previous JVM ``F.aggregate`` fold and to the
    DuckDB oracle's (x24/x25 gate at milli rounding). Replaces a per-gram
    interpreted element_at lambda — one scoring pass at sf1-scale drops
    ~8.8 s → <1 s.
    """
    import pandas as pd

    if out_col in raw.columns:
        # the old withColumn REPLACED an existing column; appending it to
        # the schema would produce a duplicate field and an Arrow mismatch
        raw = raw.drop(out_col)
    num_buckets = len(logratio)
    out_schema = T.StructType(list(raw.schema.fields) + [T.StructField(out_col, T.DoubleType())])

    def _score(batches):
        import numpy as np

        lr = np.asarray(logratio, dtype=np.float64)
        for pdf in batches:
            vals: list[float | None] = []
            any_null = False
            for txt in pdf[text_col]:
                if txt is None:
                    vals.append(None)  # matches the old fold over a null array
                    any_null = True
                else:
                    ids = py_gram_ids(txt, num_buckets)
                    vals.append(float(lr[ids].cumsum()[-1]))
            out = pdf.copy()
            out[out_col] = pd.Series(
                vals, index=pdf.index, dtype="object" if any_null else "float64"
            )
            yield out

    return spread(raw).mapInPandas(_score, out_schema)


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
