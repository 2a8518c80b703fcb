"""Training-corpus preparation: PII redaction, deterministic mixing,
document chunking.

Three operations every LLM-data pipeline runs between "crawled pages" and
"training samples", all pure column expressions (JVM regex / hash / array
ops — no Python anywhere):

- ``redact_pii``: replace emails / phone numbers / IPv4s with typed
  placeholder tokens (the public-corpus convention, e.g. RefinedWeb's
  [EMAIL]/[PHONE]) and count what was removed per doc.
- ``sample_by_source``: reproducible per-source sampling by hash
  threshold — the doc's fate is a pure function of (id, seed, rate), so
  re-running the pipeline (or sampling a superset later) keeps decisions
  stable; ``df.sample`` cannot promise that across partitions/retries.
- ``chunk_documents``: split token streams into fixed-size overlapping
  chunks (training-sample construction) via slice/transform over the
  token array — one explode, no UDF, deterministic chunk ids.

At 100 TB all three are narrow or single-explode maps over the documents
scan; chunking's output rows carry (doc_id, chunk_id) so downstream
shuffles key on small ids, never the text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# conservative, precision-first patterns (public-corpus convention): a
# false negative leaks one string; a false positive mangles prose.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b"
PHONE_RE = r"(?<!\w)\+?[0-9][0-9()\-\s.]{7,16}[0-9](?!\w)"


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace emails/IPv4s/phone-like runs with [EMAIL]/[IP]/[PHONE] and
    append per-doc removal counts. Order matters: emails first (their
    digits would otherwise feed the phone pattern), then IPs, then phones.
    """
    out_col = out_col or text_col
    c = F.col(text_col)
    n_email = F.regexp_count(c, F.lit(EMAIL_RE))
    after_email = F.regexp_replace(c, EMAIL_RE, "[EMAIL]")
    n_ip = F.regexp_count(after_email, F.lit(IPV4_RE))
    after_ip = F.regexp_replace(after_email, IPV4_RE, "[IP]")
    n_phone = F.regexp_count(after_ip, F.lit(PHONE_RE))
    after_phone = F.regexp_replace(after_ip, PHONE_RE, "[PHONE]")
    return docs.withColumns(
        {
            out_col: after_phone,
            "n_emails": n_email,
            "n_ips": n_ip,
            "n_phones": n_phone,
        }
    )


def sample_hash(id_col: Column | str, seed: str) -> Column:
    """Uniform [0, 1) hash of (id, seed) — xxhash64 folded to 30 bits so
    the fraction is exact in a double and identical in any engine with the
    same hash (DuckDB twin: hash comparison via the md5 recipe)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    # md5-based for cross-engine portability (functions/hashing recipe)
    h = F.conv(F.substring(F.md5(F.concat(c.cast("string"), F.lit(seed))), 1, 8), 16, 10)
    return h.cast("double") / F.lit(float(1 << 32))


def sample_by_source(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic training-mix sampling: keep a doc iff
    hash(id, seed) < rate(source). Same (id, seed) -> same fate, forever —
    adding a source or re-running never reshuffles earlier decisions."""
    rate = None
    for src, r in sorted(rates.items()):
        cond = F.when(F.col(source_col) == src, F.lit(float(r)))
        rate = cond if rate is None else rate.when(
            F.col(source_col) == src, F.lit(float(r))
        )
    rate = (
        rate.otherwise(F.lit(float(default_rate)))
        if rate is not None
        else F.lit(float(default_rate))
    )
    return docs.filter(sample_hash(id_col, seed) < rate)


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 1,
) -> DataFrame:
    """Token-window chunking: whitespace tokens -> windows of
    ``chunk_tokens`` advancing by ``chunk_tokens - overlap`` -> one row per
    chunk (id, chunk_id, chunk_text, n_tokens). The final short window is
    kept when it has >= ``min_tokens`` NEW tokens. Slice/transform over the
    token array, one explode — no Python, deterministic."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / step).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.slice(toks, i * step + 1, chunk_tokens).alias("toks"),
        ),
    )
    out = (
        # null or whitespace-only text must yield zero chunks —
        # greatest(null, 1) / split('') would otherwise fabricate one
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.explode(chunks).alias("ch"))
        .select(
            id_col,
            F.col("ch.chunk_id").alias("chunk_id"),
            F.concat_ws(" ", F.col("ch.toks")).alias("chunk_text"),
            F.size(F.col("ch.toks")).alias("n_tokens"),
        )
    )
    # drop a trailing fragment that adds fewer than min_tokens new tokens
    return out.filter(
        (F.col("chunk_id") == 0)
        | (F.col("n_tokens") - overlap >= F.lit(min_tokens))
    )


def leakage_safe_split(
    labeled_docs: DataFrame,
    val_frac: float = 0.1,
    component_col: str = "component",
    seed: str = "split1",
    out_col: str = "split",
) -> DataFrame:
    """Train/validation split that cannot leak near-duplicates: the split
    hash is taken on the DEDUP COMPONENT (from
    ``components.dedup_clusters``), not the document, so every member of
    a near-dup cluster lands on the same side of the boundary. Splitting
    by doc hash — the naive approach — puts ~2 x val_frac x dup_rate of
    each cluster pair across the line, which is exactly the eval
    contamination the dedup pass existed to prevent.

    Same deterministic md5 recipe as ``sample_hash``: a component's fate
    is a pure function of (component, seed) — stable across runs,
    re-partitions, and corpus growth that doesn't merge clusters."""
    u = sample_hash(component_col, seed)
    return labeled_docs.withColumn(
        out_col, F.when(u < F.lit(float(val_frac)), F.lit("val")).otherwise(F.lit("train"))
    )


def cap_per_key(
    df: DataFrame,
    key_col: str = "host",
    order_col: str = "quality",
    id_col: str = "doc_id",
    k: int = 100,
    descending: bool = True,
) -> DataFrame:
    """Domain balancing: keep at most ``k`` rows per key, best-first by
    ``order_col`` (ties broken by ``id_col`` so the cut is deterministic).

    The anti-over-representation step every web corpus mix applies after
    quality scoring — without it a handful of mega-hosts dominate the
    training mix. One shuffle on the key; rank + filter stays in codegen.
    The per-row rank is returned (``key_rank``) so callers can audit how
    deep into each host the cap cut.
    """
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(key_col).orderBy(oc, F.col(id_col).asc())
    return (
        df.withColumn("key_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("key_rank") <= k)
    )


def pack_chunks(
    chunks: DataFrame,
    capacity: int = 2048,
    bucket_col: str | None = None,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Sequence packing for training batches: lay chunks head-to-tail in a
    deterministic order and cut the token stream at ``capacity``
    boundaries; a chunk's ``bin`` is the interval containing its START
    offset (GPT-style concatenate-then-cut, at chunk granularity).

    Packing needs locality, not a global order, so the stream is
    partitioned into buckets (an explicit ``bucket_col``, or a hash of the
    doc id) and packed per bucket — embarrassingly parallel, one shuffle,
    no single-task global window. Bins can overrun a boundary by at most
    one chunk; with fixed-size chunks feeding fixed-capacity bins the
    overrun is bounded by chunk_tokens/capacity.

    Output adds ``bucket``, ``start_offset`` (tokens before this chunk in
    its bucket stream) and ``bin`` — all exact integers.
    """
    b = (
        F.col(bucket_col)
        if bucket_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    )
    df = chunks.withColumn("bucket", b)
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc(), F.col(chunk_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col).cast("long")).over(w)
    return df.withColumn(
        "start_offset", (cum - F.col(tokens_col)).cast("long")
    ).withColumn("bin", F.expr(f"start_offset DIV {int(capacity)}"))
