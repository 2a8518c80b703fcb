"""Byte-pair-encoding tokenizer: distributed corpus statistics, exact
classic training, Arrow-batched encoding.

The Sennrich et al. 2016 algorithm, factored the way every production
tokenizer pipeline factors it:

1. **Corpus reduction** (`word_counts`) — the only corpus-sized step:
   normalize + whitespace-split + ONE groupBy(word) count. Map-side
   partial aggregation caps the shuffle at the per-partition distinct
   vocabulary; the result is Zipf-bounded (millions of rows at 100 TB,
   not trillions).
2. **Merge training** (`bpe_train`) — classic greedy pair merging over
   the TOP-``max_words`` word-frequency table, driver-side. Bounding the
   table is the standard practice (real tokenizer trainers subsample the
   corpus; here the distributed count is exact and only the tail is
   truncated — at 100 TB the top-100k words cover the overwhelming mass
   of a natural-language corpus and, crucially, every pair statistic is
   an EXACT corpus-wide count, which a sampled trainer cannot promise).
   Deterministic tie-breaking (count desc, then pair lexicographic) makes
   the merge list a pure function of the corpus.
3. **Encoding** (`bpe_encode`) — applying the frozen merge ranks is
   inherently per-word sequential (each merge depends on the previous),
   the legitimate Pandas-UDF case: ``mapInPandas`` with a capped
   per-task word memo — Zipf again means the memo hit-rate approaches 1
   on prose, so the per-row cost is a dict lookup, not a merge loop.

Words are segmented in isolation (GPT-2 style pre-tokenization by
whitespace, no cross-word merges), so encode parallelism is
embarrassing: no shuffle, no state, any partitioning.

Reference context: hepcrawl never tokenizes (its text fields pass
through whole); this replaces the BPE-ish regex estimate in
operators/textstats.py::token_count_bpe_ish with a real trainable
subword vocabulary for the LLM-pipeline suite.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyarrow  # noqa: F401 — Arrow batching is the point
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from .dedup import normalize_text


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) exact corpus word frequencies — one explode + one
    groupBy(word) with map-side partial aggregation."""
    from ..session import spread

    return (
        spread(docs.select(text_col))
        .select(
            F.explode(F.split(normalize_text(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def top_words(
    counts: DataFrame | list[tuple[str, int]], max_words: int = 100_000
) -> list[tuple[str, int]]:
    """Collect the top-``max_words`` (word, cnt) slice by count desc, word
    asc — O(vocab) driver scalars, the model not the data. Collect ONCE
    and pass the list to both ``bpe_train`` and ``bpe_vocab`` so they see
    the same frequency slice (and the corpus-sized TakeOrdered job runs
    once); both also accept the raw DataFrame for convenience."""
    if isinstance(counts, DataFrame):
        rows = (
            counts.orderBy(F.col("cnt").desc(), F.col("word").asc())
            .limit(max_words)
            .collect()
        )
        return [(r["word"], int(r["cnt"])) for r in rows]
    return list(counts)[:max_words]


def bpe_train(
    counts: DataFrame | list[tuple[str, int]],
    n_merges: int = 200,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-frequency table (the
    `word_counts` DataFrame or an already-collected `top_words` list).
    Greedy: repeatedly merge the most-frequent adjacent symbol pair; ties
    break lexicographically so training is deterministic.
    """
    vocab = top_words(counts, max_words)

    # word -> (symbol list, count), with an incremental pair index so each
    # merge touches only the words that CONTAIN the merged pair — the
    # standard trainer structure; a naive full rescan per merge would cost
    # O(n_merges x total_symbols) driver time at max_words scale
    words: list[tuple[list[str], int]] = [(list(w), c) for w, c in vocab if w]

    def _pairs_of(syms: list[str]) -> dict[tuple[str, str], int]:
        d: dict[tuple[str, str], int] = {}
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            d[p] = d.get(p, 0) + 1
        return d

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, c) in enumerate(words):
        for p, n in _pairs_of(syms).items():
            pair_counts[p] = pair_counts.get(p, 0) + n * c
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for wi in pair_words.pop(best, set()):
            syms, c = words[wi]
            before = _pairs_of(syms)
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
            after = _pairs_of(syms)
            for p in before.keys() | after.keys():
                delta = after.get(p, 0) - before.get(p, 0)
                if delta:
                    pair_counts[p] = pair_counts.get(p, 0) + delta * c
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                if after.get(p):
                    pair_words.setdefault(p, set()).add(wi)
                elif p in pair_words:
                    pair_words[p].discard(wi)
        pair_counts.pop(best, None)
    return merges


def _segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in rank order (the standard encoder)."""
    syms = list(word)
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment a single word under the frozen merge list (test hook)."""
    return _segment(word, {p: i for i, p in enumerate(merges)})


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe long) for every doc.

    mapInPandas with the merge ranks closed over (broadcast via task
    serialization — the merge list is a few KB) and a capped per-task
    word memo; words are normalized/split exactly like `word_counts`, so
    encoding is consistent with training.
    """
    ranks = {p: i for i, p in enumerate(merges)}
    return _encode(
        docs, id_col, text_col, "bpe_tokens", StringType(),
        lambda w: _segment(w, ranks),
    )


UNK_ID = 0  # reserved: characters outside the training alphabet


def bpe_vocab(
    counts: DataFrame | list[tuple[str, int]],
    merges: list[tuple[str, str]],
    max_words: int = 100_000,
) -> dict[str, int]:
    """token -> id for the trained tokenizer: the alphabet in sorted
    order, then the merge outputs in merge order, ids starting at 1 —
    the id space a training pipeline feeds to an embedding table. Id 0
    (``UNK_ID``) is reserved for out-of-alphabet characters and has NO
    token string: web text legitimately contains strings like "<unk>",
    so a sentinel key would silently alias real tokens onto the unknown
    id.

    Pass the list from ``top_words`` (collected once, shared with
    ``bpe_train``) so vocab and training see the same frequency slice;
    the raw DataFrame is accepted too, at the cost of re-running the
    top-words job.
    """
    words = [w for w, _ in top_words(counts, max_words)]
    alphabet = sorted({ch for w in words for ch in w})
    vocab: dict[str, int] = {}
    for ch in alphabet:
        vocab[ch] = len(vocab) + 1
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab) + 1
    return vocab


def bpe_encode_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, token_ids array<long>, n_bpe long): `bpe_encode` + the vocab
    lookup fused into the same Arrow pass (out-of-alphabet characters map
    to ``UNK_ID`` = 0). The id arrays are what a packing/batching stage
    consumes (`scrub.pack_chunks` keys on the n_bpe counts)."""
    ranks = {p: i for i, p in enumerate(merges)}
    return _encode(
        docs, id_col, text_col, "token_ids", LongType(),
        lambda w: [vocab.get(t, UNK_ID) for t in _segment(w, ranks)],
    )


def _encode(docs, id_col, text_col, out_field, elem_type, word_fn):
    """Shared Arrow encode pass: normalize JVM-side (bit-identical word
    boundaries vs `word_counts`), segment per word via ``word_fn`` with a
    capped per-task memo, emit (id, <out_field> array, n_bpe)."""
    # carry the caller's id through with its OWN type — casting would break
    # string ids under ANSI mode or null them out silently
    id_type = docs.schema[id_col].dataType
    schema = StructType(
        [
            StructField("doc_id", id_type),
            StructField(out_field, ArrayType(elem_type)),
            StructField("n_bpe", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-TASK memo: high-hit on Zipf text, but crawl corpora carry
        # unbounded unique tokens (urls, hashes, ids) — cap it so a large
        # partition cannot grow the Python worker without limit
        memo: dict[str, list] = {}
        MEMO_CAP = 1 << 20

        def enc(text: str) -> list:
            out: list = []
            # __text is already normalize_text()'d JVM-side, so the word
            # boundary here is bit-identical to word_counts' training split
            for w in (text or "").split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = word_fn(w)
                    if len(memo) < MEMO_CAP:
                        memo[w] = got
                out.extend(got)
            return out

        for pdf in batches:
            vals = pdf["__text"].map(enc)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["__id"],
                    out_field: vals,
                    "n_bpe": vals.map(len).astype("int64"),
                }
            )

    src = docs.select(
        F.col(id_col).alias("__id"),
        normalize_text(text_col).alias("__text"),
    )
    return src.mapInPandas(run, schema).withColumnRenamed("doc_id", id_col)
