"""BPE tokenizer: training, encoding, Spark round trip."""

import pyspark.sql.functions as F

from hepcrawl_spark.operators import bpe


def test_bpe_train_classic_example():
    # the Sennrich et al. running example: 'es' then 'est' emerge from the
    # -est suffix mass
    vocab = [("lowest", 6), ("newest", 5), ("widest", 4), ("low", 3)]
    merges = bpe.bpe_train(vocab, n_merges=3)
    assert merges[0] == ("e", "s")      # 15 occurrences, most frequent pair
    assert merges[1] == ("es", "t")     # fused next
    assert ("l", "o") in merges or ("es", "t") in merges


def test_bpe_train_deterministic_tie_break():
    # 'ab' and 'ba' tie at 2 -> lexicographic pick ('a','b')
    merges = bpe.bpe_train([("abab", 1), ("ba", 1)], n_merges=1)
    assert merges == [("a", "b")]


def test_bpe_train_stops_when_no_pairs():
    assert bpe.bpe_train([("a", 5), ("b", 2)], n_merges=10) == []


def test_encode_word_matches_training_segmentation():
    vocab = [("lowest", 6), ("newest", 5), ("widest", 4), ("low", 3)]
    merges = bpe.bpe_train(vocab, n_merges=6)
    # a trained word re-encodes to the same segmentation training reached
    assert "".join(bpe.encode_word("lowest", merges)) == "lowest"
    assert "est" in bpe.encode_word("tallest", merges) or [
        s for s in bpe.encode_word("tallest", merges) if "es" in s
    ]
    # unseen symbols stay as characters
    assert bpe.encode_word("xyz", merges) == ["x", "y", "z"]
    assert bpe.encode_word("", merges) == []


def test_bpe_spark_roundtrip(spark):
    docs = spark.createDataFrame(
        [
            (1, "the lowest rate and the newest rate"),
            (2, "The Lowest   rate,"),
            (3, ""),
        ],
        "doc_id bigint, text string",
    )
    wc = bpe.word_counts(docs)
    counts = {r["word"]: r["cnt"] for r in wc.collect()}
    # lowercased + trimmed; punctuation sticks to its word ("rate," is
    # its own type, exactly like the training split)
    assert counts["rate"] == 2 and counts["the"] == 3 and counts["rate,"] == 1
    merges = bpe.bpe_train(wc, n_merges=20)
    assert len(merges) > 0

    out = bpe.bpe_encode(docs, merges).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3]
    assert out[2]["n_bpe"] == 0 and out[2]["bpe_tokens"] == []
    # every token round-trips: concatenation restores the normalized words
    joined = "".join(out[1]["bpe_tokens"])
    assert joined == "thelowestrate,"
    # frequent trained words compress below character count
    assert out[0]["n_bpe"] < len("the lowest rate and the newest rate".replace(" ", ""))


def test_bpe_encode_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"rate the lowest rate {i}") for i in range(50)],
        "doc_id bigint, text string",
    )
    merges = bpe.bpe_train(bpe.word_counts(docs), n_merges=10)
    a = {r["doc_id"]: r["bpe_tokens"] for r in bpe.bpe_encode(docs, merges).collect()}
    b = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.bpe_encode(docs.repartition(7), merges).collect()
    }
    assert a == b


def test_bpe_encode_preserves_string_ids(spark):
    docs = spark.createDataFrame(
        [("u1", "rate the rate"), ("u2", "lowest")],
        "doc_id string, text string",
    )
    merges = bpe.bpe_train(bpe.word_counts(docs), n_merges=5)
    out = {r["doc_id"]: r["n_bpe"] for r in bpe.bpe_encode(docs, merges).collect()}
    assert set(out) == {"u1", "u2"} and all(v > 0 for v in out.values())


def test_bpe_train_incremental_matches_reference():
    # the incremental pair-index trainer must reproduce the naive
    # full-rescan algorithm exactly
    def naive(vocab, n_merges):
        words = [(list(w), c) for w, c in vocab if w]
        merges = []
        for _ in range(n_merges):
            pc = {}
            for syms, c in words:
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            a, b = best
            for syms, _ in words:
                i = 0
                while i < len(syms) - 1:
                    if syms[i] == a and syms[i + 1] == b:
                        syms[i:i + 2] = [a + b]
                    else:
                        i += 1
        return merges

    vocab = [("lowest", 6), ("newest", 5), ("widest", 4), ("low", 3),
             ("aaaa", 7), ("banana", 2), ("bandana", 2)]
    assert bpe.bpe_train(vocab, n_merges=15) == naive(vocab, 15)


def test_bpe_vocab_and_encode_ids(spark):
    docs = spark.createDataFrame(
        [(1, "the lowest rate"), (2, "rate the rate")],
        "doc_id bigint, text string",
    )
    # collect the frequency slice ONCE; train and vocab share it
    words = bpe.top_words(bpe.word_counts(docs))
    merges = bpe.bpe_train(words, n_merges=10)
    vocab = bpe.bpe_vocab(words, merges)
    # id 0 is reserved for unknowns and has NO token string (web text can
    # contain a literal "<unk>"); real ids start at 1
    assert bpe.UNK_ID == 0 and 0 not in vocab.values()
    for ch in "thelowsrat":
        assert ch in vocab
    out = {r["doc_id"]: r for r in bpe.bpe_encode_ids(docs, merges, vocab).collect()}
    toks = {r["doc_id"]: r for r in bpe.bpe_encode(docs, merges).collect()}
    for d in (1, 2):
        assert out[d]["n_bpe"] == toks[d]["n_bpe"]
        # ids round-trip through the inverse vocab to the string tokens
        inv = {i: t for t, i in vocab.items()}
        assert [inv[i] for i in out[d]["token_ids"]] == list(toks[d]["bpe_tokens"])
    # out-of-alphabet chars map to UNK_ID
    odd = spark.createDataFrame([(9, "zq")], "doc_id bigint, text string")
    r = bpe.bpe_encode_ids(odd, merges, vocab).collect()[0]
    assert all(i == bpe.UNK_ID for i in r["token_ids"]) and r["n_bpe"] == 2


def test_bpe_vocab_unk_collision_safe():
    # a corpus whose merges produce the literal string "<unk>" must not
    # alias it onto the reserved unknown id
    vocab_words = [("<unk>", 50)]
    merges = bpe.bpe_train(vocab_words, n_merges=10)
    assert "".join(bpe.encode_word("<unk>", merges)) == "<unk>"
    v = bpe.bpe_vocab(vocab_words, merges)
    tok_id = v.get("<unk>")
    assert tok_id is not None and tok_id != bpe.UNK_ID
