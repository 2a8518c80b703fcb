"""spark-submit entrypoint for the TRAINING-CORPUS pipeline — the second
headline workflow beside the crawl fixpoint:

    WARC archives (or a pages table) -> record scan -> html -> visible text
    -> Gopher quality rules -> within-doc repetition filter
    -> learned quality filter (hashed perceptron vs a target seed sample)
    -> cross-corpus paragraph dedup -> MinHash/LSH near-dup clustering
    -> benchmark decontamination -> host cap or n^tau temperature mixing
    -> token-window chunks -> deterministic mix

    spark-submit --py-files hepcrawl_spark.zip jobs/corpus_job.py \
        --input s3://bucket/warc_parquet --input-format warc \
        --output s3://bucket/corpus_v1 \
        --min-quality-pass --max-dup-line-frac 0.3 \
        --chunk-tokens 512 --sample-rate 0.5

Every stage is the public operator API; the pipeline is one lazy DataFrame
chain per stage boundary, so Catalyst fuses what it can and each materialized
stage writes its audit counts next to the output. At 100 TB the only
corpus-sized shuffles are the paragraph-hash dedup, the shingle pass, and
the final chunk explode — everything else is narrow or broadcast.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="hepcrawl_spark corpus pipeline")
    p.add_argument("--input", required=True, help="parquet table of pages or WARC blobs")
    p.add_argument("--input-format", default="pages", choices=["pages", "warc"],
                   help="pages: (url, text); warc: (warc_id, payload) binary archives")
    p.add_argument("--output", required=True, help="output dir (corpus + audit tables)")
    p.add_argument("--blocklist", default=None,
                   help="parquet of domain entries; drop urls on or under them")
    p.add_argument("--c4-filter", action="store_true",
                   help="apply the C4 line/page rules; text becomes the kept lines")
    p.add_argument("--nfc-clean", action="store_true",
                   help="NFC-normalize + strip control chars before any digest")
    p.add_argument("--host-cap", type=int, default=0,
                   help=">0: keep at most this many docs per host (largest first)")
    p.add_argument("--min-quality-pass", action="store_true",
                   help="drop documents failing the Gopher rule set")
    p.add_argument("--max-dup-line-frac", type=float, default=None,
                   help="drop documents whose duplicate-line fraction exceeds this")
    p.add_argument("--neardup-threshold", type=float, default=0.7,
                   help="exact-jaccard verify threshold for LSH candidates")
    p.add_argument("--benchmarks", default=None,
                   help="parquet (bench_id, text) to decontaminate against")
    p.add_argument("--chunk-tokens", type=int, default=0,
                   help=">0: emit token-window chunks of this size")
    p.add_argument("--sample-rate", type=float, default=1.0,
                   help="deterministic hash-threshold mix sampling rate")
    p.add_argument("--quality-target", default=None,
                   help="parquet (doc_id, text) of target-domain seed docs; "
                        "train a hashed perceptron (target = +1 vs a "
                        "deterministic corpus sample = -1, the WebText-"
                        "classifier recipe) and keep docs scoring above "
                        "--quality-keep-score")
    p.add_argument("--quality-neg-rate", type=float, default=0.1,
                   help="hash-sampled fraction of the corpus used as "
                        "perceptron negatives")
    p.add_argument("--quality-keep-score", type=int, default=0,
                   help="keep docs with classifier score > this (integer)")
    p.add_argument("--temperature-mix-k", type=int, default=0,
                   help=">0: after all filters keep ~K docs via n^tau "
                        "per-host largest-remainder budgets")
    p.add_argument("--temperature-tau", type=float, default=0.5,
                   help="mixing temperature (1.0 = natural distribution)")
    p.add_argument("--export-jsonl-bytes", type=int, default=0,
                   help=">0: also deliver the corpus as size-bounded JSONL "
                        "shards of ~this many bytes (data/ + manifest/ "
                        "under <output>/jsonl)")
    p.add_argument("--bpe-merges", type=int, default=0,
                   help=">0: train a BPE tokenizer of this many merges on "
                        "the FINAL corpus and emit model-ready token-id "
                        "rows (tokens table + vocab written beside the "
                        "corpus)")
    return p.parse_args(argv)


def run(spark, args) -> dict:
    import pyspark.sql.functions as F

    from hepcrawl_spark.functions.html import html_to_text
    from hepcrawl_spark.operators.dedup import (
        decontaminate,
        minhash_lsh_candidates,
        paragraph_dedup,
        verify_jaccard_pairs,
    )
    from hepcrawl_spark.operators.components import dedup_clusters
    from hepcrawl_spark.functions.text import unicode_clean
    from hepcrawl_spark.functions.urls import host_of
    from hepcrawl_spark.operators.filters import blocklist_gate
    from hepcrawl_spark.operators.scrub import cap_per_key, chunk_documents, sample_hash
    from hepcrawl_spark.operators.textstats import gopher_rules, repetition_features
    from hepcrawl_spark.sources.warc import explode_warc_records

    audit: dict = {}
    # each audited stage is persisted so its count AND every downstream
    # stage read the cached rows instead of re-running the whole upstream
    # chain (the WARC explode + html extraction dominate); earlier stages
    # unpersist as soon as the next one is materialized
    _cached: list = []

    def _stage(df, name):
        df = df.persist()
        audit[name] = df.count()
        while len(_cached) > 1:
            _cached.pop(0).unpersist()
        _cached.append(df)
        return df

    if args.input_format == "warc":
        warcs = spark.read.parquet(args.input)
        recs = explode_warc_records(warcs).filter(F.col("http_status") == 200)
        docs = html_to_text(
            recs.select(F.xxhash64("url").alias("doc_id"), "url", "body"),
            html_col="body",
            block_separator="\n\n",  # paragraph-preserving: the
            # cross-corpus paragraph dedup below needs real block breaks
        ).select("doc_id", "url", "text")
    else:
        pages = spark.read.parquet(args.input)
        docs = pages.select(
            F.xxhash64("url").alias("doc_id"), "url", "text"
        )
    docs = _stage(docs.filter(F.length(F.trim("text")) > 0), "input_docs")

    if args.blocklist:
        bl = spark.read.parquet(args.blocklist)
        docs = _stage(
            blocklist_gate(
                docs.withColumn("host", host_of("url")), bl
            ).drop("host"),
            "after_blocklist",
        )
    if args.nfc_clean:
        # digest hygiene BEFORE any dedup hash: decomposed accents and stray
        # control bytes must not split a dedup cluster. Narrow map, no stage
        # count of its own.
        docs = docs.withColumn("text", unicode_clean("text"))
    if args.c4_filter:
        from hepcrawl_spark.operators.textstats import c4_rules

        # persist the verdicts: the audit write AND the join both consume
        # them, and the upstream chain includes the NFC pandas-UDF pass —
        # without the persist that pass would run twice over the corpus
        c4 = c4_rules(docs).persist()
        c4.drop("clean_text").write.mode("overwrite").parquet(
            f"{args.output}/audit_c4"
        )
        docs = _stage(
            docs.drop("text").join(
                c4.filter("passes").select(
                    "doc_id", F.col("clean_text").alias("text")
                ),
                "doc_id",
            ),
            "after_c4",
        )
        c4.unpersist()

    # quality gates (annotate-then-filter: rejected rows stay auditable)
    if args.min_quality_pass:
        verdicts = gopher_rules(docs)
        verdicts.write.mode("overwrite").parquet(f"{args.output}/audit_gopher")
        docs = _stage(
            docs.join(
                verdicts.filter("passes").select("doc_id"), "doc_id", "left_semi"
            ),
            "after_gopher",
        )
    if args.max_dup_line_frac is not None:
        rep = repetition_features(docs)
        keep = rep.filter(
            F.coalesce(F.col("dup_line_frac"), F.lit(0.0))
            <= args.max_dup_line_frac
        ).select("doc_id")
        docs = _stage(docs.join(keep, "doc_id", "left_semi"), "after_repetition")

    if args.quality_target:
        # learned quality filter (the WebText-classifier recipe): positives
        # = the curated target sample, negatives = a deterministic hash
        # sample of the corpus itself; integer perceptron training is
        # partitioning-invariant, so the model — and every doc's fate —
        # is reproducible across re-runs
        from hepcrawl_spark.operators.classifier import (
            perceptron_score,
            perceptron_train,
        )

        target = spark.read.parquet(args.quality_target)
        neg = docs.filter(
            sample_hash("doc_id", "qneg") < F.lit(args.quality_neg_rate)
        )
        labeled = target.select("text").withColumn("label", F.lit(1)).unionByName(
            neg.select("text").withColumn("label", F.lit(-1))
        )
        weights = perceptron_train(labeled, num_buckets=4096, epochs=3)
        docs = _stage(
            perceptron_score(docs, weights)
            .filter(F.col("score") > args.quality_keep_score)
            .drop("score"),
            "after_quality_classifier",
        )

    # cross-corpus dedup: paragraphs first (boilerplate), then near-dup docs
    docs = _stage(
        paragraph_dedup(docs.select("doc_id", "text"))
        .join(docs.select("doc_id", "url"), "doc_id")
        .filter(F.length("text") > 0)
        .select("doc_id", "url", "text"),
        "after_paragraph_dedup",
    )
    # LSH candidates -> exact-jaccard VERIFY -> clusters: a lucky band
    # collision between unrelated docs must not chain their components
    pairs = verify_jaccard_pairs(
        docs, minhash_lsh_candidates(docs, num_hashes=16, bands=4),
        threshold=args.neardup_threshold,
    )
    clusters = dedup_clusters(
        pairs, docs.select("doc_id"), id_col="doc_id",
        left_col="id_a", right_col="id_b",
    )
    docs = _stage(
        docs.join(
            clusters.filter("is_canonical").select("doc_id"), "doc_id", "left_semi"
        ),
        "after_neardup",
    )

    if args.benchmarks:
        bench = spark.read.parquet(args.benchmarks)
        docs = _stage(
            decontaminate(docs, bench, threshold=0.5), "after_decontamination"
        )

    if args.host_cap > 0:
        docs = _stage(
            cap_per_key(
                docs.withColumn("host", host_of("url")).withColumn(
                    "_sz", F.length("text")
                ),
                key_col="host",
                order_col="_sz",
                id_col="doc_id",
                k=args.host_cap,
            ).drop("host", "_sz", "key_rank"),
            "after_host_cap",
        )

    if args.temperature_mix_k > 0:
        # sub-linear host mixing: budget hosts by n^tau largest-remainder
        # seats, fill quotas by the deterministic sampling hash — the
        # budget-first alternative to the hard --host-cap
        from hepcrawl_spark.operators.mix import temperature_mix

        docs = _stage(
            temperature_mix(
                docs.withColumn("host", host_of("url")),
                args.temperature_mix_k,
                domain_col="host",
                tau=args.temperature_tau,
            ).drop("host", "budget", "domain_rank"),
            "after_temperature_mix",
        )

    if args.sample_rate < 1.0:
        # deterministic hash-threshold sampling: same (doc_id, seed) ->
        # same fate on every re-run and in every subset
        docs = _stage(
            docs.filter(
                sample_hash("doc_id", "corpus_mix") < F.lit(args.sample_rate)
            ),
            "after_sampling",
        )

    out = docs
    text_field, key_field = "text", "doc_id"
    if args.chunk_tokens > 0:
        # every chunk row gets its own key so downstream artifacts
        # (tokens, jsonl) pair 1:1 with the written corpus rows
        out = chunk_documents(docs, chunk_tokens=args.chunk_tokens).withColumn(
            "row_uid", F.xxhash64("doc_id", "chunk_id")
        )
        audit["chunks"] = out.count()
        text_field, key_field = "chunk_text", "row_uid"
    out.write.mode("overwrite").parquet(f"{args.output}/corpus")
    # downstream sinks read the WRITTEN corpus back: one evaluation of the
    # pipeline lineage, and what they consume is exactly what landed
    final = spark.read.parquet(f"{args.output}/corpus")

    if args.export_jsonl_bytes > 0:
        from hepcrawl_spark.sources.export import write_jsonl_shards

        manifest = write_jsonl_shards(
            final, f"{args.output}/jsonl",
            max_bytes=args.export_jsonl_bytes, id_col=key_field,
        )
        audit["jsonl_shards"] = manifest.count()

    if args.bpe_merges > 0:
        # model-ready tokenization of the FINAL corpus rows (chunk rows
        # when chunking is on — the tokens table pairs 1:1 with the
        # corpus): the tokenizer is trained on exactly the text it will
        # encode (post-filter, post-dedup — training it earlier would
        # waste merges on boilerplate the pipeline removes). One
        # word-count shuffle, driver merges, one Arrow encode pass; vocab
        # + token rows land beside the corpus so a training job needs
        # nothing else.
        from hepcrawl_spark.operators.bpe import (
            bpe_encode_ids,
            bpe_train,
            bpe_vocab,
            top_words,
            word_counts,
        )

        words = top_words(word_counts(final, text_col=text_field))
        merges = bpe_train(words, n_merges=args.bpe_merges)
        vocab = bpe_vocab(words, merges)
        spark.createDataFrame(
            sorted(vocab.items()), "token string, token_id bigint"
        ).write.mode("overwrite").parquet(f"{args.output}/bpe_vocab")
        tokens = bpe_encode_ids(
            final, merges, vocab, id_col=key_field, text_col=text_field
        )
        tokens.write.mode("overwrite").parquet(f"{args.output}/tokens")
        audit["bpe_vocab_size"] = len(vocab) + 1  # + reserved unk id 0
        audit["bpe_total_tokens"] = int(
            spark.read.parquet(f"{args.output}/tokens")
            .agg(F.sum("n_bpe")).collect()[0][0] or 0
        )

    for df in _cached:
        df.unpersist()
    return audit


def main(argv=None) -> None:
    from hepcrawl_spark.session import get_spark

    args = parse_args(argv if argv is not None else sys.argv[1:])
    spark = get_spark(app_name="hepcrawl-corpus")
    audit = run(spark, args)
    print(json.dumps(audit))


if __name__ == "__main__":
    main()
