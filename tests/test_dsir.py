import math

import pyspark.sql.functions as F

from hepcrawl_spark.operators import dsir


def _corpus(spark):
    # target domain: physics-flavoured prose; raw pool: mixed
    target = spark.createDataFrame(
        [
            ("t1", "neutrino oscillation measured at the detector"),
            ("t2", "the detector measured neutrino flux and oscillation"),
            ("t3", "oscillation parameters from the neutrino beam"),
        ],
        "doc_id string, text string",
    )
    raw = spark.createDataFrame(
        [
            ("r1", "neutrino oscillation results from the detector run"),
            ("r2", "cheap flights and hotel deals book now"),
            ("r3", "the detector measured neutrino oscillation from the beam"),
            ("r4", "celebrity gossip and fashion trends this week"),
            ("r5", "win money online casino bonus spins"),
        ],
        "doc_id string, text string",
    )
    return target, raw


def test_gram_buckets_counts_and_range(spark):
    df = spark.createDataFrame([("a b c",), ("solo",), ("",)], "text: string")
    out = df.select(dsir.gram_buckets("text", 64).alias("b")).collect()
    # 3 unigrams + 2 bigrams; 1 unigram + 0 bigrams; ''-token degenerate: 1
    assert [len(r["b"]) for r in out] == [5, 1, 1]
    assert all(0 <= v < 64 for r in out for v in r["b"])


def test_logratio_prefers_target_vocabulary(spark):
    target, raw = _corpus(spark)
    lr = dsir.dsir_logratio(target, raw, num_buckets=256)
    assert len(lr) == 256
    scored = {
        r["doc_id"]: r["logw"]
        for r in dsir.dsir_score(raw, lr).select("doc_id", "logw").collect()
    }
    # physics-like raw docs must outscore the off-domain ones
    assert min(scored["r1"], scored["r3"]) > max(
        scored["r2"], scored["r4"], scored["r5"]
    )
    assert all(math.isfinite(v) for v in scored.values())


def test_score_is_narrow_no_shuffle_no_python(spark):
    target, raw = _corpus(spark)
    lr = dsir.dsir_logratio(target, raw, num_buckets=128)
    plan = (
        dsir.dsir_score(raw, lr)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # scoring itself shuffles nothing (the only Exchange is the one-row
    # BroadcastExchange carrying the log-ratio array)
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan  # one-row side is BNLJ broadcast


def test_sample_deterministic_and_biased_to_target(spark):
    target, raw = _corpus(spark)
    sel = dsir.dsir_select(target, raw, k=2, num_buckets=256, seed="s1")
    ids = sorted(r["doc_id"] for r in sel.collect())
    again = sorted(
        r["doc_id"]
        for r in dsir.dsir_select(
            target, raw, k=2, num_buckets=256, seed="s1"
        ).collect()
    )
    assert ids == again and len(ids) == 2
    # at low temperature the weights dominate the Gumbel noise: the two
    # physics docs must win
    cold = dsir.dsir_select(
        target, raw, k=2, num_buckets=256, seed="s1", temperature=0.05
    )
    assert sorted(r["doc_id"] for r in cold.collect()) == ["r1", "r3"]


def test_sample_plan_is_take_ordered(spark):
    target, raw = _corpus(spark)
    lr = dsir.dsir_logratio(target, raw, num_buckets=128)
    scored = dsir.dsir_score(raw, lr)
    plan = (
        dsir.dsir_sample(scored, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
