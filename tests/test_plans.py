"""Physical-plan pins for the scale-critical properties (SURVEY.md §4):
pushdown, pruning, broadcast choice, shuffle counts. These are the 'would
this survive 100x' checks — a plan regression fails loudly here."""

import pyspark.sql.functions as F

from hepcrawl_spark.plans import (
    exchange_count,
    has_pushed_filter,
    read_schema_columns,
    uses_broadcast_join,
)
from tests.conftest import SF_MED


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF_MED}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")).select(
        "l_returnflag"
    )
    assert has_pushed_filter(q, "l_shipdate")


def test_column_pruning_two_column_projection(spark):
    li = spark.read.parquet(f"{SF_MED}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    cols = read_schema_columns(q)
    assert set(cols) == {"l_returnflag", "l_quantity"}, cols


def test_small_dim_join_broadcasts(spark):
    nation = spark.read.parquet(f"{SF_MED}/nation.parquet")
    cust = spark.read.parquet(f"{SF_MED}/customer.parquet")
    q = cust.join(nation, cust["c_nationkey"] == nation["n_nationkey"])
    assert uses_broadcast_join(q)


def test_politeness_wave_single_shuffle(spark):
    """The politeness window must cost exactly one exchange."""
    from hepcrawl_spark.operators.politeness import select_wave
    from hepcrawl_spark.sources.pages import (
        frontier_from_pages,
        load_documents,
        pages_from_documents,
    )

    fr = frontier_from_pages(pages_from_documents(load_documents(spark, SF_MED)))
    wave = select_wave(fr, max_per_host=5, salt=2)
    assert exchange_count(wave) == 1


def test_fetch_join_is_equi_hash_join(spark):
    from hepcrawl_spark.sources.pages import (
        frontier_from_pages,
        load_documents,
        pages_from_documents,
    )

    pages = pages_from_documents(load_documents(spark, SF_MED))
    fr = frontier_from_pages(pages).limit(100)
    q = fr.join(pages.select("url", "text"), "url")
    from hepcrawl_spark.plans import formatted_plan

    plan = formatted_plan(q)
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_cosine_topk_streams_corpus_once(spark):
    """Round 6: the exact top-k scorer is ONE Arrow pass over the corpus
    (queries ride the task closure — the same bounded rows the old plan
    broadcast); the only exchange before the rank window is spread()'s
    round-robin widening of the single-row-group scan. The corpus is never
    joined or shuffled by key, and no cartesian appears."""
    from hepcrawl_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    q = cosine_topk(emb, emb.filter("vec_id < 5"), k=3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    # exactly one scan of the embeddings table in the whole plan
    assert plan.count("Scan parquet") == 1


def test_crawl_order_no_single_partition_exchange(spark):
    """P4 dispatch order must never collapse the frontier onto one task
    (round-1 verdict: the global Window.orderBy was THE scale-killer)."""
    from hepcrawl_spark.operators.politeness import crawl_order
    from hepcrawl_spark.sources.pages import (
        frontier_from_pages,
        load_documents,
        pages_from_documents,
    )

    fr = frontier_from_pages(pages_from_documents(load_documents(spark, SF_MED)))
    q = crawl_order(fr)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, "dispatch order collapsed to one task"


def test_crawl_order_is_a_total_order(spark):
    """dispatch_order must be exactly 1..N in (priority DESC, ts, url) order."""
    import pyspark.sql.functions as F

    from hepcrawl_spark.operators.politeness import crawl_order
    from hepcrawl_spark.sources.pages import (
        frontier_from_pages,
        load_documents,
        pages_from_documents,
    )

    fr = frontier_from_pages(pages_from_documents(load_documents(spark, SF_MED)))
    rows = (
        crawl_order(fr, num_partitions=7)
        .select("dispatch_order", "priority", "discovered_ts", "url")
        .collect()
    )
    rows.sort(key=lambda r: r["dispatch_order"])
    assert [r["dispatch_order"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [(-r["priority"], r["discovered_ts"], r["url"]) for r in rows]
    assert keys == sorted(keys)


def test_archive_explode_is_narrow(spark):
    """Member decode must not shuffle archive bytes (scan -> mapInPandas)."""
    from hepcrawl_spark.plans import exchange_count
    from hepcrawl_spark.sources.archives import explode_archive_members

    df = spark.createDataFrame(
        [("a", bytearray(b"x"))], "name string, payload binary"
    )
    q = explode_archive_members(df, fmt="zip", suffix=".xml")
    assert exchange_count(q) == 0


def test_document_patch_join_is_equi(spark):
    """J4 joins on (record_id, basename) — never a cartesian product."""
    import pyspark.sql.functions as F

    from hepcrawl_spark.operators.records import patch_document_urls
    from hepcrawl_spark.plans import formatted_plan

    records = spark.range(0, 10).select(
        F.col("id").alias("record_id"),
        F.array(
            F.struct(
                F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias("url"),
                F.lit(None).cast("string").alias("old_url"),
                F.lit(None).cast("string").alias("key"),
            )
        ).alias("documents"),
    )
    files = spark.range(0, 5).select(
        F.col("id").alias("record_id"),
        F.col("id").cast("string").alias("name"),
        F.col("id").cast("string").alias("path"),
    )
    plan = formatted_plan(patch_document_urls(records, files))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_plans_broadcast_never_smj(spark):
    """Multi-table LSH and multi-probe IVF must broadcast the query side
    (and centroids); the corpus must never sort-merge or cartesian join."""
    import pyspark.sql.functions as F

    from hepcrawl_spark.operators import similarity as SIM
    from hepcrawl_spark.plans import formatted_plan

    emb = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 10).cast("int").alias("label"),
        F.transform(F.sequence(F.lit(1), F.lit(8)),
                    lambda i: F.rand(42) + i).alias("embedding"),
    )
    q = emb.filter("vec_id < 4")
    lsh_plan = formatted_plan(SIM.lsh_topk(emb, q, k=3, bits=4, tables=4))
    assert "SortMergeJoin" not in lsh_plan
    assert "CartesianProduct" not in lsh_plan
    assert "BroadcastHashJoin" in lsh_plan
    ivf_plan = formatted_plan(SIM.ivf_topk(emb, q, k=3, nprobe=2))
    assert "SortMergeJoin" not in ivf_plan
    assert "CartesianProduct" not in ivf_plan


def test_merge_store_single_shuffle_per_upsert(spark, tmp_path):
    """merge_upsert's write is one repartition-by-bucket shuffle plus the
    upsert groupBy — the delta and touched buckets only, never a global
    sort or cartesian."""
    import pyspark.sql.functions as F

    from hepcrawl_spark.sources import merge_store as M

    base = spark.createDataFrame(
        [(f"u{i}", None) for i in range(50)], "url string, last_ts timestamp"
    ).select("url", F.current_timestamp().alias("last_ts"))
    d = str(tmp_path / "t")
    M.create_table(base, d, key="url", n_buckets=8)
    delta = base.limit(3).select("url", F.current_timestamp().alias("last_ts"))
    merged = M.merge_upsert(spark, d, delta)
    # committed manifest readable, result plan is a plain parquet scan
    from hepcrawl_spark.plans import formatted_plan

    plan = formatted_plan(M.read_table(spark, d))
    assert "Scan parquet" in plan and "Exchange" not in plan


def test_bucketed_fetch_join_is_shuffle_free(spark, tmp_path):
    """The 100-TB fetch-join contract (README scale notes): pages and the
    wave both stored bucketed by url -> the equi join is storage-partitioned
    — a SortMergeJoin with ZERO Exchange on either side. Pinned on real
    bucketed tables, broadcast disabled so the bucketing (not a broadcast)
    is what removes the shuffle."""
    pages = spark.range(0, 2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".org/p/"), F.col("id").cast("string")).alias("url"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
    )
    wave = pages.select("url").filter(F.crc32(F.col("url")) % 3 == 0)
    spark.sql("DROP TABLE IF EXISTS pages_bkt")
    spark.sql("DROP TABLE IF EXISTS wave_bkt")
    (pages.write.bucketBy(8, "url").sortBy("url")
        .option("path", str(tmp_path / "pages_bkt")).saveAsTable("pages_bkt"))
    (wave.write.bucketBy(8, "url").sortBy("url")
        .option("path", str(tmp_path / "wave_bkt")).saveAsTable("wave_bkt"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("wave_bkt").join(spark.table("pages_bkt"), "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS pages_bkt")
        spark.sql("DROP TABLE IF EXISTS wave_bkt")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # and it actually runs with the bucketed layout
    assert joined.count() > 0
