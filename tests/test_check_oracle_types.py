"""The local gate replica must be TYPE-sensitive like the driver's value
hash: DuckDB types sum(int) as HUGEINT (int128) while Spark emits int64 —
equal values, different hashes (the r03/r04 x14 + r04 x20 red rows). These
pin tools/check_oracle.py's type-parity comparator."""

import importlib.util
import pathlib

import duckdb
import pyspark.sql.functions as F

_spec = importlib.util.spec_from_file_location(
    "check_oracle", pathlib.Path(__file__).parent.parent / "tools" / "check_oracle.py"
)
co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(co)


def test_hugeint_vs_bigint_is_flagged(spark):
    con = duckdb.connect()
    rel = con.sql("SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)")
    sdf = spark.range(1).select(F.lit(3).cast("long").alias("s"))
    assert co.type_mismatches(sdf, rel, list(rel.columns)) == [
        ("s", "bigint", "hugeint")
    ]
    # an explicit CAST restores parity
    rel2 = con.sql(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)"
    )
    assert co.type_mismatches(sdf, rel2, list(rel2.columns)) == []


def test_matching_common_types_pass(spark):
    con = duckdb.connect()
    rel = con.sql(
        "SELECT 1::BIGINT AS a, 1.5::DOUBLE AS b, 'x' AS c, "
        "TIMESTAMP '2024-01-01' AS d, count(*) AS n FROM (VALUES (1)) t(x)"
    )
    sdf = spark.range(1).select(
        F.lit(1).cast("long").alias("a"),
        F.lit(1.5).alias("b"),
        F.lit("x").alias("c"),
        F.lit("2024-01-01").cast("timestamp").alias("d"),
        F.lit(0).cast("long").alias("n"),
    )
    assert co.type_mismatches(sdf, rel, list(rel.columns)) == []


def test_int_width_mismatch_is_flagged(spark):
    con = duckdb.connect()
    rel = con.sql("SELECT 1::INTEGER AS a")
    sdf = spark.range(1).select(F.lit(1).cast("long").alias("a"))
    assert co.type_mismatches(sdf, rel, list(rel.columns)) == [
        ("a", "bigint", "int")
    ]
