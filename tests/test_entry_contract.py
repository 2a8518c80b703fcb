"""Driver-contract smoke: entry() returns rows; a representative subset of
queries matches its DuckDB oracle at sf0.001 (the full sweep lives in
tools/check_oracle.py and runs at sf0.01)."""

import duckdb
import pytest

import __spark_entry__ as entry
from tests.conftest import SF_SMALL
from tools.check_oracle import TABLES, normalize

SUBSET = [
    "c1_canonicalize",
    "d1_crawl_once_gate",
    "p1_politeness_wave",
    "p5_robots_gate",
    "x1_exact_dedup",
    "x2_ngram_jaccard",
    "x5_cosine_topk",
    "q1_pricing_summary",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    return con


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"host", "fetched", "bytes"}


def test_every_query_has_callable():
    qs = entry.queries()
    assert len(qs) >= 40
    oracles = entry.oracle_sql()
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    fn = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    sdf = fn(spark, SF_SMALL)
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    scols = sdf.columns
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols)
    perm = [next(i for i, s in enumerate(scols) if s.lower() == c.lower()) for c in ocols]
    srows = [tuple(r[i] for i in perm) for r in (tuple(x) for x in sdf.collect())]
    sn = normalize([dict(zip(ocols, r)) for r in srows], ocols)
    on = normalize([dict(zip(ocols, r)) for r in orows], ocols)
    assert len(sn) == len(on)
    for a, b in zip(sn, on):
        assert all(str(x) == str(y) or (x == y) for x, y in zip(a, b)), (a, b)
