"""Local replica of the driver's correctness gate.

Runs each __spark_entry__.queries()[name] in Spark and its oracle_sql()[name]
in DuckDB (views over the same parquet), compares row count, column names,
and order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_duck_type(t) -> str:
    """Canonicalize a DuckDB result type name for parity with Spark.

    The driver's value hash is TYPE-SENSITIVE: DuckDB sum(int) returns
    HUGEINT (int128) which hashes differently from Spark's int64 even when
    every value is equal (the r03/r04 x14 + r04 x20 red rows). This maps
    both engines' types onto one vocabulary so a representation mismatch
    fails locally instead of in the driver gate.
    """
    s = str(t).upper()
    if s.endswith("[]"):
        return "array<" + canon_duck_type(s[:-2]) + ">"
    base = s.split("(")[0].strip()
    m = {
        "BOOLEAN": "boolean", "TINYINT": "tinyint", "SMALLINT": "smallint",
        "INTEGER": "int", "BIGINT": "bigint", "HUGEINT": "hugeint",
        "UBIGINT": "ubigint", "UINTEGER": "uint",
        "FLOAT": "float", "REAL": "float", "DOUBLE": "double",
        "VARCHAR": "string", "BLOB": "binary", "DATE": "date",
    }
    if base in m:
        return m[base]
    if base.startswith("TIMESTAMP"):
        return "timestamp"
    if base.startswith("DECIMAL"):
        return s.lower().replace(" ", "")
    return s.lower()


def canon_spark_type(dt) -> str:
    s = dt.simpleString()
    return s.replace("timestamp_ntz", "timestamp")


def type_mismatches(sdf, duck_rel, ocols):
    """Return [(col, spark_type, duck_type)] for columns whose canonical
    result types differ between the Spark DataFrame and the DuckDB relation."""
    sfields = {f.name.lower(): canon_spark_type(f.dataType) for f in sdf.schema.fields}
    out = []
    for c, dt in zip(ocols, duck_rel.types):
        st = sfields.get(c.lower())
        d = canon_duck_type(dt)
        if st is not None and st != d:
            out.append((c, st, d))
    return out


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main():
    import duckdb
    from hepcrawl_spark.session import get_spark
    import __spark_entry__ as entry

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            mism = type_mismatches(sdf, rel, ocols)
            orows = rel.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL {name}: oracle error {str(e)[:300]}")
            continue
        if mism:
            failures.append((name, f"TYPE mismatch {mism}"))
            print(f"FAIL {name}: result-type mismatch (driver hash is "
                  f"type-sensitive): {mism}")
            continue
        if sorted(map(str.lower, scols)) != sorted(map(str.lower, ocols)):
            failures.append((name, f"schema mismatch {scols} vs {ocols}"))
            print(f"FAIL {name}: schema {scols} vs {ocols}")
            continue
        # reorder spark rows to oracle column order
        perm = [scols.index(next(s for s in scols if s.lower() == c.lower())) for c in ocols]
        srows_o = [tuple(r[i] for i in perm) for r in srows]
        sn = normalize([dict(zip(ocols, r)) for r in srows_o], ocols)
        on = normalize([dict(zip(ocols, r)) for r in orows], ocols)
        if len(sn) != len(on):
            failures.append((name, f"rowcount {len(sn)} vs {len(on)}"))
            print(f"FAIL {name}: rowcount {len(sn)} vs {len(on)}")
            continue
        bad = None
        for a, b in zip(sn, on):
            if a != b:
                eq = all(
                    (isinstance(x, float) and isinstance(y, float) and (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)))
                    or str(x) == str(y)
                    for x, y in zip(a, b)
                )
                if not eq:
                    bad = (a, b)
                    break
        if bad:
            failures.append((name, f"value mismatch {bad[0]} vs {bad[1]}"))
            print(f"FAIL {name}: first mismatch\n  spark={bad[0]}\n  duck ={bad[1]}")
        else:
            print(f"OK   {name}: {len(sn)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(" -", n, ":", msg[:200])
        sys.exit(1)
    print("ALL MATCH")
    spark.stop()


if __name__ == "__main__":
    main()
