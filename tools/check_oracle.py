"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() on DuckDB at sf0.01, compares row count, schema (column
names), and order-insensitive values (sorted rows, stringified).
Queries without an oracle get a rows-only check.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from scrapy_rs_spark.session import build_session  # noqa: E402


def norm_val(v):
    """Stringify like the driver does (pandas-fetched values, plain
    str()) — so type artifacts such as DuckDB HUGEINT → float64
    ('...0' suffix) FAIL here exactly as they fail in the driver."""
    if v is None or v != v:  # None or NaN
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        tuple(norm_val(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(master="local[8]", app_name="check_oracle")
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"✗ {name}: SPARK ERROR {str(e)[:2000]}")
            continue
        if name not in oracles:
            status = "rows-only"
            print(f"• {name}: {len(spdf)} rows ({status}, no oracle)")
            if len(spdf) == 0:
                failures.append((name, "0 rows (rows-only query)"))
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"✗ {name}: DUCKDB ERROR {str(e)[:2000]}")
            continue
        scols, dcols = list(spdf.columns), list(dpdf.columns)
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} != {sorted(dcols)}")
        if len(spdf) != len(dpdf):
            problems.append(f"rowcount {len(spdf)} != {len(dpdf)}")
        if not problems:
            a, b = norm_rows(spdf), norm_rows(dpdf)
            if a != b:
                diffs = [
                    (x, y) for x, y in zip(a, b) if x != y
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"✗ {name}: {'; '.join(problems)[:2000]}")
        else:
            print(f"✓ {name}: {len(spdf)} rows match")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nALL MATCH")


if __name__ == "__main__":
    main()
