"""Driver-contract smoke + oracle spot-checks at sf0.001.

The full 30-query oracle sweep lives in tools/check_oracle.py (run at
sf0.01, replicating the driver's CORRECTNESS gate); here pytest guards
the contract shape and a representative parity subset cheaply."""

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

SPOT = ["seen_antijoin", "simhash", "cosine_topk", "crawl_bfs", "politeness_budget"]


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert "url" in df.columns


def test_contract_shape():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 25
    # every oracle key has a query; non-oracle queries are the known
    # approximate/Arrow-only ops
    assert set(oracles) <= set(qs)
    # round 3: every query has an oracle — the approximate ANN paths
    # emit self-verified recall/subset/candidate flags (hash-checked)
    assert set(qs) == set(oracles)


@pytest.mark.parametrize("name", SPOT)
def test_oracle_spot_parity(spark, duck, name):
    sdf = entry.queries()[name](spark, SF)
    scols, srows = sdf.columns, sdf.collect()
    res = duck.execute(entry.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _rows(scols, srows) == _rows(dcols, drows)
