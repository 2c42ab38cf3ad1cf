"""Driver-gate rehearsal: run every registered query against its DuckDB
oracle at sf0.001 and compare row count, schema width, and an
order-insensitive value multiset — the same shape of check the driver's t2
gate performs at sf0.01.
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, int):
        return float(v) if not isinstance(v, bool) else v
    return str(v)


def _multiset(rows):
    return sorted(
        (
            tuple(_canon(v) for _, v in sorted(zip(cols, row), key=lambda p: p[0]))
            for cols, row in rows
        ),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLE_NAMES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf_frame = q(spark, SF_DIR)
    spark_cols = sdf_frame.columns
    spark_rows = [(spark_cols, tuple(r)) for r in sdf_frame.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = [(duck_cols, tuple(r)) for r in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    # The driver's value hash is TYPE-sensitive (the r4 token_pack miss: a
    # DuckDB HUGEINT window sum reached pandas as a different dtype than
    # Spark's bigint while every VALUE matched). Rehearse that too: the
    # pandas dtype of each column must agree exactly.
    spandas = sdf_frame.toPandas()
    dpandas = ddb.execute(entry_mod.oracle_sql()[name]).df()
    for c in spark_cols:
        assert str(spandas[c].dtype) == str(dpandas[c].dtype), (
            f"{name}.{c}: dtype {spandas[c].dtype} vs oracle {dpandas[c].dtype} "
            "— cast the oracle (or the query) so the driver's type-sensitive "
            "hash cannot diverge on equal values"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    ms, md = _multiset(spark_rows), _multiset(duck_rows)
    mismatches = [(a, b) for a, b in zip(ms, md) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
