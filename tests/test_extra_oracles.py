"""The extra (non-graded-window) query registry stays oracle-checked
on every test run: the driver grades only the first 50 declared
queries, so __spark_entry__.extra_queries() holds the overflow — this
test is their correctness gate, identical in contract to the driver's
(row count, column set, value match vs DuckDB on the same parquet)."""

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x) if x is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_match(a, b):
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        for x, y in zip(a[c].tolist(), b[c].tolist()):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return False
            elif str(x) != str(y):
                return False
    return True


def _registry():
    import __spark_entry__ as entry

    return entry.extra_queries(), entry.extra_oracle_sql()


def _names():
    q, _ = _registry()
    return sorted(q)


@pytest.fixture(scope="module")
def duck():
    import os

    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_extra_has_an_oracle():
    q, o = _registry()
    assert set(q) == set(o)
    assert len(q) == 60


def test_no_overlap_with_graded_window():
    import __spark_entry__ as entry

    assert len(entry.queries()) == 50
    assert not set(entry.queries()) & set(entry.extra_queries())


@pytest.mark.parametrize("name", _names())
def test_extra_oracle(name, spark, duck):
    q, o = _registry()
    sdf = _normalize(q[name](spark, SF_DIR).toPandas())
    odf = _normalize(duck.execute(o[name]).fetchdf())
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    assert _values_match(sdf, odf), f"{name}: value mismatch"
