"""Driver-contract regression tests: entry/queries/oracle_sql stay
consistent and runnable (the full oracle comparison lives in
tools/check_oracle.py; this guards the contract shape in CI)."""

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"rule_set", "path", "time", "value"}


def test_oracle_keys_subset():
    qs = set(entry.queries())
    oracle = set(entry.oracle_sql())
    assert oracle <= qs
    # every query carries an oracle; ann_ivf's is generated from the
    # oracle-side parquet and disappears only if that file is missing
    assert qs == oracle


@pytest.mark.parametrize("name", ["points_ingest", "rollup_all", "tagged_table"])
def test_sampled_oracle_match(spark, name):
    """Spot-check the oracle machinery end-to-end at sf0.001 inside
    the test suite (full sweep: tools/check_oracle.py)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sdf = entry.queries()[name](spark, SF).toPandas()
    odf = con.execute(entry.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    a = sdf[sorted(sdf.columns)].astype(str).sort_values(
        by=sorted(sdf.columns), ignore_index=True
    )
    b = odf[sorted(odf.columns)].astype(str).sort_values(
        by=sorted(odf.columns), ignore_index=True
    )
    assert a.equals(b)
