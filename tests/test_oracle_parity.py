"""Driver-mimic: every oracle-checked query must match DuckDB exactly
(row count + sorted-column value multiset) at sf0.01 — the same comparison
the driver's CORRECTNESS gate performs.
"""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = E.queries()[name]
    raw_got = q(spark, SF_DIR).toPandas()
    raw_want = ddb.execute(E.oracle_sql()[name]).df()
    got = normalize(raw_got)
    want = normalize(raw_want)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # Driver hash is type-sensitive: a DuckDB HUGEINT (int128 → float64/object
    # in pandas) where Spark emits BIGINT breaks the value hash even when the
    # values match. Require the oracle to deliver a plain integer dtype for
    # every Spark integer column (CAST(... AS BIGINT) in the SQL).
    for c in raw_got.columns:
        if raw_got[c].dtype.kind in "iu":
            assert raw_want[c].dtype.kind in "iu", (
                f"{name}.{c}: oracle dtype {raw_want[c].dtype} vs Spark int — "
                f"add CAST(... AS BIGINT) to the oracle SQL"
            )


def test_all_queries_have_entries():
    qs = E.queries()
    for k in E.oracle_sql():
        assert k in qs, f"oracle {k} has no query"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.limit(5).collect()
    assert df.count() > 0
    assert set(df.columns) >= {"doc_id", "cluster_id"}
