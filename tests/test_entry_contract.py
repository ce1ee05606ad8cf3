"""Replicates the driver's correctness protocol locally: run each
queries() entry on Spark at sf0.01 and compare row count, column names,
and order-insensitive values against oracle_sql() in DuckDB."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c], utc=True).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif df[c].dtype == object or str(df[c].dtype) == "string":
            try:
                df[c] = pd.to_numeric(df[c]).astype(float).round(6)  # Decimal -> float
            except (ValueError, TypeError):
                df[c] = df[c].astype("string")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(got) > 0  # rows-only check, like the driver's weak path
        return
    exp = duck.sql(oracle).df()
    assert sorted(got.columns) == sorted(exp.columns), (sorted(got.columns), sorted(exp.columns))
    assert len(got) == len(exp)
    g, e = normalize(got), normalize(exp)
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False)
    except AssertionError:
        diff = pd.concat([g, e]).drop_duplicates(keep=False)
        raise AssertionError(f"{name}: value mismatch; sample diff:\n{diff.head(10)}")


def _type_class(dt) -> str:
    s = str(dt)
    if "int" in s.lower():
        return "int"
    if any(x in s.lower() for x in ("float", "double", "decimal")):
        return "float"
    if "bool" in s.lower():
        return "bool"
    if any(x in s.lower() for x in ("object", "string", "str")):
        return "str"
    return s


@pytest.mark.parametrize("name", sorted(k for k in entry_mod.queries() if k in entry_mod.oracle_sql()))
def test_schema_type_classes_align(spark, duck, name):
    got = entry_mod.queries()[name](spark, SF_DIR).limit(50).toPandas()
    exp = duck.sql(entry_mod.oracle_sql()[name]).df().head(50)
    for c in sorted(got.columns):
        assert _type_class(got[c].dtype) == _type_class(exp[c].dtype), (
            name, c, got[c].dtype, exp[c].dtype)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


# Queries DECLARED oracle-less: genuinely non-SQL-expressible ops where
# the driver's rows-only check is the intended (weaker) gate. Every
# entry here must say why, and its distributed inputs must be oracled
# separately. Round 6: EMPTY — pca_projection (the last member) now
# hash-oracles through its invariants (Bessel, energy identity, basis
# orthonormality, exact integer scatter anchor).
_NO_ORACLE_DECLARED: set[str] = set()


def test_every_query_carries_an_oracle():
    """Round 3 reached 100% oracle coverage; this pins it — a new
    queries() entry without an oracle_sql() twin (or vice versa) fails
    here instead of silently downgrading to the driver's weak
    rows-only check, unless the exception is DECLARED above with a
    reason."""
    q, o = set(entry_mod.queries()), set(entry_mod.oracle_sql())
    assert q - o == _NO_ORACLE_DECLARED, (sorted(q - o), sorted(o - q))
    assert not (o - q), sorted(o - q)
