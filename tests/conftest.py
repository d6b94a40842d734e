"""Shared fixtures: one SparkSession per test session + the DuckDB oracle
comparator that mirrors the driver's check (row count + column names +
order-insensitive values)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pei_nwdaf_data_ingestion_spark.catalog import TABLES
from pei_nwdaf_data_ingestion_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows - the driver's
    order-insensitive comparison, locally reproduced."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("Int64")
        else:
            out[c] = s.astype("string")
    norm = pd.DataFrame(out)
    norm = norm.sort_values(by=list(norm.columns), kind="mergesort").reset_index(drop=True)
    return norm


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa):
            ok = (
                (sa.isna() & sb.isna())
                | ((sa - sb).abs() <= 1e-9 + 1e-9 * sb.abs().fillna(0))
            )
        else:
            ok = (sa.isna() & sb.isna()) | (sa == sb)
        if not ok.all():
            bad = (~ok.fillna(False)).idxmax()
            raise AssertionError(
                f"{name}: column {c!r} differs at sorted row {bad}: "
                f"spark={sa.iloc[bad]!r} oracle={sb.iloc[bad]!r}"
            )
