"""Replay the driver's correctness gate locally: for every queries() entry,
run the Spark DataFrame and the DuckDB oracle SQL on the same parquet tables
and require identical row count, column names, and (order-insensitive)
values — at sf0.001 for speed."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("OJS_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(np.int64)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, ddb):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    got = normalize(qfn(spark, SF_DIR).toPandas())
    if sql is None:
        # Rows-only contract (non-harness-table inputs, e.g. the synthesized
        # transcript corpus); rank-identity is covered in dedicated tests.
        assert len(got) > 0, f"{name}: rows-only query returned nothing"
        return
    want = normalize(ddb.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        name, got.columns, want.columns
    )
    assert len(got) == len(want), (name, len(got), len(want))
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            np.testing.assert_allclose(
                got[c].to_numpy(dtype=float),
                want[c].to_numpy(dtype=float),
                rtol=0, atol=1.5e-6, err_msg=f"{name}.{c}",
            )
        else:
            assert got[c].tolist() == want[c].tolist(), f"{name}.{c}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}
