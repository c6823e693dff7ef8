"""Tokenizer contract: the Spark, pandas, pure-Python, and DuckDB-SQL
tokenizers must agree token-for-token (the tokenizer is part of the index
format — TOKENIZER_VERSION in every manifest)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from opensearch_jvector_plugin_spark.functions.tokenizer import (
    tokenize_col,
    tokenize_series,
    tokenize_sql,
    tokenize_text,
)
from opensearch_jvector_plugin_spark.sources.transcripts import (
    synthesize_transcripts_pdf,
)

SAMPLES = [
    "Hello, World! 42 foo_bar",
    "a b c",
    "",
    "UPPER lower MiXeD 0x1f",
    "tabs\tand\nnewlines  and   spaces",
    "punct;only...!!!",
    "term0001, Term0002; term0003. hotcommon",
    "Kelvin temp İstanbul noİk",  # Unicode fold chars
    "café Ωmega ſtraße",  # non-ASCII separators in every path
    None,
]


def test_python_tokenizer_basics():
    assert tokenize_text("Hello, World! 42 foo_bar") == [
        "hello", "world", "42", "foo", "bar",
    ]
    assert tokenize_text("") == []
    assert tokenize_text(None) == []


def test_pandas_matches_python():
    s = pd.Series(SAMPLES, dtype=object)
    got = tokenize_series(s).tolist()
    want = [tokenize_text(x) for x in SAMPLES]
    assert got == want


def test_spark_matches_python(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "i int, text string"
    )
    rows = df.select("i", tokenize_col("text").alias("toks")).orderBy("i").collect()
    for row in rows:
        assert row.toks == tokenize_text(SAMPLES[row.i]), SAMPLES[row.i]


def test_duckdb_sql_matches_python():
    con = duckdb.connect()
    for s in SAMPLES:
        if s is None:
            continue
        got = con.execute(
            f"select {tokenize_sql('?::VARCHAR')}", [s]
        ).fetchone()[0]
        assert got == tokenize_text(s), s


def test_tokenizer_on_synthetic_corpus(spark):
    pdf = synthesize_transcripts_pdf(np.arange(300), 30, 10, seed=42)
    sdf = spark.createDataFrame(pdf)
    rows = (
        sdf.select("turn_idx", "conv_id", tokenize_col("text").alias("toks"))
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for row, text in zip(rows, pdf["text"]):
        assert row.toks == tokenize_text(text)
