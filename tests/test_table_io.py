"""Transcript-table source boundary (sources/table_io.py): catalog-table
and parquet dispatch, schema validation errors, canonical column order."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.sources import (
    TRANSCRIPT_SCHEMA,
    TranscriptSchemaError,
    read_transcript_table,
    validate_transcript_schema,
    write_transcript_table,
)
from opensearch_jvector_plugin_spark.sources.transcripts import (
    synthesize_transcripts_pdf,
)


@pytest.fixture(scope="module")
def transcripts(spark):
    pdf = synthesize_transcripts_pdf(np.arange(60), 12, 5, seed=42)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def test_parquet_roundtrip_validates_and_orders(spark, transcripts, tmp_path):
    p = str(tmp_path / "t.parquet")
    write_transcript_table(transcripts, p)
    back = read_transcript_table(spark, p)
    assert [f.name for f in back.schema.fields] == [
        f.name for f in TRANSCRIPT_SCHEMA.fields
    ]
    assert back.count() == 60


def test_catalog_table_dispatch(spark, transcripts):
    """The `table:` branch goes through spark.read.table — the Iceberg
    deployment surface; a temp view exercises the same catalog API."""
    # Shuffled column order: the contract is name+type, not position.
    transcripts.select(
        "ts", "text", "tool", "role", "turn_idx", "conv_id"
    ).createOrReplaceTempView("transcripts_v")
    back = read_transcript_table(spark, "table:transcripts_v")
    assert [f.name for f in back.schema.fields] == [
        f.name for f in TRANSCRIPT_SCHEMA.fields
    ]
    assert back.count() == 60


def test_missing_and_mistyped_columns_rejected(spark, transcripts):
    with pytest.raises(TranscriptSchemaError, match="missing.*text"):
        validate_transcript_schema(transcripts.drop("text"))
    bad = transcripts.withColumn("turn_idx", F.col("turn_idx").cast("string"))
    with pytest.raises(TranscriptSchemaError, match="turn_idx.*expected int"):
        validate_transcript_schema(bad)
