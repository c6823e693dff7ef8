"""Transcript-table I/O: catalog tables (Iceberg) and parquet paths.

The authoritative input (BASELINE.json input_hint) is an Iceberg table of
multi-turn transcripts. Iceberg's Spark surface IS the catalog API —
`spark.read.table("cat.db.transcripts")` / `df.writeTo(...)` with the
Iceberg catalog configured on the session — so the engine's source
boundary dispatches on the source string and stays format-agnostic:

    read_transcript_table(spark, "table:analytics.raw.transcripts")
        -> spark.read.table(...)    (Iceberg / Hive / any catalog)
    read_transcript_table(spark, "/data/transcripts.parquet")
        -> spark.read.parquet(...)  (the sandbox path: no catalog jars)

Either way the result is schema-validated against TRANSCRIPT_SCHEMA
(names + types; nullability and column ORDER are not part of the contract
— Iceberg tables evolve column order freely) so downstream operators can
rely on the exact input shape. At build scale the difference is pushdown:
a catalog scan gets Iceberg's partition pruning + min/max file skipping
for free through the same DataFrame plan; nothing downstream changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .transcripts import TRANSCRIPT_SCHEMA

TABLE_PREFIX = "table:"


class TranscriptSchemaError(ValueError):
    pass


def validate_transcript_schema(df: DataFrame) -> DataFrame:
    """Check names + types against TRANSCRIPT_SCHEMA and project to the
    canonical column order. Raises TranscriptSchemaError naming every
    missing column and every type mismatch at once."""
    want = {f.name: f.dataType for f in TRANSCRIPT_SCHEMA.fields}
    have = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in want if c not in have]
    wrong = [
        f"{c}: expected {want[c].simpleString()}, got {have[c].simpleString()}"
        for c in want
        if c in have and have[c] != want[c]
    ]
    if missing or wrong:
        parts = []
        if missing:
            parts.append(f"missing columns: {missing}")
        if wrong:
            parts.append(f"type mismatches: {wrong}")
        raise TranscriptSchemaError(
            "input is not a transcript table — " + "; ".join(parts)
        )
    return df.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields])


def read_transcript_table(spark: SparkSession, source: str) -> DataFrame:
    """Load the transcript input from `table:<identifier>` (catalog —
    Iceberg in production, temp views in tests) or a parquet path, schema-
    validated either way."""
    if source.startswith(TABLE_PREFIX):
        df = spark.read.table(source[len(TABLE_PREFIX):])
    else:
        df = spark.read.parquet(source)
    return validate_transcript_schema(df)


def write_transcript_table(df: DataFrame, target: str, mode: str = "error") -> None:
    """Write a transcript DataFrame to `table:<identifier>` (catalog —
    `saveAsTable` uses the session catalog's default format; with an
    Iceberg catalog configured that is an Iceberg commit) or a parquet
    path. Input is schema-validated first so a bad pipeline fails before
    it writes anything."""
    out = validate_transcript_schema(df)
    if target.startswith(TABLE_PREFIX):
        out.write.mode(mode).saveAsTable(target[len(TABLE_PREFIX):])
    else:
        out.write.mode(mode).parquet(target)
