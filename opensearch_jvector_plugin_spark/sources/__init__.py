from .transcripts import (
    TRANSCRIPT_SCHEMA,
    synthesize_transcripts,
    synthesize_transcripts_pdf,
    reference_queries,
)
from .table_io import (
    TranscriptSchemaError,
    read_transcript_table,
    validate_transcript_schema,
    write_transcript_table,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "synthesize_transcripts",
    "synthesize_transcripts_pdf",
    "reference_queries",
    "TranscriptSchemaError",
    "read_transcript_table",
    "validate_transcript_schema",
    "write_transcript_table",
]
