from .transcripts import (
    TRANSCRIPT_SCHEMA,
    synthesize_transcripts,
    synthesize_transcripts_pdf,
    reference_queries,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "synthesize_transcripts",
    "synthesize_transcripts_pdf",
    "reference_queries",
]
