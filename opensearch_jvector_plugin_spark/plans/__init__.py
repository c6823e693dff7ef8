from .docids import assign_doc_ids
from .stats import corpus_stats, postings_df, term_stats

__all__ = ["assign_doc_ids", "corpus_stats", "postings_df", "term_stats"]
