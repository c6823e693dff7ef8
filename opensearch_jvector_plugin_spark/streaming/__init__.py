from .incremental import append_batch, start_index_stream

__all__ = ["append_batch", "start_index_stream"]
