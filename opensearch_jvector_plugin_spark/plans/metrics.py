"""Job metrics — the analog of the reference's stats counters
(KNNCounter/StatNames monotonic counters and the REST stats handler,
plugin/stats/KNNCounter.java, plugin/rest/RestKNNStatsHandler.java).

Spark-first: `DataFrame.observe` attaches named aggregates that are
computed AS the job runs (no extra pass), collected by a
QueryExecutionListener and appended to a metrics log next to the index.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_rowcount(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach a zero-cost row/byte observation to a DataFrame. After an
    action runs, `observation.get` yields the metrics."""
    obs = Observation(name)
    out = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    return out, obs


def append_metrics(index_dir: str, record: dict) -> None:
    """Append one JSON metrics record (build/query/merge) to the index's
    metrics log — the lineage + build-metrics surface of the north rule."""
    path = os.path.join(index_dir, "metrics.jsonl")
    record = {"ts": time.time(), **record}
    with open(path, "a") as f:
        f.write(json.dumps(record, sort_keys=True) + "\n")


def read_metrics(index_dir: str) -> list[dict]:
    path = os.path.join(index_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
