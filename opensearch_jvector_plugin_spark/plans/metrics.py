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


def append_metrics(index_dir: str, record: dict, storage=None) -> None:
    """Append one JSON metrics record (build/query/merge) to the index's
    metrics log — the lineage + build-metrics surface of the north rule.

    Default (POSIX): append a line to metrics.jsonl. With an IndexStorage
    client: object stores cannot append, so each record becomes its own
    object under metrics/ (one PUT, no read-modify-write race);
    read_metrics merges both layouts."""
    record = {"ts": time.time(), **record}
    data = json.dumps(record, sort_keys=True)
    from ..storage import PosixStorage

    if storage is not None and not isinstance(storage, PosixStorage):
        storage.put_bytes(
            os.path.join(
                index_dir, "metrics", f"{time.time_ns()}.json"
            ),
            data.encode(),
        )
        return
    path = os.path.join(index_dir, "metrics.jsonl")
    with open(path, "a") as f:
        f.write(data + "\n")


def read_metrics(index_dir: str) -> list[dict]:
    out = []
    path = os.path.join(index_dir, "metrics.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            out.extend(json.loads(line) for line in f if line.strip())
    mdir = os.path.join(index_dir, "metrics")
    if os.path.isdir(mdir):
        for fn in sorted(os.listdir(mdir)):
            if fn.endswith(".json"):
                with open(os.path.join(mdir, fn)) as f:
                    out.append(json.load(f))
    return out
