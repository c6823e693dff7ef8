"""Stateful streaming sessionization (streaming/sessions.py,
applyInPandasWithState): state carries sessions across micro-batches and
the reconstructed output equals the batch sessionize operator exactly."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from opensearch_jvector_plugin_spark.streaming.sessions import (
    sessionize_stream,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _batch_sessions(spark, events_df) -> pd.DataFrame:
    """The batch oracle: q_sessionize's exact logic on the same events."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (
        events_df.withColumn(
            "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        ).withColumn(
            "session_id",
            F.sum("new_sess").over(
                w.rowsBetween(W.unboundedPreceding, 0)
            ).cast("long"),
        )
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min(F.unix_timestamp("ts")).cast("long").alias("t_start"),
            F.max(F.unix_timestamp("ts")).cast("long").alias("t_end"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("n_files", [1, 3])
def test_stream_matches_batch_sessionize(spark, tmp_path, n_files):
    """Events split time-ordered across n_files micro-batches: the
    per-user state must stitch sessions across batch boundaries so the
    reconstructed sessions (closures + final open snapshots) equal the
    batch operator's output bit-for-bit."""
    events = spark.read.parquet(EVENTS).where(F.col("user_id") < 15)
    pdf = events.toPandas().sort_values(["ts", "event_id"])
    # pandas round-trips ts as ns; the stream schema (from the Spark read)
    # expects us-precision timestamps in the files.
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    src = str(tmp_path / f"ev_src_{n_files}")
    os.makedirs(src)
    n = len(pdf)
    for i in range(n_files):
        chunk = pdf.iloc[i * n // n_files : (i + 1) * n // n_files]
        chunk.to_parquet(os.path.join(src, f"part-{i:03d}.parquet"),
                         index=False)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    updates = sessionize_stream(stream)
    collected: list[pd.DataFrame] = []

    def sink(df, batch_id):
        p = df.toPandas()
        p["batch_id"] = batch_id
        collected.append(p)

    q = updates.writeStream.foreachBatch(sink).outputMode("update").option(
        "checkpointLocation", str(tmp_path / f"ckpt_{n_files}")
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)

    allrows = pd.concat(collected, ignore_index=True)
    # Reconstruct: a closed row is final; otherwise the LAST update wins.
    allrows = allrows.sort_values(["batch_id", "closed"])  # closed last
    final = allrows.groupby(["user_id", "session_id"]).tail(1)
    got = (
        final[["user_id", "session_id", "n_events", "t_start", "t_end",
               "sum_value"]]
        .assign(sum_value=lambda d: d["sum_value"].round(6))
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    want = _batch_sessions(spark, events)
    pd.testing.assert_frame_equal(
        got.astype(want.dtypes.to_dict()), want
    )
    if n_files > 1:
        assert allrows["batch_id"].nunique() == n_files
        # State crossed batches: users emit in several batches and their
        # session numbering keeps MONOTONICALLY increasing across them
        # (a state reset would restart at 1 and break the batch oracle
        # equality above; pin the monotonicity explicitly too).
        upd = allrows[~allrows["closed"]]
        multi = upd.groupby("user_id")["batch_id"].nunique()
        assert (multi > 1).any()
        for _, g in upd.sort_values("batch_id").groupby("user_id"):
            sids = g["session_id"].to_numpy()
            assert (sids[1:] >= sids[:-1]).all()
