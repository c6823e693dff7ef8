"""Plan-discipline assertions for the round-6 additions: the physical
plans must have the scale-safe shapes, not just correct output."""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_tpch_q3_takes_ordered_no_global_window(spark, sf_dir):
    """The global top-10 must be TakeOrderedAndProject (per-partition
    heaps) — a row_number window over the full aggregate would funnel
    every group through one partition."""
    from opensearch_jvector_plugin_spark.entry_queries import q_tpch_q3

    plan = _plan(q_tpch_q3(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    # The only window runs AFTER the limit (<= 10 rows).
    assert plan.index("TakeOrderedAndProject") > plan.index("Window"), plan


def test_tpch_q3_broadcasts_dimension_sides(spark, sf_dir):
    """customer (filtered) and orders (pruned) join lineitem as broadcast
    sides — the fact table never shuffles on the join keys."""
    from opensearch_jvector_plugin_spark.entry_queries import q_tpch_q3

    plan = _plan(q_tpch_q3(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_synonym_plan_broadcasts_expansion(spark, sf_dir):
    """The postings-side join against the (query, term, member) expansion
    must be broadcast — the corpus-sized side never shuffles for it."""
    from opensearch_jvector_plugin_spark.entry_queries import (
        q_bm25_synonyms,
    )

    plan = _plan(q_bm25_synonyms(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_script_score_udf_single_corpus_scan(spark, sf_dir):
    """The pandas plug-in path: one embeddings scan, query side broadcast
    (BroadcastNestedLoopJoin for the crossJoin), rank exchange on narrow
    scored rows only."""
    from opensearch_jvector_plugin_spark.entry_queries import (
        q_script_score_udf,
    )

    plan = _plan(q_script_score_udf(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, (
        plan
    )


def test_media_pipeline_no_payload_shuffle(spark, sf_dir):
    """Media payloads must not cross an exchange: the only shuffles in the
    plan are the video groupBy on (asset_id) AFTER frame sampling (narrow
    rows) and the union's partitioning — no Exchange carries `payload`."""
    from opensearch_jvector_plugin_spark.entry_queries import (
        q_media_pipeline,
    )

    plan = _plan(q_media_pipeline(spark, sf_dir))
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "payload" not in line, line
