"""Capture .explain('formatted') for every registry query -> per-query file.

Usage: python scripts/capture_plans.py <out_dir> [name ...]

Writes <out_dir>/<query>_<suffix>.txt (suffix from $OJS_PLAN_SUFFIX,
default 'before'). Queries run against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1). Construction side effects (index builds, stats
collects) run as usual; the captured text is the final frame's physical
plan, which is what the optimization round's plan-diff evidence needs.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    out_dir = sys.argv[1]
    only = set(sys.argv[2:])
    suffix = os.environ.get("OJS_PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from opensearch_jvector_plugin_spark.entry_queries import QUERIES
    from opensearch_jvector_plugin_spark.session import get_spark

    spark = get_spark(app_name="ojs-plans",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover - capture tool
            plan = f"ERROR: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:120])
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
