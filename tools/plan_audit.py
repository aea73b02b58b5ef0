"""Physical-plan audit over the headline queries: the `.explain`
discipline as a reusable report.

For each query, prints one line of plan vitals:

- ``py``    — Python stages in the plan (ArrowEval/BatchEval/
  MapInPandas/FlatMapGroupsInPandas); queries flagged ``py`` should be
  exactly the ones whose semantics *require* Python (extraction
  kernels, seeded sketches), never relational work.
- ``xchg``  — Exchange (shuffle) operators; every one should be
  explainable by a groupBy/join/window/orderBy the query needs.
- ``bhj/smj`` — broadcast vs sort-merge joins chosen by Catalyst.
- ``pushed`` — scans with pushed filters (predicate pushdown reached
  parquet).

Queries that materialize work during CONSTRUCTION (fixture builders,
iterative loops with bounded collects, the pipeline composition
oracles) used to audit as ``xchg=0`` because only the returned frame's
plan was read.  The audit now also drains the SQL status store for
every execution fired while the query was being built and reports
those plans' vitals as a ``[build: …]`` suffix — so eager work is
audited, not invisible.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from docvault_ocr_service_spark.session import get_spark  # noqa: E402

_PY = ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
       "FlatMapGroupsInPandas")


def audit(plan: str) -> dict:
    # (no codegen-span metric: under AQE the plan string carries no
    # codegen markers until runtime finalizes each stage)
    return {
        "py": sum(plan.count(p) for p in _PY),
        "xchg": plan.count("Exchange"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n for n in qs if not only or n in only]
    store = spark._jsparkSession.sharedState().statusStore()

    def drain_listener_bus() -> None:
        # the status store is fed asynchronously; without a drain the
        # build-phase read can miss still-queued executions (or blame
        # them on the NEXT query)
        try:
            spark.sparkContext._jsc.sc().listenerBus() \
                .waitUntilEmpty(10000)
        except Exception:  # noqa: BLE001 — private API; best effort
            import time

            time.sleep(1.0)

    def last_exec_id() -> int:
        lst = store.executionsList()
        return (lst.apply(lst.size() - 1).executionId()
                if lst.size() else -1)

    def build_plans_since(eid: int) -> list[str]:
        lst = store.executionsList()
        return [lst.apply(i).physicalPlanDescription()
                for i in range(lst.size())
                if lst.apply(i).executionId() > eid]

    for name in names:
        try:
            drain_listener_bus()
            before = last_exec_id()
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            a = audit(plan)
            flags = " ".join(f"{k}={v}" for k, v in a.items())
            drain_listener_bus()
            bplans = build_plans_since(before)
            if bplans:
                b = {k: sum(audit(p)[k] for p in bplans) for k in a}
                bf = " ".join(f"{k}={v}" for k, v in b.items())
                print(f"{name:32s} {flags}  "
                      f"[build: execs={len(bplans)} {bf}]")
            else:
                print(f"{name:32s} {flags}")
        except Exception as e:  # noqa: BLE001 — audit keeps going
            print(f"{name:32s} AUDIT-ERROR {type(e).__name__}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
