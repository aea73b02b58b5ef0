"""Auxiliary benchmarks for the optimization rounds (bench.py is frozen
for measurement; this file is where extra evidence lives — guide §1.4).

Modes:
  python bench_extra.py                 # headline phase only, FULL
                                        # per-query map (median-of-3,
                                        # same session/methodology as
                                        # bench.py's run_headline)
  python bench_extra.py --query NAME [NAME ...]
                                        # isolated: fresh session, warm
                                        # pass, median-of-5 per query
  python bench_extra.py --explain NAME [NAME ...]
                                        # write .explain("formatted")
                                        # for the query to stdout
  python bench_extra.py --noop NAME     # time with the noop sink
                                        # (computes every column)

All modes print one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench as benchmod  # noqa: E402  (frozen; reused, never edited)

SF_DIR = benchmod.SF_DIR
CPUS = benchmod.CPUS


def _warm(spark) -> None:
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    spark.range(256).mapInPandas(lambda it: it, schema="id long").count()


def headline_full() -> None:
    spark = benchmod._fresh_session(CPUS)
    timings = benchmod.run_headline(spark)
    spark.stop()
    print(json.dumps({
        "mode": "headline_full",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "loadavg": round(os.getloadavg()[0], 2),
    }))


def isolated(names: list[str], reps: int = 5) -> None:
    import __spark_entry__ as entrymod

    out: dict[str, dict] = {}
    for name in names:
        spark = benchmod._fresh_session(CPUS)
        _warm(spark)
        qs = entrymod.queries()
        spark.sparkContext.setJobDescription(f"isolated:{name}")
        qs[name](spark, SF_DIR).count()  # warm pass
        samples = []
        for _ in range(reps):
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).count()
            samples.append(round(time.monotonic() - t0, 3))
        spark.stop()
        out[name] = {"median": sorted(samples)[len(samples) // 2],
                     "min": min(samples), "samples": samples}
    print(json.dumps({"mode": "isolated", "queries": out,
                      "loadavg": round(os.getloadavg()[0], 2)}))


def explain(names: list[str]) -> None:
    import __spark_entry__ as entrymod

    spark = benchmod._fresh_session(CPUS)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        print(f"==== {name} ====")
        print(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    spark.stop()
    print(json.dumps({"mode": "explain", "queries": names}))


def noop(names: list[str], reps: int = 3) -> None:
    import __spark_entry__ as entrymod

    out: dict[str, dict] = {}
    spark = benchmod._fresh_session(CPUS)
    _warm(spark)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(reps):
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"median": sorted(samples)[len(samples) // 2],
                     "samples": samples}
    spark.stop()
    print(json.dumps({"mode": "noop", "queries": out}))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--query":
        isolated(sys.argv[2:])
    elif len(sys.argv) > 2 and sys.argv[1] == "--explain":
        explain(sys.argv[2:])
    elif len(sys.argv) > 2 and sys.argv[1] == "--noop":
        noop(sys.argv[2:])
    else:
        headline_full()
