"""Round-6 measurement harness (guide §1): time individual headline queries
with the noop sink at a chosen SF dir, and capture .explain("formatted") for
each into plans/r06/. Mirrors bench.py's methodology (same session config,
same noop write) without touching the frozen bench.

Usage:
  python tools/profile_queries.py q1 q2 ...          # time listed queries
  python tools/profile_queries.py --explain q1 ...   # also dump plans
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/profile_queries.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("PROFILE_REPEAT", "1"))
PLAN_DIR = os.environ.get("PROFILE_PLAN_DIR", "")
SUFFIX = os.environ.get("PROFILE_PLAN_SUFFIX", "before")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_explain = "--explain" in sys.argv

    from bench import make_spark

    import __spark_entry__ as entry_mod

    spark = make_spark(CPUS, "profile-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qfns = {**entry_mod.queries(), **entry_mod.extra_queries()}

    out: dict[str, list[float]] = {}
    for name in args:
        fn = qfns[name]
        out[name] = []
        for r in range(REPEAT):
            spark.sparkContext.setJobDescription(f"profile:{name}#{r}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            out[name].append(round(dt, 3))
            print(f"{name}[{r}]: {dt:.3f}s", flush=True)
            if do_explain and r == 0 and PLAN_DIR:
                os.makedirs(PLAN_DIR, exist_ok=True)
                with open(os.path.join(PLAN_DIR, f"{name}_{SUFFIX}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
