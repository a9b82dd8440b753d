"""Per-query isolation harness for the optimization rounds.

NOT part of the frozen driver contract (bench.py is the measured
artifact); this tool exists so each query can be measured alone
(guide §1.4: noop sink, fresh session, labelled jobs) and so
``.explain("formatted")`` plans can be captured into plans/r06/.

Usage:
  python bench_extra.py --time q130_triad_census,q99_bpe_merges [--n 2]
  python bench_extra.py --explain q130_triad_census --suffix before
  python bench_extra.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unarxive_spark.session import get_spark, stop_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _registry():
    import __spark_entry__

    return __spark_entry__.queries()


def _fresh(name: str):
    stop_spark()
    return get_spark(
        master=f"local[{CPUS}]",
        app_name=f"bx-{name}",
        shuffle_partitions=CPUS,
    )


def time_query(name: str, n: int) -> list[float]:
    reg = _registry()
    fn = reg[name]
    out = []
    for i in range(n):
        spark = _fresh(name)
        spark.sparkContext.setJobDescription(f"{name} run {i}")
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    stop_spark()
    return out


def explain_query(name: str, suffix: str) -> str:
    reg = _registry()
    spark = _fresh(name)
    df = reg[name](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    os.makedirs(PLAN_DIR, exist_ok=True)
    path = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(plan)
    stop_spark()
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", default=None)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    if args.list:
        print("\n".join(_registry().keys()))
        return
    if args.explain:
        for name in args.explain.split(","):
            print(explain_query(name.strip(), args.suffix))
    if args.time:
        res = {}
        for name in args.time.split(","):
            res[name.strip()] = time_query(name.strip(), args.n)
        print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "times": res}))


if __name__ == "__main__":
    main()
