"""Per-query isolation bench (guide §1.4): times individual catalog
queries with the same methodology as the frozen ``bench.py`` (warm run
+ best-of-REPS noop-sink materialization) and optionally dumps
``explain("formatted")`` plans for the round's plan-diff evidence.

Usage:
    python bench_extra.py q1_pricing_summary graph_pagerank
    python bench_extra.py --explain plans/r06 --suffix before graph_pagerank
    python bench_extra.py --all            # whole catalog, one line each

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--explain", metavar="DIR", default=None,
                    help="write <name>_<suffix>.txt explain output here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json", metavar="FILE", default=None)
    args = ap.parse_args()

    from scrapelect_spark.operators.catalog import QUERIES
    from scrapelect_spark.session import get_spark

    names = sorted(QUERIES) if args.all else args.names
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    spark = get_spark(app_name="scrapelect-bench-extra", cpus=CPUS)
    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        if args.explain:
            import contextlib
            import io

            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"bench_extra:{name}:warm")
        force(fn(spark, SF_DIR))
        reps = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:rep{i}")
            t0 = time.perf_counter()
            force(fn(spark, SF_DIR))
            reps.append(time.perf_counter() - t0)
        out[name] = round(min(reps), 3)
        print(f"{name:40s} best={min(reps):7.3f}  reps="
              f"{[round(r, 3) for r in reps]}", flush=True)
    print(json.dumps({"queries": out, "sf": SF_DIR, "reps": REPS}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
