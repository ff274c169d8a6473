"""Round-6 optimization measurement harness (bench.py stays frozen).

Per-query wall times for the __spark_entry__.queries() sweep with
N samples each (cold first-run + min), optional .explain("formatted")
plan capture, and a noop-sink mode (guide §1.4) so the computation is
timed rather than the count()-pruned plan when requested.

Usage:
  python bench_extra.py [--samples N] [--queries a,b,c] [--plans DIR]
                        [--noop] [--out FILE]

Prints one JSON line and (with --out) writes the full record.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from scrapy_rs_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--queries", type=str, default=None)
    ap.add_argument("--plans", type=str, default=None)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--suffix", type=str, default="",
                    help="plan file suffix, e.g. _before/_after")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    qs = entry.queries()
    if args.queries:
        keep = args.queries.split(",")
        qs = {k: qs[k] for k in keep}

    spark = build_session(app_name="bench_extra", master=f"local[{CPUS}]")
    sc = spark.sparkContext
    result: dict = {"sf_dir": SF_DIR, "samples": args.samples,
                    "noop": args.noop, "queries": {}}
    try:
        # same untimed warmup as bench.py
        full = entry.queries()
        for wname in ("frontier_rank_priority", "url_canonicalize"):
            try:
                full[wname](spark, SF_DIR).count()
            except Exception:
                pass
        for name, fn in qs.items():
            times = []
            for i in range(args.samples):
                sc.setJobDescription(f"{name}#{i}")
                t0 = time.time()
                df = fn(spark, SF_DIR)
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
                times.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
            result["queries"][name] = {
                "first": times[0],
                "min": min(times),
                "all": times,
            }
            if args.plans:
                os.makedirs(args.plans, exist_ok=True)
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    fn(spark, SF_DIR).explain("formatted")
                with open(
                    os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
    finally:
        spark.stop()

    compact = {
        k: v["min"] for k, v in result["queries"].items()
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps({"min": compact,
                      "first": {k: v["first"]
                                for k, v in result["queries"].items()}}))


if __name__ == "__main__":
    main()
