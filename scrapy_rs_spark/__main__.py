"""CLI entry point — parity with the reference binary
(/root/reference/src/main.rs:122-171: `scrapyrs crawl` dispatch; spider
built from settings START_URLS/ALLOWED_DOMAINS :567-605; stats printed
:701-721).

Usage (ship vehicle: spark-submit --py-files crawlspark.zip):

    python -m scrapy_rs_spark crawl \
        --pages /data/pages_parquet \
        --seeds http://mocksite.test/0 [more...] \
        [--seeds-file seeds.txt] \
        [--settings settings.json] \
        [--store /data/crawlstore] \
        [--master local[*]] [--max-rounds 1000]

The pages table is the Common-Crawl-style input (url, warc_ts, html,
text, lang[, status, headers]); there is no live HTTP in this engine.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from scrapy_rs_spark.api import Spider, run_crawl
from scrapy_rs_spark.session import build_session
from scrapy_rs_spark.settings import Settings


def _pages_df(spark, path: str):
    df = spark.read.parquet(path)
    if "status" not in df.columns:
        df = df.withColumn("status", F.lit(200))
    if "headers" not in df.columns:
        df = df.withColumn(
            "headers", F.lit(None).cast("map<string,string>")
        )
    return df


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="scrapy_rs_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("crawl", help="run a crawl over a pages table")
    c.add_argument("--pages", required=True, help="pages parquet path")
    c.add_argument("--seeds", nargs="*", default=[], help="seed URLs")
    c.add_argument("--seeds-file", help="file with one seed URL per line")
    c.add_argument(
        "--settings",
        help="settings file: .json/.toml/.py/.yaml, OR a dotted module"
        " path (e.g. mypkg.settings — the PySettings.from_module"
        " analogue; UPPER_CASE attributes become keys). Reference key"
        " names ok; START_URLS/ALLOWED_DOMAINS build the spider like"
        " the reference binary",
    )
    c.add_argument("--store", help="crawl store directory (resume-able)")
    c.add_argument(
        "--resume",
        action="store_true",
        help="continue a store that already has committed rounds",
    )
    c.add_argument("--master", default=None)
    c.add_argument("--max-rounds", type=int, default=1000)
    c.add_argument("--name", default="spider")
    c.add_argument("--json", action="store_true", help="print stats as JSON")
    args = ap.parse_args(argv)

    raw = {}
    if args.settings:
        # a path-less name with no recognised extension is a dotted
        # module path (mypkg.settings) — the from_module loader; files
        # keep the extension-dispatched parser
        import os

        is_file = os.path.exists(args.settings) or args.settings.lower().endswith(
            (".json", ".toml", ".py", ".yaml", ".yml")
        )
        raw = (
            Settings.raw_from_file(args.settings)
            if is_file
            else Settings.raw_from_module(args.settings)
        )
    settings = Settings.from_dict(raw)
    seeds = list(args.seeds)
    if args.seeds_file:
        with open(args.seeds_file) as f:
            seeds += [ln.strip() for ln in f if ln.strip()]
    # reference CLI builds the spider from settings (main.rs:567-605)
    seeds += [u for u in raw.get("START_URLS", []) if u not in seeds]
    allowed = list(raw.get("ALLOWED_DOMAINS", []))
    if not seeds and not args.resume:
        print(
            "no seeds given (--seeds / --seeds-file / START_URLS)",
            file=sys.stderr,
        )
        return 2

    spark = build_session(app_name=f"crawl:{args.name}", master=args.master)
    try:
        if args.resume:
            if not args.store:
                print("--resume requires --store", file=sys.stderr)
                return 2
            from scrapy_rs_spark.plans.engine import CrawlEngine

            engine = CrawlEngine(
                spark,
                _pages_df(spark, args.pages),
                settings,
                store_path=args.store,
            )
            stats = engine.resume(max_rounds=args.max_rounds)
        else:
            spider = Spider(
                name=args.name, start_urls=seeds, allowed_domains=allowed
            )
            stats = run_crawl(
                spark,
                spider,
                _pages_df(spark, args.pages),
                settings,
                store_path=args.store,
                max_rounds=args.max_rounds,
            )
        out = {
            "requests": stats.requests,
            "responses": stats.responses,
            "items": stats.items,
            "errors": stats.errors,
            "retries": stats.retries,
            "rounds": stats.rounds,
            "new_urls": stats.new_urls,
        }
        if args.json:
            print(json.dumps(out))
        else:
            # stats block like the reference CLI (main.rs:701-721)
            print("Crawl finished:")
            for k, v in out.items():
                print(f"  {k:>10}: {v}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
