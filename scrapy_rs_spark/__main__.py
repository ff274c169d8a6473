"""CLI entry point — parity with the reference binary
(/root/reference/src/main.rs:30-119: subcommands startproject /
genspider / crawl / list / runspider / settings / version; spider built
from settings START_URLS/ALLOWED_DOMAINS :567-605; stats printed
:701-721).

Usage (ship vehicle: spark-submit --py-files crawlspark.zip):

    python -m scrapy_rs_spark crawl \
        --pages /data/pages_parquet \
        --seeds http://mocksite.test/0 [more...] \
        [--seeds-file seeds.txt] \
        [--settings settings.json] \
        [--store /data/crawlstore] \
        [--output items.json --format json] \
        [--master local[*]] [--max-rounds 1000]

    python -m scrapy_rs_spark startproject mybot
    python -m scrapy_rs_spark genspider docs example.com --template custom
    python -m scrapy_rs_spark list
    python -m scrapy_rs_spark runspider spiders/docs.py --pages /data/pages
    python -m scrapy_rs_spark crawl docs --pages /data/pages   # spiders/docs.py
    python -m scrapy_rs_spark settings [NAME [VALUE]] [--settings-file f]
    python -m scrapy_rs_spark version

The pages table is the Common-Crawl-style input (url, warc_ts, html,
text, lang[, status, headers]); there is no live HTTP in this engine —
so unlike the reference (main.rs:800-808), a missing/empty START_URLS
is an error rather than a silent fallback to https://example.com, and
`--output` is actually implemented (the reference leaves it as a TODO,
main.rs:723-726) via the engine's committed items.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F

# project scaffold (startproject) — UPPER_CASE keys are this engine's
# Settings surface (reference template: main.rs:190-238)
_SETTINGS_TEMPLATE = """# scrapy_rs_spark settings file
# UPPER_CASE names are loaded by Settings.from_module / --settings

BOT_NAME = {name!r}
USER_AGENT = 'scrapy_rs_spark/0.1.0'

# Crawl settings
DOWNLOAD_DELAY_MS = 0
REQUEST_TIMEOUT = 30
FOLLOW_REDIRECTS = True
MAX_RETRIES = 3
RESPECT_ROBOTS_TXT = True

# Limits
MAX_DEPTH = None
MAX_REQUESTS_PER_DOMAIN = None

# Spider settings
ALLOWED_DOMAINS = []
START_URLS = []
"""

_SPIDER_BASIC = '''from scrapy_rs_spark import Spider

SPIDER = Spider(
    name={name!r},
    start_urls=["https://{domain}"],
    allowed_domains=[{domain!r}],
)
'''

_SPIDER_CUSTOM = '''from scrapy_rs_spark import Spider


def parse_text(html: bytes) -> str:
    """Extract the document text (runs as an Arrow-batched UDF)."""
    return html.decode("utf-8", errors="replace")


def parse_fields(html: bytes) -> dict:
    """Extract item fields (DynamicItem analogue)."""
    return {{"length": len(html)}}


SPIDER = Spider(
    name={name!r},
    start_urls=["https://{domain}"],
    allowed_domains=[{domain!r}],
    parse_text=parse_text,
    parse_fields=parse_fields,
)
'''


def _pages_df(spark, path: str):
    df = spark.read.parquet(path)
    if "status" not in df.columns:
        df = df.withColumn("status", F.lit(200))
    if "headers" not in df.columns:
        df = df.withColumn(
            "headers", F.lit(None).cast("map<string,string>")
        )
    return df


def _load_raw_settings(path: str | None) -> dict:
    """Reference load_settings (main.rs:797-809): missing file warns
    and falls back to defaults instead of failing."""
    from scrapy_rs_spark.settings import Settings

    if not path:
        path = "settings.py"
        if not os.path.exists(path):
            return {}
    is_file = os.path.exists(path) or path.lower().endswith(
        (".json", ".toml", ".py", ".yaml", ".yml")
    )
    try:
        return (
            Settings.raw_from_file(path)
            if is_file
            else Settings.raw_from_module(path)
        )
    except (FileNotFoundError, ImportError):
        # reference behavior: warn and continue with defaults
        # (main.rs:800-808)
        print(
            f"Error loading settings from {path}: not found\n"
            "Using default settings",
            file=sys.stderr,
        )
        return {}


def _spider_from_file(path: str):
    """Import a spider module from a file path and find its Spider:
    a module-level Spider INSTANCE (conventionally `SPIDER`), a
    `get_spider()` factory, or a Spider subclass (instantiated
    no-arg). The reference's runspider reads the file but then builds
    a BasicSpider purely from settings (main.rs:758-808) — actually
    honoring the file's spider definition is a documented improvement,
    with the settings fallback preserved by the callers."""
    import importlib.util

    from scrapy_rs_spark.api import Spider

    name = os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(f"_spider_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if isinstance(getattr(mod, "SPIDER", None), Spider):
        return mod.SPIDER
    get = getattr(mod, "get_spider", None)
    if callable(get):
        sp = get()
        if isinstance(sp, Spider):
            return sp
    for v in vars(mod).values():
        if isinstance(v, Spider):
            return v
    for v in vars(mod).values():
        if isinstance(v, type) and issubclass(v, Spider) and v is not Spider:
            return v()
    return None


def _save_items(engine, output: str, fmt: str) -> None:
    """--output: export the crawl's committed items to ONE file
    (reference CLI semantics: items.json next to the project;
    main.rs:723-726 left this as a TODO). Single-file is the CLI
    convenience contract — the write funnels through one task, so for
    cluster-scale exports use engine.items().write directly instead."""
    import shutil
    import tempfile

    items = engine.items()
    if fmt == "csv":
        items = items.withColumn("fields", F.to_json(F.col("fields")))
    tmp = tempfile.mkdtemp(prefix="crawl_out_")
    try:
        one = items.coalesce(1)
        d = os.path.join(tmp, "out")
        if fmt == "json":
            one.write.mode("overwrite").json(d)
            part = next(
                p for p in os.listdir(d)
                if p.startswith("part-") and p.endswith(".json")
            )
        elif fmt == "csv":
            one.write.mode("overwrite").option("header", True).csv(d)
            part = next(
                p for p in os.listdir(d)
                if p.startswith("part-") and p.endswith(".csv")
            )
        else:
            raise ValueError(f"unknown output format: {fmt}")
        shutil.move(os.path.join(d, part), output)
        print(f"Saved items to {output}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---- scaffolding commands (driver-side, no Spark session) ----

def cmd_startproject(args) -> int:
    """main.rs:173-328: project dir + settings.py + spiders/ +
    items.py/pipelines.py/middlewares.py stubs."""
    d = args.directory or args.name
    project_dir = os.path.join(d, args.name)
    print(f"Creating project '{args.name}' in directory '{project_dir}'")
    os.makedirs(os.path.join(project_dir, "spiders"), exist_ok=True)
    files = {
        "settings.py": _SETTINGS_TEMPLATE.format(name=args.name),
        os.path.join("spiders", "__init__.py"):
            "# makes the spiders directory a package\n",
        "items.py":
            "# Define your item models here (items are rows: url,\n"
            "# item_type, text, fields MAP<STRING,STRING>)\n",
        "pipelines.py":
            "# Define item pipelines here: DataFrame -> DataFrame\n"
            "# transforms, chained via operators/middleware.py\n",
        "middlewares.py":
            "# Define request/response middlewares here:\n"
            "# DataFrame -> DataFrame transforms\n",
    }
    for rel, content in files.items():
        with open(os.path.join(project_dir, rel), "w") as f:
            f.write(content)
    print(f"Project '{args.name}' created successfully")
    print(f"You can now cd into '{project_dir}' and create your spiders")
    return 0


def cmd_genspider(args) -> int:
    """main.rs:330-437: spiders/<name>.py from a template; errors when
    outside a project dir or the spider already exists."""
    if not os.path.isdir("spiders"):
        print(
            "Error: spiders directory not found. Make sure you are in"
            " a project directory.",
            file=sys.stderr,
        )
        return 1
    path = os.path.join("spiders", f"{args.name}.py")
    if os.path.exists(path):
        print(f"Error: spider '{args.name}' already exists", file=sys.stderr)
        return 1
    tmpl = {"basic": _SPIDER_BASIC, "custom": _SPIDER_CUSTOM}.get(
        args.template
    )
    if tmpl is None:
        print(
            f"Error: unknown template '{args.template}'", file=sys.stderr
        )
        return 1
    with open(path, "w") as f:
        f.write(tmpl.format(name=args.name, domain=args.domain))
    print(f"Spider '{args.name}' created successfully")
    print(f"You can now edit '{path}'")
    return 0


def cmd_list(args) -> int:
    """main.rs:467-508: *.py files under ./spiders."""
    _load_raw_settings(args.settings)
    if not os.path.isdir("spiders"):
        print(
            "Error: spiders directory not found. Make sure you are in"
            " a project directory.",
            file=sys.stderr,
        )
        return 1
    print("Available spiders:")
    found = False
    for fn in sorted(os.listdir("spiders")):
        stem, ext = os.path.splitext(fn)
        if ext == ".py" and stem != "__init__":
            print(f"  {stem}")
            found = True
    if not found:
        print("  No spiders found")
    return 0


def cmd_settings(args) -> int:
    """main.rs:729-793: get / set / list settings. Set writes back to
    the settings file (.py as KEY = literal lines, .json as JSON)."""
    path = args.settings_file or "settings.py"
    raw = _load_raw_settings(args.settings_file)
    if args.name is None:
        print("All settings:")
        for k in sorted(raw):
            print(f"  {k} = {json.dumps(raw[k], default=str)}")
        return 0
    if args.value is None:
        if args.name not in raw:
            print(
                f"Error getting setting: '{args.name}' not set",
                file=sys.stderr,
            )
            return 1
        print(f"{args.name} = {json.dumps(raw[args.name], default=str)}")
        return 0
    # set: parse the value like the reference (bool/null/int/float/str)
    v = args.value
    if v in ("True", "true"):
        val = True
    elif v in ("False", "false"):
        val = False
    elif v in ("None", "null"):
        val = None
    else:
        try:
            val = int(v)
        except ValueError:
            try:
                val = float(v)
            except ValueError:
                val = v
    print(f"Setting {args.name} = {v}")
    raw[args.name] = val
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        with open(path, "w") as f:
            json.dump(raw, f, indent=2, default=str)
            f.write("\n")
    elif ext == ".py":
        with open(path, "w") as f:
            f.write("# scrapy_rs_spark settings file (rewritten by"
                    " `settings` command)\n")
            for k in sorted(raw):
                f.write(f"{k} = {raw[k]!r}\n")
    else:
        print(
            f"Error saving settings: unsupported extension '{ext}'"
            " (use .py or .json)",
            file=sys.stderr,
        )
        return 1
    print("Setting saved successfully")
    return 0


def cmd_version(_args) -> int:
    """main.rs:795-798."""
    from scrapy_rs_spark import __version__

    print(f"scrapy_rs_spark version {__version__}")
    print("A PySpark-native web-crawl and corpus-curation engine")
    return 0


# ---- crawl / runspider (Spark session) ----

def _run_crawl_cmd(args, spider_file: str | None) -> int:
    from scrapy_rs_spark.api import Spider, run_crawl
    from scrapy_rs_spark.session import build_session
    from scrapy_rs_spark.settings import Settings

    raw = _load_raw_settings(args.settings)
    settings = Settings.from_dict(raw)

    spider = None
    if spider_file is not None:
        if not os.path.exists(spider_file):
            print(
                f"Error: spider file '{spider_file}' not found.",
                file=sys.stderr,
            )
            return 1
        print(f"Loading spider from file: {spider_file}")
        spider = _spider_from_file(spider_file)

    seeds = list(getattr(args, "seeds", []) or [])
    if getattr(args, "seeds_file", None):
        with open(args.seeds_file) as f:
            seeds += [ln.strip() for ln in f if ln.strip()]
    # reference CLI builds the spider from settings (main.rs:567-605)
    seeds += [u for u in raw.get("START_URLS", []) if u not in seeds]
    allowed = list(raw.get("ALLOWED_DOMAINS", []))
    if spider is not None:
        seeds += [u for u in spider.start_urls if u not in seeds]
        allowed = allowed or list(spider.allowed_domains)
    if not seeds and not getattr(args, "resume", False):
        print(
            "no seeds given (--seeds / --seeds-file / START_URLS /"
            " spider start_urls)",
            file=sys.stderr,
        )
        return 2

    name = getattr(args, "name", None) or (
        spider.name if spider is not None else "spider"
    )
    # --output needs the committed items, so an anonymous crawl gets a
    # temp store
    store = args.store
    tmp_store = None
    if args.output and not store:
        import tempfile

        tmp_store = tempfile.mkdtemp(prefix="crawl_store_")
        store = os.path.join(tmp_store, "store")

    spark = build_session(app_name=f"crawl:{name}", master=args.master)
    try:
        if getattr(args, "resume", False):
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
            stats.engine = engine
        else:
            if spider is None:
                spider = Spider(
                    name=name, start_urls=[], allowed_domains=allowed
                )
            spider.start_urls = seeds
            if allowed and not spider.allowed_domains:
                spider.allowed_domains = allowed
            stats = run_crawl(
                spark,
                spider,
                _pages_df(spark, args.pages),
                settings,
                store_path=store,
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
        if args.output:
            _save_items(stats.engine, args.output, args.format)
        return 0
    finally:
        spark.stop()
        if tmp_store is not None:
            import shutil

            shutil.rmtree(tmp_store, ignore_errors=True)


def cmd_crawl(args) -> int:
    spider_file = None
    if args.spider:
        # reference crawl <name>: resolve spiders/<name>.py in the
        # project dir (main.rs:440-465)
        spider_file = os.path.join("spiders", f"{args.spider}.py")
        if not os.path.exists(spider_file):
            print(
                f"Error: spider '{args.spider}' not found.",
                file=sys.stderr,
            )
            return 1
    return _run_crawl_cmd(args, spider_file)


def cmd_runspider(args) -> int:
    print(f"Running spider from file '{args.file}'")
    return _run_crawl_cmd(args, args.file)


def _add_crawl_args(p, with_resume: bool) -> None:
    p.add_argument("--pages", required=True, help="pages parquet path")
    p.add_argument("--seeds", nargs="*", default=[], help="seed URLs")
    p.add_argument("--seeds-file", help="file with one seed URL per line")
    p.add_argument(
        "--settings",
        help="settings file: .json/.toml/.py/.yaml, OR a dotted module"
        " path (e.g. mypkg.settings — the PySettings.from_module"
        " analogue; UPPER_CASE attributes become keys). Reference key"
        " names ok; START_URLS/ALLOWED_DOMAINS build the spider like"
        " the reference binary",
    )
    p.add_argument("--store", help="crawl store directory (resume-able)")
    if with_resume:
        p.add_argument(
            "--resume",
            action="store_true",
            help="continue a store that already has committed rounds",
        )
    p.add_argument(
        "-o", "--output", help="save crawled items to ONE file"
    )
    p.add_argument(
        "--format", default="json", choices=("json", "csv"),
        help="output file format",
    )
    p.add_argument("--master", default=None)
    p.add_argument("--max-rounds", type=int, default=1000)
    p.add_argument("--json", action="store_true", help="print stats as JSON")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="scrapy_rs_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run a crawl over a pages table")
    c.add_argument(
        "spider", nargs="?", default=None,
        help="optional spider name → spiders/<name>.py in the project",
    )
    c.add_argument("--name", default=None, help="crawl/app name")
    _add_crawl_args(c, with_resume=True)
    c.set_defaults(fn=cmd_crawl)

    r = sub.add_parser("runspider", help="run a spider from a file")
    r.add_argument("file", help="path to the spider .py file")
    _add_crawl_args(r, with_resume=False)
    r.set_defaults(fn=cmd_runspider, resume=False, name=None)

    s = sub.add_parser("startproject", help="create a new project")
    s.add_argument("name")
    s.add_argument("--directory", default=None)
    s.set_defaults(fn=cmd_startproject)

    g = sub.add_parser("genspider", help="generate a new spider")
    g.add_argument("name")
    g.add_argument("domain")
    g.add_argument("--template", default="basic")
    g.set_defaults(fn=cmd_genspider)

    ls = sub.add_parser("list", help="list spiders in ./spiders")
    ls.add_argument("--settings", default=None)
    ls.set_defaults(fn=cmd_list)

    st = sub.add_parser("settings", help="get or set a setting value")
    st.add_argument("name", nargs="?", default=None)
    st.add_argument("value", nargs="?", default=None)
    st.add_argument("--settings-file", default=None)
    st.set_defaults(fn=cmd_settings)

    v = sub.add_parser("version", help="show version information")
    v.set_defaults(fn=cmd_version)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
