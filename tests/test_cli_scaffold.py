"""CLI scaffolding parity (reference src/main.rs:30-119): startproject,
genspider, list, settings get/set/list, version, runspider, and
`crawl <name>` resolving spiders/<name>.py — plus the --output item
export the reference CLI documents but never implemented
(main.rs:723-726)."""

import json
import subprocess
import sys

from scrapy_rs_spark.__main__ import main
from scrapy_rs_spark.settings import Settings


def test_startproject_scaffold(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    assert main(["startproject", "mybot"]) == 0
    root = tmp_path / "mybot" / "mybot"
    for rel in (
        "settings.py",
        "items.py",
        "pipelines.py",
        "middlewares.py",
        "spiders/__init__.py",
    ):
        assert (root / rel).exists(), rel
    # the generated settings.py round-trips through the real loader
    raw = Settings.raw_from_file(str(root / "settings.py"))
    assert raw["BOT_NAME"] == "mybot"
    assert raw["START_URLS"] == []
    s = Settings.from_dict(raw)
    assert s.max_retries == 3
    assert s.respect_robots_txt is True
    # --directory overrides the parent dir (main.rs:174)
    assert main(["startproject", "other", "--directory", "dd"]) == 0
    assert (tmp_path / "dd" / "other" / "settings.py").exists()


def test_genspider_templates_and_list(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    # outside a project dir → error (main.rs:332-336)
    assert main(["genspider", "docs", "example.com"]) == 1
    (tmp_path / "spiders").mkdir()
    assert main(["genspider", "docs", "example.com"]) == 0
    # duplicate → error (main.rs:343-346)
    assert main(["genspider", "docs", "example.com"]) == 1
    # unknown template → error (main.rs:428-431)
    assert main(["genspider", "x", "example.com", "--template", "zzz"]) == 1
    assert main(
        ["genspider", "deep", "example.org", "--template", "custom"]
    ) == 0
    # generated spiders import and expose a Spider with the domain
    import importlib.util

    from scrapy_rs_spark.api import Spider

    for name, domain in (("docs", "example.com"), ("deep", "example.org")):
        spec = importlib.util.spec_from_file_location(
            f"gen_{name}", str(tmp_path / "spiders" / f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert isinstance(mod.SPIDER, Spider)
        assert mod.SPIDER.name == name
        assert mod.SPIDER.allowed_domains == [domain]
    # custom template wires parse hooks
    assert mod.SPIDER.parse_text is not None
    assert mod.SPIDER.parse_fields is not None

    capsys.readouterr()
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "docs" in out and "deep" in out and "x" not in out


def test_list_outside_project(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["list"]) == 1


def test_settings_command_get_set_list(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    f = tmp_path / "settings.py"
    f.write_text("MAX_DEPTH = 3\nUSER_AGENT = 'ua/1'\n")
    # get
    assert main(["settings", "MAX_DEPTH", "--settings-file", str(f)]) == 0
    assert "MAX_DEPTH = 3" in capsys.readouterr().out
    # get missing → error (main.rs:779-782)
    assert main(["settings", "NOPE", "--settings-file", str(f)]) == 1
    # set parses types like the reference (main.rs:739-755) and saves
    assert main(
        ["settings", "MAX_DEPTH", "7", "--settings-file", str(f)]
    ) == 0
    assert main(
        ["settings", "RESPECT_ROBOTS_TXT", "false", "--settings-file",
         str(f)]
    ) == 0
    raw = Settings.raw_from_file(str(f))
    assert raw["MAX_DEPTH"] == 7
    assert raw["RESPECT_ROBOTS_TXT"] is False
    assert raw["USER_AGENT"] == "ua/1"  # untouched keys survive rewrite
    # list-all
    capsys.readouterr()
    assert main(["settings", "--settings-file", str(f)]) == 0
    out = capsys.readouterr().out
    assert "MAX_DEPTH = 7" in out and "USER_AGENT" in out
    # json settings file round-trip
    j = tmp_path / "s.json"
    j.write_text("{}")
    assert main(["settings", "PAGE_LIMIT", "10", "--settings-file",
                 str(j)]) == 0
    assert json.loads(j.read_text())["PAGE_LIMIT"] == 10


def test_version(capsys):
    assert main(["version"]) == 0
    out = capsys.readouterr().out
    import scrapy_rs_spark

    assert scrapy_rs_spark.__version__ in out


def test_request_timeout_reference_unit():
    """Reference REQUEST_TIMEOUT is SECONDS (config_adapters.rs:43/76,
    default 30 s); the native request_timeout_ms key passes through."""
    assert Settings.from_dict({"REQUEST_TIMEOUT": 30}).request_timeout_ms \
        == 30_000
    assert Settings.from_dict(
        {"request_timeout_ms": 1500}
    ).request_timeout_ms == 1500


def test_runspider_e2e_with_output(spark, tmp_path):
    """`runspider <file> --pages ... --output items.json`: the spider
    DEFINITION in the file drives the crawl (improvement over the
    reference, which reads the file then rebuilds from settings,
    main.rs:758-808), and --output writes ONE json-lines file of the
    committed items (reference TODO, main.rs:723-726)."""
    from scrapy_rs_spark.sources.mocksite import mock_site_pages

    pages_path = str(tmp_path / "pages")
    mock_site_pages(spark, 20, 5, partitions=2).write.parquet(pages_path)
    spider_file = tmp_path / "myspider.py"
    spider_file.write_text(
        "from scrapy_rs_spark import Spider\n"
        "SPIDER = Spider(name='mysp',"
        " start_urls=['http://mocksite.test/0'])\n"
    )
    out_file = tmp_path / "items.json"
    out = subprocess.run(
        [
            sys.executable, "-m", "scrapy_rs_spark", "runspider",
            str(spider_file),
            "--pages", pages_path,
            "--max-rounds", "2",
            "--output", str(out_file),
            "--master", "local[4]",
            "--json",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    # 2 rounds from seed 0 over (i+k+1)%20, 5 links: {0} ∪ {1..5}
    assert stats["requests"] == 6
    assert stats["items"] == 6
    rows = [
        json.loads(ln)
        for ln in out_file.read_text().splitlines()
        if ln.strip()
    ]
    assert len(rows) == 6
    assert {r["url"] for r in rows} == {
        f"http://mocksite.test/{i}" for i in range(6)
    }


def test_crawl_positional_spider_name(tmp_path, monkeypatch, capsys):
    """`crawl <name>` resolves spiders/<name>.py (main.rs:440-465);
    missing spider errors without starting Spark."""
    monkeypatch.chdir(tmp_path)
    assert main(["crawl", "ghost", "--pages", "/x"]) == 1


def test_module_level_scaffold_functions(tmp_path, monkeypatch):
    """Reference python wrapper parity
    (python/src/scrapy_rs/__init__.py:275-302): startproject /
    genspider / list_spiders / version as module functions."""
    import scrapy_rs_spark as srs

    monkeypatch.chdir(tmp_path)
    assert srs.startproject("proj") == 0
    assert (tmp_path / "proj" / "proj" / "settings.py").exists()
    assert srs.list_spiders() == []  # not in a project dir
    monkeypatch.chdir(tmp_path / "proj" / "proj")
    assert srs.genspider("alpha", "example.com") == 0
    assert srs.genspider("beta", "example.org", template="custom") == 0
    assert srs.list_spiders() == ["alpha", "beta"]
    assert srs.__version__ in srs.version()
