"""Property-based tests (hypothesis) for the URL kernel — the seen-set
identity function, so its invariants ARE crawl-membership invariants.

Pure-python properties (no Spark session needed — fast)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy_rs_spark.functions.url import (
    _FAST_HREF,
    _DOT_SEG,
    canonicalize,
    resolve,
)

_hosts = st.sampled_from(
    ["example.com", "EXAMPLE.com", "a-b.test", "xn--test.de", "h1.h2.org"]
)
_schemes = st.sampled_from(["http", "https", "HTTP", "HtTpS"])
_path_chars = st.text(
    alphabet="abcXYZ019-._~!$&'()*+,;=:@/%  #?", min_size=0, max_size=24
)
_ports = st.sampled_from(["", ":80", ":443", ":8080", ":1"])


@given(_schemes, _hosts, _ports, _path_chars)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(scheme, host, port, path):
    """canonicalize is a normal form: applying it twice = once."""
    raw = f"{scheme}://{host}{port}/{path}"
    c1 = canonicalize(raw)
    if c1 is not None:
        assert canonicalize(c1) == c1


@given(_schemes, _hosts, _path_chars)
@settings(max_examples=300, deadline=None)
def test_canonicalize_host_scheme_lowered(scheme, host, path):
    c = canonicalize(f"{scheme}://{host}/{path}")
    if c is not None:
        prefix = c.split("/")[2]
        assert prefix == prefix.lower()
        assert c.split(":")[0] == scheme.lower()
        assert "#" not in c  # fragments always dropped


@given(_path_chars)
@settings(max_examples=300, deadline=None)
def test_urljoin_fast_path_equals_exact(href):
    """The vectorized fast path (origin + href) must agree with the
    exact urljoin+canonicalize path whenever its guard admits the href
    — the same predicate urljoin_udf applies."""
    base = "http://mocksite.test/3"
    is_fast = (
        href.startswith("/")
        and _FAST_HREF.match(href) is not None
        and _DOT_SEG.search(href) is None
        and "//" not in href
    )
    exact = resolve(base, href)
    if is_fast:
        assert exact == "http://mocksite.test" + href, (href, exact)


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_canonicalize_never_raises(garbage):
    """Fail closed: arbitrary input → canonical URL or None, no crash."""
    out = canonicalize(garbage)
    assert out is None or isinstance(out, str)


@given(_hosts, _path_chars, _path_chars)
@settings(max_examples=200, deadline=None)
def test_resolve_never_raises(host, path, href):
    out = resolve(f"https://{host}/{path}", href)
    assert out is None or out.split("://")[0] in ("http", "https", "ftp", "ws", "wss")
