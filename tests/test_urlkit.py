"""Unit tests for X2 canonicalization (REF-EXACT F1 + NR-EXT canon_full).

Golden cases pin the exact NormalizeURL behavior
(/root/reference/utils/text_utils.go:10-22); property tests check the
scalar and pandas-vectorized forms agree, and that grabspark.urlkit agrees
with the independent oracle transliteration (tests/oracle.py) on every URL
shape the generator emits.
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import tests.oracle as oracle
from grabspark import urlkit
from grabspark.synth import MALFORMED_LINKS

GOLDEN_CANON_REF = [
    # trailing slash stripped (all of them), text_utils.go:18
    ("http://a.test/p/", "http://a.test/p"),
    ("http://a.test/p///", "http://a.test/p"),
    ("http://a.test/", "http://a.test"),
    ("http://a.test", "http://a.test"),
    # fragment + query PRESERVED (only the path is touched)
    ("http://a.test/p#frag", "http://a.test/p#frag"),
    ("http://a.test/p/#frag", "http://a.test/p#frag"),
    ("http://a.test/p?b=2&a=1", "http://a.test/p?b=2&a=1"),
    ("http://a.test/p/?b=2&a=1", "http://a.test/p?b=2&a=1"),
    # case/port preserved
    ("HTTP://A.test:8080/P/", "HTTP://A.test:8080/P"),
    # parse errors -> input unchanged (text_utils.go:13-15)
    ("http://bad host/x", "http://bad host/x"),
    ("http://%zz-escape/x", "http://%zz-escape/x"),
    ("://nohost/p", "://nohost/p"),
]

GOLDEN_CANON_FULL = [
    ("HTTP://A.test:8080/P/", "http://A.test:8080/P".lower()[:0] + "http://a.test/P"),
    ("http://a.test/p?b=2&a=1#f", "http://a.test/p?a=1&b=2"),
    ("http://a.test/p/", "http://a.test/p"),
    ("notaurl", "notaurl"),
]


@pytest.mark.parametrize("raw,expect", GOLDEN_CANON_REF)
def test_canon_ref_golden(raw, expect):
    assert urlkit.canon_ref(raw) == expect


def test_canon_ref_scheme_case_preserved():
    # Go lowercases scheme at Parse; our subset generator emits lowercase
    # schemes only, so urlkit preserves what it is given.
    assert urlkit.canon_ref("http://a.test/x/") == "http://a.test/x"


@pytest.mark.parametrize("raw,expect", GOLDEN_CANON_FULL)
def test_canon_full_golden(raw, expect):
    assert urlkit.canon_full(raw) == expect


def test_host_of():
    assert urlkit.host_of("http://Host0.test:81/p") == "Host0.test"
    assert urlkit.host_of("http://u:p@h.test/p") == "h.test"
    assert urlkit.host_of("notaurl") is None
    for m in MALFORMED_LINKS:
        assert urlkit.host_of(m) is None


def test_fetch_key():
    assert urlkit.fetch_key("http://a.test/p/#frag") == "http://a.test/p"
    assert urlkit.fetch_key("http://a.test/p?x=1#f") == "http://a.test/p?x=1"


URLS = st.one_of(
    st.sampled_from([m for m in MALFORMED_LINKS] + ["", "http://h.test"]),
    st.builds(
        lambda host, path, slashes, frag, q: f"http://{host}/{path}" + "/" * slashes + q + frag,
        host=st.sampled_from(["host0.test", "HOST1.test", "h.test:8080"]),
        path=st.sampled_from(["p0", "p1/sub", "q0", ""]),
        slashes=st.integers(0, 3),
        frag=st.sampled_from(["", "#f", "#sec2"]),
        q=st.sampled_from(["", "?a=1", "?b=2&a=1"]),
    ),
)


@given(st.lists(URLS, min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_vectorized_matches_scalar(urls):
    s = pd.Series(urls, dtype="object")
    assert list(urlkit.canon_ref_s(s)) == [urlkit.canon_ref(u) for u in urls]
    assert list(urlkit.canon_full_s(s)) == [urlkit.canon_full(u) for u in urls]
    assert list(urlkit.fetch_key_s(s)) == [urlkit.fetch_key(u) for u in urls]
    got_hosts = [None if pd.isna(h) else h for h in urlkit.host_of_s(s)]
    assert got_hosts == [urlkit.host_of(u) for u in urls]


@given(URLS)
@settings(max_examples=300, deadline=None)
def test_engine_matches_oracle_transliteration(url):
    """urlkit (engine) vs tests/oracle.py (independent Go transliteration)."""
    assert urlkit.canon_ref(url) == oracle.normalize_url(url)
    tgt = oracle.fetch_target(url)
    if tgt is not None:
        assert urlkit.fetch_key(url) == tgt
    try:
        sp = oracle.go_parse(url)
        ohost = oracle.go_hostname(sp.netloc) or None
        if not sp.scheme:
            ohost = None  # relative: host-less in both worlds
    except oracle.GoParseError:
        ohost = None
    assert urlkit.host_of(url) == ohost


def test_canon_idempotent():
    for raw, _ in GOLDEN_CANON_REF:
        c = urlkit.canon_ref(raw)
        assert urlkit.canon_ref(c) == c
        f = urlkit.canon_full(raw)
        assert urlkit.canon_full(f) == f
