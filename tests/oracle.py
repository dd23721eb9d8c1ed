"""Reference-semantics crawl simulator (golden-trace producer).

A pure-Python transliteration of the reference crawl loop, INDEPENDENT of
the grabspark engine code (its own URL parsing/normalization/cleanup), so
engine-vs-oracle equality is a meaningful cross-check.  Semantics
transliterated line-by-line from /root/reference:

* BFS FIFO pop/push            functions/main_functions.go:34-76
* mark-seen-BEFORE-fetch       functions/main_functions.go:50
* fetch uses the RAW url       functions/main_functions.go:57
* error => continue, no retry  functions/main_functions.go:57-62
* push RAW links, DOM order    functions/main_functions.go:65-72
* push-time check w/o insert   functions/main_functions.go:66-71
* per-seed fresh seen set      functions/main_functions.go:30-31,
                               handlers/crawl.go:47-50
* NormalizeURL                 utils/text_utils.go:10-22
* text cleanup order           functions/main_functions.go:107-109
* same-host filter             functions/main_functions.go:131-148

Go net/url parse-error emulation covers exactly the malformed shapes the
synthetic generator emits (grabspark/synth.py MALFORMED_LINKS).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit

_BAD_ESCAPE = re.compile(r"%(?![0-9A-Fa-f]{2})")
_HREF = re.compile(r'href="([^"]*)"')
_TITLE = re.compile(r"^[ \t]*Title:[ \t]*(.*?)[ \t]*$", re.MULTILINE)


class GoParseError(Exception):
    pass


def go_parse(url: str):
    """Emulate Go url.Parse outcomes for the generator's URL shapes."""
    if _BAD_ESCAPE.search(url):
        raise GoParseError("invalid URL escape")
    if url.startswith("://"):
        raise GoParseError("missing protocol scheme")
    if re.search(r"[\x00-\x1f\x7f]", url):
        raise GoParseError("invalid control character in URL")
    sp = urlsplit(url)
    if " " in sp.netloc:
        raise GoParseError("invalid character in host name")
    return sp


def go_hostname(netloc: str) -> str:
    """Go URL.Hostname(): strip userinfo + port, PRESERVE case (unlike
    Python's SplitResult.hostname, which lowercases)."""
    host = netloc.rsplit("@", 1)[-1]
    if host.startswith("["):
        return host.split("]", 1)[0].lstrip("[")
    return host.split(":", 1)[0]


def _unsplit(scheme: str, netloc: str, path: str, query: str, frag: str) -> str:
    out = f"{scheme}://{netloc}" if scheme or netloc else ""
    out += path
    if query:
        out += "?" + query
    if frag:
        out += "#" + frag
    return out


def normalize_url(url: str) -> str:
    """utils/text_utils.go:10-22 — trailing-slash strip of path only."""
    try:
        sp = go_parse(url)
    except GoParseError:
        return url
    return _unsplit(sp.scheme, sp.netloc, sp.path.rstrip("/"), sp.query, sp.fragment)


def fetch_target(url: str) -> str | None:
    """Browser request target for a raw URL: fragment dropped, trailing
    slashes collapse onto the canonical page id; None if unfetchable."""
    try:
        sp = go_parse(url)
    except GoParseError:
        return None
    if not sp.scheme or not sp.netloc:
        return None
    return _unsplit(sp.scheme, sp.netloc, sp.path.rstrip("/"), sp.query, "")


def remove_blank_lines(text: str) -> str:  # utils/text_utils.go:24-42
    out = []
    for line in text.split("\n"):
        t = line.strip()
        if t:
            out.append(t)
    return "\n".join(out)


def remove_extra_spaces(text: str) -> str:  # utils/text_utils.go:44-49
    return " ".join(text.split())


def clean_content(text: str) -> str:  # main_functions.go:107-109
    return remove_extra_spaces(remove_blank_lines(text.strip()))


@dataclass
class OracleResult:
    # (seed_idx, fetch_seq, url, url_canon, host, ok)
    trace: list[tuple] = field(default_factory=list)
    # {(seed_idx, url_canon)}
    seen: set = field(default_factory=set)
    # (seed_idx, fetch_seq, url, title, content)
    pages: list[tuple] = field(default_factory=list)
    # BFS depth per trace row — the engine's ``round`` column (seeds are
    # depth 0; a link found at depth d is fetched at depth d+1).  FIFO pop
    # order IS level order, so depth is well-defined per pop.
    rounds: list[int] = field(default_factory=list)


def scrape_and_extract(store_by_id: dict, page_url: str):
    """ScrapeAndExtractLinks (main_functions.go:82-151): returns
    (ok, title, content, internal_links)."""
    tgt = fetch_target(page_url)
    row = store_by_id.get(tgt) if tgt is not None else None
    if row is None:
        return False, None, None, []
    caption = row.caption
    m = _TITLE.search(caption)
    title = m.group(1) if m else ""
    content = clean_content(caption)
    links = _HREF.findall(caption)
    try:
        base = go_parse(page_url)
    except GoParseError:
        return False, None, None, []
    base_host = go_hostname(base.netloc)
    internal = []
    for link in links:
        try:
            pl = go_parse(link)
        except GoParseError:
            continue
        if go_hostname(pl.netloc) == base_host:
            internal.append(link)
    return True, title, content, internal


def crawl(store_by_id: dict, seeds: list[str]) -> OracleResult:
    """handlers/crawl.go:47-50 seed loop + functions/main_functions.go:28-76."""
    res = OracleResult()
    for seed_idx, seed in enumerate(seeds):
        to_visit = [(seed, 0)]
        visited: set[str] = set()
        seq = 0
        while to_visit:
            url, depth = to_visit.pop(0)
            canon = normalize_url(url)
            if canon in visited:
                continue
            visited.add(canon)  # mark BEFORE fetch (:50)
            ok, title, content, links = scrape_and_extract(store_by_id, url)
            try:
                host = go_hostname(go_parse(url).netloc)
            except GoParseError:
                host = ""
            res.trace.append((seed_idx, seq, url, canon, host, ok))
            res.rounds.append(depth)
            if ok:
                res.pages.append((seed_idx, seq, url, title, content))
                for link in links:
                    if normalize_url(link) not in visited:
                        to_visit.append((link, depth + 1))  # raw link, DOM order (:69)
            seq += 1
        res.seen |= {(seed_idx, c) for c in visited}
    return res
