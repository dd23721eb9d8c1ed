"""Deterministic synthetic page store + seed lists (FIXTURES.md §1-2).

Generates the crawlable web as an image+caption page table with columns
exactly matching BASELINE.json input_hint:

    (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
     caption:string, phash:int64)

``image_id`` is the canonical page URL and the fetch-lookup key.  The
caption embeds the page title (``Title: ...`` first line), noisy
whitespace (exercising the F2/F3/F4 cleanup,
/root/reference/utils/text_utils.go:24-49), and outgoing links as
``href="..."`` markers in DOM order
(/root/reference/functions/main_functions.go:124-126).

Link surface forms exercise every REF-EXACT branch:
  * trailing-slash variants  -> collapse under canon_ref (text_utils.go:18)
  * fragment variants        -> DISTINCT seen keys (fragment preserved by
                                NormalizeURL), same fetch target
  * host-case variants       -> dropped by the case-sensitive same-host
                                filter (main_functions.go:145)
  * cross-host links         -> dropped by the same-host filter
  * malformed links          -> silently skipped (main_functions.go:141-144)
  * missing pages            -> fetch error: marked seen, never retried,
                                contribute no links (main_functions.go:50,57-62)

Everything is a pure function of ``StoreSpec`` (seeded PRNG, no wall
clock, no network).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from . import imaging

# Malformed link strings whose accept/reject outcome is identical between
# Go net/url + same-host filtering and grabspark.urlkit (see urlkit module
# docstring): each is either a Go parse error or parses host-less, and in
# both worlds the link is skipped.
MALFORMED_LINKS = [
    "http://bad host/x",      # space in host: Go parse error
    "http://%zz-escape/x",    # invalid percent escape: Go parse error
    "notaurl",                # relative: host "" -> same-host filter drops
    "://nohost/p",            # missing scheme: Go parse error
]

_VOCAB = (
    "grab spark crawl frontier page link fetch image caption pixel host "
    "queue seen bloom robots delay round batch shuffle join window rank "
    "order filter title body text data store record"
).split()


@dataclass(frozen=True)
class StoreSpec:
    n_hosts: int = 3
    pages_per_host: int = 12
    out_degree: int = 4
    p_cross: float = 0.15       # cross-host link (filtered out)
    p_missing: float = 0.08     # link to absent page (fetch failure)
    p_malformed: float = 0.06   # unparsable link string (skipped)
    p_slash: float = 0.20       # trailing-slash surface variant
    p_frag: float = 0.10        # #fragment surface variant (distinct seen key)
    p_case: float = 0.05        # HOST-case variant (filtered out)
    p_dup: float = 0.15         # duplicate link within the same page
    query_pages: int = 2        # per-host pages whose canonical id has a query
    min_wh: int = 8
    max_wh: int = 24
    seed: int = 42

    def host(self, i: int) -> str:
        return f"host{i}.test"

    def page_ids(self, host_idx: int) -> list[str]:
        h = self.host(host_idx)
        ids = [f"http://{h}/p{j}" for j in range(self.pages_per_host)]
        for k in range(self.query_pages):
            # unsorted query order on purpose (canon_full sorts, canon_ref must not)
            ids.append(f"http://{h}/q{k}?b={k + 1}&a={k}")
        return ids


@dataclass
class SynthStore:
    spec: StoreSpec
    pdf: pd.DataFrame
    by_id: dict = field(default_factory=dict)

    def __post_init__(self):
        self.by_id = {r.image_id: r for r in self.pdf.itertuples(index=False)}


def _surface_variant(rng: np.random.Generator, target: str, spec: StoreSpec) -> str:
    """Apply a surface variant to a canonical target id."""
    u = rng.random()
    if u < spec.p_slash and "?" not in target:
        return target + "/" * int(rng.integers(1, 3))
    if u < spec.p_slash + spec.p_frag:
        return target + f"#sec{int(rng.integers(0, 5))}"
    if u < spec.p_slash + spec.p_frag + spec.p_case:
        scheme, rest = target.split("://", 1)
        host, _, tail = rest.partition("/")
        return f"{scheme}://{host.upper()}/{tail}"
    return target


def build_store(spec: StoreSpec) -> SynthStore:
    rng = np.random.default_rng(spec.seed)
    rows = []
    all_ids = {i: spec.page_ids(i) for i in range(spec.n_hosts)}
    for hi in range(spec.n_hosts):
        ids = all_ids[hi]
        n = len(ids)
        for j, pid in enumerate(ids):
            links: list[str] = []
            # ring link keeps each host connected so BFS traverses everything
            links.append(_surface_variant(rng, ids[(j + 1) % n], spec))
            for _ in range(spec.out_degree - 1):
                u = rng.random()
                if u < spec.p_malformed:
                    links.append(MALFORMED_LINKS[int(rng.integers(0, len(MALFORMED_LINKS)))])
                elif u < spec.p_malformed + spec.p_missing:
                    links.append(f"http://{spec.host(hi)}/missing{int(rng.integers(0, 6))}")
                elif u < spec.p_malformed + spec.p_missing + spec.p_cross:
                    other = int(rng.integers(0, spec.n_hosts))
                    tgt = all_ids[other][int(rng.integers(0, len(all_ids[other])))]
                    links.append(_surface_variant(rng, tgt, spec))
                else:
                    tgt = ids[int(rng.integers(0, n))]
                    v = _surface_variant(rng, tgt, spec)
                    links.append(v)
                    if rng.random() < spec.p_dup:
                        links.append(v)  # exact duplicate within the page
            caption = _make_caption(rng, pid, links)
            w = int(rng.integers(spec.min_wh, spec.max_wh + 1))
            h = int(rng.integers(spec.min_wh, spec.max_wh + 1))
            fmt = "raw" if (j % 2 == 0) else "qraw"
            px = imaging.pixels_from_id(pid, w, h)
            rows.append(
                {
                    "image_id": pid,
                    "bytes": imaging.encode_image(px, fmt),
                    "w": w,
                    "h": h,
                    "fmt": fmt,
                    "caption": caption,
                    "phash": imaging.phash64(imaging.decode_image(imaging.encode_image(px, fmt), w, h, fmt)),
                }
            )
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"])
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return SynthStore(spec=spec, pdf=pdf)


def _make_caption(rng: np.random.Generator, pid: str, links: list[str]) -> str:
    title = f"Page {pid.rsplit('/', 1)[-1]} of {pid.split('://', 1)[1].split('/', 1)[0]}"
    words = [ _VOCAB[int(k)] for k in rng.integers(0, len(_VOCAB), size=18) ]
    # interleave hrefs into the body in order
    body_parts = []
    li = 0
    for i, wrd in enumerate(words):
        body_parts.append(wrd)
        if li < len(links) and i % 3 == 2:
            body_parts.append(f'href="{links[li]}"')
            li += 1
    while li < len(links):
        body_parts.append(f'href="{links[li]}"')
        li += 1
    # split at a token boundary — never through an href marker (a cut
    # inside a marker would fabricate whitespace-bearing URLs, which are
    # outside the generator's vocabulary; see urlkit module docstring)
    half = len(body_parts) // 2
    body_a = " ".join(body_parts[:half])
    body_b = " ".join(body_parts[half:])
    # noisy whitespace: tabs, double spaces, blank lines, trailing spaces
    return (
        f"  Title: {title}  \n"
        f"\n   \t\n"
        f"\t{body_a}  \n"
        f"   {body_b}\t\n\n  "
    )


ARROW_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def write_store_parquet(store: SynthStore, path: str) -> None:
    import pyarrow.parquet as pq

    table = pa.Table.from_pandas(store.pdf, schema=ARROW_SCHEMA, preserve_index=False)
    pq.write_table(table, path)


def default_seeds(spec: StoreSpec) -> list[str]:
    """Raw seed URLs (models/url_data.go:3-5): variants + failure cases.

    Seeds are crawled sequentially with a FRESH seen set each
    (handlers/crawl.go:47-50, functions/main_functions.go:30-31), so the
    duplicate seed re-crawls host0 fully.
    """
    seeds = [
        f"http://{spec.host(0)}/p0",
        f"http://{spec.host(1)}/p0///",        # trailing-slash variant
        f"http://{spec.host(0)}/p0",            # duplicate seed: full re-crawl
        f"http://{spec.host(0)}/missing99",     # fetch failure seed
    ]
    if spec.n_hosts > 2:
        seeds.insert(2, f"http://{spec.host(2)}/p1#frag")  # fragment seed
    return seeds
