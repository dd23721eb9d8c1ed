"""S7 — export sink ≙ ``GET /api/get-data``.

The reference streams one ZIP of the per-host JSON array files in
``scraping_folder`` (/root/reference/handlers/scrape.go:30-70; files are
written by SavePageToFile, utils/file_utils.go:62-114, named by
sanitizeFileName, :133-144).  Here the page store is the engine's trace
table, so export = a distributed per-host JSON write (one Spark task per
host, rows in exact fetch order) followed by driver-side packaging of the
host files into a single ZIP artifact — packaging is metadata-scale work;
the heavy lifting (grouping, ordering, serializing rows) stays executor-
side.  Record shape matches PageData (models/page_data.go:3-7:
title/url/content), serialized as an indented JSON array exactly like the
reference sink (utils/file_utils.go:102).
"""

from __future__ import annotations

import json
import os
import tempfile
import zipfile
from urllib.parse import unquote

from . import urlkit

PAGE_FIELDS = ["title", "url", "content"]


def export_pages(eng, out_zip: str) -> str:
    """Write a ``scraped_data.zip``-shaped artifact: one ``<host>.json``
    JSON array per host, records in fetch order.  Returns ``out_zip``."""
    pages = eng.pages_df().select(
        "host", "seed_idx", "fetch_seq", *PAGE_FIELDS
    )
    tmpdir = tempfile.mkdtemp(prefix="grabspark-export-")
    (
        pages.repartition("host")
        .sortWithinPartitions("host", "seed_idx", "fetch_seq")
        .write.mode("overwrite")
        .partitionBy("host")
        .json(tmpdir)
    )
    os.makedirs(os.path.dirname(os.path.abspath(out_zip)), exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for entry in sorted(os.listdir(tmpdir)):
            if not entry.startswith("host="):
                continue
            host = unquote(entry.split("=", 1)[1])
            records = []
            hostdir = os.path.join(tmpdir, entry)
            for part in sorted(os.listdir(hostdir)):
                if not part.endswith(".json"):
                    continue
                with open(os.path.join(hostdir, part)) as f:
                    for line in f:
                        if line.strip():
                            records.append(json.loads(line))
            # the dynamic-partition writer sorts rows by partition value
            # only (unstable) — restore exact fetch order from the keys
            records.sort(key=lambda r: (r["seed_idx"], r["fetch_seq"]))
            records = [{k: r.get(k) for k in PAGE_FIELDS} for r in records]
            # F7 filename semantics incl. the literal fallbacks
            fname = urlkit.sanitize_file_name(f"http://{host}/") + ".json"
            zf.writestr(fname, json.dumps(records, indent=4))
    return out_zip
