"""S7 — export sink ≙ ``GET /api/get-data``.

The reference streams one ZIP of the per-host JSON array files in
``scraping_folder`` (/root/reference/handlers/scrape.go:30-70; files are
written by SavePageToFile, utils/file_utils.go:62-114, named
``sanitizeFileName(getBaseURL(page.URL)) + ".json"``, :76-77/:133-144 —
incl. the literal ``invalid_url``/``default`` fallbacks).  Here export =
a distributed per-file JSON write (file name computed executor-side by
the vectorized F6∘F7 kernel, one Spark task per file, rows in exact
fetch order) followed by driver-side packaging of the file parts into a
single ZIP artifact — packaging is metadata-scale work; the heavy
lifting (naming, grouping, ordering, serializing rows) stays executor-
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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import udfs

PAGE_FIELDS = ["title", "url", "content"]


def export_pages_df(pages: DataFrame, out_zip: str) -> str:
    """Write a ``scraped_data.zip``-shaped artifact from any DataFrame with
    columns (seed_idx, fetch_seq, title, url, content): one
    ``<sanitized>.json`` JSON array per base URL, records in fetch order.
    Returns ``out_zip``."""
    named = pages.select(
        udfs.export_name_udf(F.col("url")).alias("file_base"),
        "seed_idx", "fetch_seq", *PAGE_FIELDS,
    )
    tmpdir = tempfile.mkdtemp(prefix="grabspark-export-")
    (
        named.repartition("file_base")
        .sortWithinPartitions("file_base", "seed_idx", "fetch_seq")
        .write.mode("overwrite")
        .partitionBy("file_base")
        .json(tmpdir)
    )
    os.makedirs(os.path.dirname(os.path.abspath(out_zip)), exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for entry in sorted(os.listdir(tmpdir)):
            if not entry.startswith("file_base="):
                continue
            base = unquote(entry.split("=", 1)[1])
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
            zf.writestr(base + ".json", json.dumps(records, indent=4))
    return out_zip


def export_pages(eng, out_zip: str) -> str:
    """Export an engine run's fetched pages (models.PageData shape)."""
    return export_pages_df(
        eng.pages_df().select("seed_idx", "fetch_seq", *PAGE_FIELDS), out_zip
    )


def read_export_zip(spark: SparkSession, zip_path: str) -> DataFrame:
    """Read the ZIP artifact back as (file_name, rec_idx, title, url,
    content) — the gate-query inverse of :func:`export_pages_df`.  The
    artifact is metadata-scale (one JSON array per host), so reading it
    driver-side is fine."""
    rows = []
    with zipfile.ZipFile(zip_path) as zf:
        for name in sorted(zf.namelist()):
            for i, rec in enumerate(json.loads(zf.read(name))):
                rows.append(
                    (name, i, rec.get("title"), rec.get("url"), rec.get("content"))
                )
    return spark.createDataFrame(
        rows, "file_name string, rec_idx int, title string, url string, content string"
    )
