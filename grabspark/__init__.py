"""grabspark — a PySpark-native crawl frontier + fetch scheduler.

A brand-new engine (NOT a port) reproducing the crawl semantics of the
reference Go scraper (jordanoskidavid/go-grab): breadth-first same-host
crawling with a normalized URL-seen set, mark-before-fetch error policy,
FIFO ordering, and per-host page records — re-expressed as round-based
DataFrame jobs (Catalyst-optimized anti-joins, window ranks, Arrow UDFs)
over an Iceberg-shaped snapshot store of image+caption pages.

Reference semantics pinned in SURVEY.md §2 with file:line citations into
/root/reference (e.g. BFS loop functions/main_functions.go:34-76,
NormalizeURL utils/text_utils.go:10-22).
"""

__version__ = "0.1.0"
