"""Text cleanup (REF-EXACT F2/F3/F4) + title/link extraction helpers.

The reference cleans fetched body text in this exact order
(/root/reference/functions/main_functions.go:107-109):

    1. strings.TrimSpace            (F4)
    2. utils.RemoveBlankLines       (F2, utils/text_utils.go:24-42)
    3. utils.RemoveExtraSpaces      (F3, utils/text_utils.go:44-49)

F3 splits on ALL whitespace (``strings.Fields``) and joins with single
spaces, so the composed pipeline is equivalent to ``" ".join(text.split())``
— but the individual stages are kept as distinct operators for parity and
are individually tested.

Link extraction mirrors the reference's DOM query
(functions/main_functions.go:124-126: ``querySelectorAll('a[href]')`` in
DOM order): our page store embeds anchors in the caption as
``href="<url>"`` markers; extraction is an ordered regex findall.
Title extraction mirrors ``chromedp.Title`` (:98): the store embeds the
title as a ``Title: ...`` first line.
"""

from __future__ import annotations

import re

import pandas as pd

_HREF_RE = re.compile(r'href="([^"]*)"')
_TITLE_RE = re.compile(r"^[ \t]*Title:[ \t]*(.*?)[ \t]*$", re.MULTILINE)
_WS_RUN_RE = re.compile(r"\s+")


def remove_blank_lines(text: str) -> str:
    """F2: split on \\n, trim each line, drop empties, join with \\n."""
    return "\n".join(t for t in (line.strip() for line in text.split("\n")) if t)


def remove_extra_spaces(text: str) -> str:
    """F3: strings.Fields + single-space join (collapses all whitespace)."""
    return " ".join(text.split())


def clean_text(text: str) -> str:
    """F4 → F2 → F3 in reference order."""
    return remove_extra_spaces(remove_blank_lines(text.strip()))


def extract_links(caption: str) -> list[str]:
    """Ordered href occurrences (DOM order ≙ text order)."""
    return _HREF_RE.findall(caption)


def extract_title(caption: str) -> str:
    m = _TITLE_RE.search(caption)
    return m.group(1) if m else ""


# ---------------------------------------------------------------------------
# pandas-vectorized forms
# ---------------------------------------------------------------------------

def clean_text_s(s: pd.Series) -> pd.Series:
    """Vectorized F4→F2→F3 (whitespace-run collapse + strip; equivalence
    with the staged pipeline is property-tested in tests/test_textkit.py)."""
    s = s.astype("string").fillna("")
    return s.str.replace(_WS_RUN_RE, " ", regex=True).str.strip()


def remove_blank_lines_s(s: pd.Series) -> pd.Series:
    s = s.astype("string").fillna("")
    # trim around newlines, collapse newline runs, strip outer newlines
    s = s.str.replace(r"[ \t\r\f\v]*\n[ \t\r\f\v]*", "\n", regex=True)
    s = s.str.replace(r"\n+", "\n", regex=True)
    return s.str.strip()


def extract_links_s(s: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] of ordered href matches."""
    return s.astype("string").fillna("").str.findall(_HREF_RE)


def extract_title_s(s: pd.Series) -> pd.Series:
    return s.astype("string").fillna("").str.extract(_TITLE_RE, expand=False).fillna("")
