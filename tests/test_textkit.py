"""F2/F3/F4 text cleanup — exact order and staged-vs-composed equivalence
(/root/reference/functions/main_functions.go:107-109,
 utils/text_utils.go:24-49)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import tests.oracle as oracle
from grabspark import textkit


def test_remove_blank_lines_golden():
    assert textkit.remove_blank_lines("a\n\n  \nb\n") == "a\nb"
    assert textkit.remove_blank_lines("  x  \n\t\n y ") == "x\ny"
    assert textkit.remove_blank_lines("") == ""


def test_remove_extra_spaces_golden():
    assert textkit.remove_extra_spaces("a   b\tc\nd") == "a b c d"


def test_clean_order_matters_like_reference():
    raw = "  Title: T  \n\n   \t\n\tbody  text  \n   more\t\n\n  "
    assert textkit.clean_text(raw) == "Title: T body text more"
    assert textkit.clean_text(raw) == oracle.clean_content(raw)


TEXTS = st.lists(
    st.sampled_from(list("ab c\t\n\r") + ["  ", "\n\n", " \t "]), max_size=60
).map("".join)


@given(TEXTS)
@settings(max_examples=300, deadline=None)
def test_clean_matches_oracle(t):
    assert textkit.clean_text(t) == oracle.clean_content(t)


@given(st.lists(TEXTS, min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_vectorized_matches_scalar(ts):
    s = pd.Series(ts, dtype="object")
    assert list(textkit.clean_text_s(s)) == [textkit.clean_text(t) for t in ts]
    assert list(textkit.remove_blank_lines_s(s)) == [
        textkit.remove_blank_lines(t) for t in ts
    ]


def test_extract_links_order():
    cap = 'x href="http://a/1" y href="bad url" z href="http://a/2"'
    assert textkit.extract_links(cap) == ["http://a/1", "bad url", "http://a/2"]
    s = pd.Series([cap])
    assert list(textkit.extract_links_s(s))[0] == ["http://a/1", "bad url", "http://a/2"]


def test_extract_title():
    cap = "  Title: My Page  \nbody"
    assert textkit.extract_title(cap) == "My Page"
    assert list(textkit.extract_title_s(pd.Series([cap, "no title"]))) == ["My Page", ""]
