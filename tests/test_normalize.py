"""Normalization kernels (M6-M9). Table-driven, mirroring the
reference's tests/test_normalize.py coverage."""

import pytest

from neurostore_text_extraction_ray.functions.normalize import (
    detect_abbreviations,
    find_and_remove_definitions,
    normalize_string,
    resolve_abbreviations,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("", None),
        ("   ", None),
        ("None", None),
        ("none", None),
        ("NAN", None),
        ("N/A", None),
        ("n/a", None),
        ("NULL", None),
        ("null", None),
        ("HELLO", "Hello"),
        ("  hello world  ", "Hello World"),
        ("don’t", "Don't"),
        ("major depressive disorder", "Major Depressive Disorder"),
    ],
)
def test_normalize_string(raw, expected):
    assert normalize_string(raw) == expected


def test_normalize_none_passthrough():
    assert normalize_string(None) is None


ABBR_TEXT = (
    "Magnetic resonance imaging (MRI) revealed lesions. "
    "The electroencephalogram (EEG) was normal. "
    "Repeated magnetic resonance imaging (MRI) again."
)


def test_detect_abbreviations():
    abbrevs = detect_abbreviations(ABBR_TEXT)
    shorts = [a["short_text"] for a in abbrevs]
    assert "MRI" in shorts and "EEG" in shorts
    mri = next(a for a in abbrevs if a["short_text"] == "MRI")
    assert mri["long_text"] == "Magnetic resonance imaging"
    # offsets point at the short form inside parens
    assert ABBR_TEXT[mri["short_start"] : mri["short_end"]] == "MRI"
    # first occurrence only, no duplicates
    assert shorts.count("MRI") == 1


def test_detect_abbreviations_no_match():
    assert detect_abbreviations("No parens here at all.") == []
    assert detect_abbreviations("Unrelated words (XYZQ) here.") == []


def test_resolve_abbreviations():
    abbrevs = detect_abbreviations(ABBR_TEXT)
    out = resolve_abbreviations("The MRI and EEG results.", abbrevs)
    assert out == "The Magnetic resonance imaging and electroencephalogram results."


def test_resolve_abbreviations_empty():
    assert resolve_abbreviations(None, []) is None
    assert resolve_abbreviations("text", []) == "text"
    assert resolve_abbreviations("", [{"short_text": "A", "long_text": "B"}]) == ""


def test_resolve_first_occurrence_once():
    abbrevs = [
        {"short_text": "AB", "long_text": "alpha beta"},
        {"short_text": "AB", "long_text": "other expansion"},
    ]
    assert resolve_abbreviations("AB and AB", abbrevs) == "alpha beta and alpha beta"


def test_find_and_remove_definitions_known():
    abbrevs = [{"short_text": "MRI"}]
    out = find_and_remove_definitions("Magnetic resonance imaging (MRI) is used.", abbrevs)
    assert out == "Magnetic resonance imaging is used."


def test_find_and_remove_definitions_initials():
    out = find_and_remove_definitions("major depressive disorder (MDD) patients", [])
    assert out == "major depressive disorder patients"


def test_find_and_remove_definitions_keeps_unrelated():
    out = find_and_remove_definitions("results (significant) were found", [])
    assert out == "results (significant) were found"


def test_find_and_remove_empty_parens():
    assert find_and_remove_definitions("weird () token", []) == "weird token"


def test_normalize_web_text_unicode_and_control():
    """Unicode/control behavior of normalize_web_text (not reachable
    through the ASCII SQL oracle): NFC composition, control strip with
    tab/newline kept, CR removed, newline-run collapse, outer trim."""
    from neurostore_text_extraction_ray.functions.normalize import (
        normalize_web_text as n)

    assert n("e\u0301tude") == "\u00e9tude"  # NFC composes e+combining
    assert n("a\x00b\x07c\x7fd") == "abcd"           # controls stripped
    assert n("a\r\nb") == "a\nb"                     # CR dies, LF stays
    assert n("a \t  b") == "a b"                     # ws run collapses
    assert n("a\n\n\n\n\nb") == "a\n\nb"             # nl run -> 2
    assert n("a\n\nb") == "a\n\nb"                   # 2 newlines kept
    assert n("  x  ") == "x"
    assert n("") == "" and n(None) == ""
    assert n(" \t\n ") == ""                         # whitespace-only
