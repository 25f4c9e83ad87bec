"""HTML whole-DOM dump kernel (M1). Byte-identity vs the reference
fixture whose stored HTML matches the golden text's fetch, plus unit
coverage of each whitespace/entity rule."""

import glob
import os

import pytest

from neurostore_text_extraction_ray.functions.html_text import html_to_text, html_title

REF = "/root/reference/tests/data/sample_inputs"


def test_script_style_excluded():
    html = "<html><head><script>var x=1;</script><style>.a{}</style></head><body>Hello</body></html>"
    assert html_to_text(html) == "Hello"


def test_entity_decoding():
    assert html_to_text("<p>a &amp; b &lt;c&gt; &#x2013;</p>") == "a & b <c> –"


def test_whitespace_only_nodes():
    # newline-bearing whitespace node -> "\n", space-only -> " "
    html = "<div>a</div>\n  <div>b</div>  <div>c</div>"
    assert html_to_text(html) == "a\nb c"


def test_text_node_whitespace_preserved():
    html = "<p>line one\n   line two</p>"
    assert html_to_text(html) == "line one\n   line two"


def test_fold_unicode():
    assert html_to_text("<p>2013–2015 −5\xa0x</p>", fold_unicode=True) == "2013-2015 -5 x"
    assert html_to_text("<p>2013–2015</p>") == "2013–2015"


def test_nested_script_not_greedy():
    html = "<body>a<script>x</script>b<script>y</script>c</body>"
    assert html_to_text(html) == "abc"


def test_title():
    assert html_title("<html><head><title>T1</title></head><body><title>T2</title></body></html>") == "T1"
    assert html_title("<p>no title</p>") is None


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference fixtures unavailable")
def test_byte_identity_reference_fixture():
    """G6qSwgM5koZp: the one ACE fixture whose stored HTML is the same
    fetch its golden text.txt was produced from -> byte-identical."""
    html = open(
        glob.glob(f"{REF}/G6qSwgM5koZp/source/ace/*.html")[0], encoding="utf-8"
    ).read()
    gold = open(f"{REF}/G6qSwgM5koZp/processed/ace/text.txt", encoding="utf-8").read()
    assert html_to_text(html) == gold


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference fixtures unavailable")
def test_word_overlap_other_reference_fixtures():
    """The other ACE goldens come from different page fetches (dynamic
    content); require high word-level overlap, not byte equality."""
    import difflib

    for d in sorted(glob.glob(f"{REF}/*/")):
        htmls = glob.glob(d + "source/ace/*.html")
        gf = d + "processed/ace/text.txt"
        if not htmls or not os.path.exists(gf):
            continue
        mine = html_to_text(open(htmls[0], encoding="utf-8").read()).split()
        gold = open(gf, encoding="utf-8").read().split()
        sm = difflib.SequenceMatcher(None, mine, gold, autojunk=False)
        common = sum(b.size for b in sm.get_matching_blocks())
        assert common / max(1, len(gold)) > 0.70, d


def test_heading_section_spans():
    from neurostore_text_extraction_ray.functions.html_text import (
        html_to_text_and_spans,
    )

    html = ("<body><h1>Introduction</h1><p>intro text</p>"
            "<h2>Methods</h2><p>methods text</p>"
            "<h2>Results</h2><p>results text</p></body>")
    text, spans = html_to_text_and_spans(html)
    assert [s["label"] for s in spans] == ["intro", "methods", "results"]
    for s in spans:
        assert text[s["start"]:s["end"]].startswith(
            {"intro": "Introduction", "methods": "Methods", "results": "Results"}[s["label"]]
        )
    # heading-less document -> one body span covering everything
    text2, spans2 = html_to_text_and_spans("<p>just text</p>")
    assert spans2 == [{"label": "body", "start": 0, "end": len(text2)}]
    # heading inside script is ignored
    _, spans3 = html_to_text_and_spans("<script><h1>x</h1></script><p>t</p>")
    assert spans3[0]["label"] == "body"
