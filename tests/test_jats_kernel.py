"""JATS kernel (M2-M4): byte-identity of rendered text on every
reference pubget fixture pair, plus spans / metadata / coordinates."""

import glob
import json
import os

import pytest

from neurostore_text_extraction_ray.functions.jats import (
    jats_coordinates,
    jats_metadata,
    jats_text,
    jats_text_and_spans,
    section_label,
)

BASES = [
    "/root/reference/tests/data/sample_inputs",
    "/root/reference/evaluation/data/ns_pond_inputs",
]


def _fixture_pairs():
    pairs = []
    for base in BASES:
        if not os.path.isdir(base):
            continue
        for d in sorted(glob.glob(base + "/*/")):
            xmls = [f for f in glob.glob(d + "source/pubget/*.xml") if "tables" not in f]
            gf = d + "processed/pubget/text.txt"
            if xmls and os.path.exists(gf):
                pairs.append((d.rstrip("/").split("/")[-1], xmls[0], gf))
    return pairs


PAIRS = _fixture_pairs()


@pytest.mark.skipif(not PAIRS, reason="reference fixtures unavailable")
@pytest.mark.parametrize("study,xml_path,gold_path", PAIRS, ids=[p[0] for p in PAIRS])
def test_text_byte_identity(study, xml_path, gold_path):
    xml = open(xml_path, encoding="utf-8").read()
    gold = open(gold_path, encoding="utf-8").read()
    assert jats_text(xml) == gold


SIMPLE = """<article><front>
  <journal-meta><journal-id journal-id-type="nlm-ta">J Test</journal-id></journal-meta>
  <article-meta>
    <title-group><article-title>A Study</article-title></title-group>
    <contrib-group>
      <contrib contrib-type="author"><name><surname>Doe</surname><given-names>Jane</given-names></name></contrib>
    </contrib-group>
    <pub-date><year>2020</year></pub-date>
    <kwd-group><kwd>alpha</kwd><kwd>beta</kwd></kwd-group>
    <abstract><p>Short abstract.</p></abstract>
    <license xlink:href="http://example.org/license" xmlns:xlink="http://www.w3.org/1999/xlink"/>
  </article-meta>
</front><body>
  <sec><title>Introduction</title><p>Intro text (<xref>Ref 1</xref>).</p></sec>
  <sec><title>Methods</title><p>We used MNI space.</p></sec>
  <sec><title>Results</title>
    <table-wrap id="t1"><label>Table 1</label><caption><p>Peaks.</p></caption>
      <table><thead><tr><th>region</th><th>x</th><th>y</th><th>z</th></tr></thead>
      <tbody><tr><td>ACC</td><td>1</td><td>−2</td><td>3.5</td></tr>
             <tr><td></td><td>n/a</td><td>5</td><td>6</td></tr></tbody></table>
    </table-wrap>
  </sec>
</body></article>"""


def test_sections_and_spans():
    text, spans = jats_text_and_spans(SIMPLE)
    assert "## Introduction \n  \n" in text
    assert [s["label"] for s in spans] == ["intro", "methods", "results"]
    for s in spans:
        seg = text[s["start"] : s["end"]]
        assert seg.startswith("## ")
    assert "Intro text ( )." in text  # xref dropped to a space


def test_metadata_fields():
    md = jats_metadata(SIMPLE)
    assert md["title"] == "A Study"
    assert md["authors"] == "Doe, Jane"
    assert md["journal"] == "J Test"
    assert md["keywords"] == "alpha\nbeta\n"
    assert md["publication_year"] == 2020
    assert md["license"] == "http://example.org/license"
    assert md["coordinate_space"] == "MNI"
    assert md["text"] is True


def test_coordinates_extraction():
    coords = jats_coordinates(SIMPLE)
    assert [(c["x"], c["y"], c["z"]) for c in coords] == [(1.0, -2.0, 3.5)]
    c = coords[0]
    assert c["table_id"] == "t1"
    assert c["table_label"] == "Table 1"
    assert c["table_number"] == "1"
    assert c["region"] == "ACC"


def test_section_label():
    assert section_label("Materials and Methods") == "methods"
    assert section_label("General Discussion") == "discussion"
    assert section_label("Signif statement") == "body"


@pytest.mark.skipif(not PAIRS, reason="reference fixtures unavailable")
def test_reference_coordinates_xyz():
    """Coordinate triples must match the golden coordinates.csv for the
    fixture with a machine-readable coordinate table."""
    import csv

    d = "/root/reference/tests/data/sample_inputs/3qT3nzK9bLZ7/"
    xml = open(d + "source/pubget/26507433.xml", encoding="utf-8").read()
    mine = [(c["x"], c["y"], c["z"]) for c in jats_coordinates(xml)]
    gold = [
        (float(r["x"]), float(r["y"]), float(r["z"]))
        for r in csv.DictReader(open(d + "processed/pubget/coordinates.csv"))
    ]
    assert mine == gold


@pytest.mark.skipif(not PAIRS, reason="reference fixtures unavailable")
def test_reference_metadata_majority_fields():
    """title / journal / keywords / publication_year / license must match
    the golden metadata.json on every pubget fixture."""
    for base in BASES:
        for d in sorted(glob.glob(base + "/*/")):
            xmls = [f for f in glob.glob(d + "source/pubget/*.xml") if "tables" not in f]
            gf = d + "processed/pubget/metadata.json"
            if not xmls or not os.path.exists(gf):
                continue
            md = jats_metadata(open(xmls[0], encoding="utf-8").read())
            gold = json.load(open(gf))
            for k in ("title", "journal", "keywords", "publication_year", "license", "text"):
                assert md[k] == gold[k], (d, k)


def test_default_namespaced_jats():
    """Some JATS archives default-namespace the document; the kernel
    must behave identically."""
    ns = ('<article xmlns="https://jats.nlm.nih.gov/ns/archiving/1.2/">'
          '<front><article-meta><title-group><article-title>NS Title'
          '</article-title></title-group><pub-date><year>2021</year></pub-date>'
          '</article-meta></front>'
          '<body><sec><title>Methods</title><p>Namespaced text.</p></sec></body>'
          '</article>')
    text, spans = jats_text_and_spans(ns)
    assert "Namespaced text." in text
    assert [s["label"] for s in spans] == ["methods"]
    md = jats_metadata(ns)
    assert md["title"] == "NS Title"
    assert md["publication_year"] == 2021


def test_html_entities_in_xml():
    """&nbsp;/&ndash; are illegal in plain XML; the parser resolves
    them via the html5 table on retry."""
    xml = ("<article><body><sec><title>Results</title>"
           "<p>value&nbsp;=&nbsp;3&ndash;5 &amp; more</p></sec></body></article>")
    text = jats_text(xml)
    assert "value\xa0=\xa03\u20135 & more" in text
