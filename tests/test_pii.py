"""PII redaction kernel (functions/pii.py): pattern coverage, the
fixed email->phone->ip order, and non-PII lookalikes left intact."""

import pandas as pd

from neurostore_text_extraction_ray.functions.pii import redact_frame


def _one(text):
    out = redact_frame(pd.DataFrame({"doc_id": [1], "text": [text]}))
    return out.iloc[0]


def test_each_pattern():
    r = _one("mail a.b+c%d@sub.example.org or call 555-010-1234 "
             "from 10.0.0.1 today")
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 1, 1)
    assert r["redacted_text"] == (
        "mail <EMAIL> or call <PHONE> from <IP> today")


def test_multiple_and_adjacent():
    r = _one("a@b.co c@d.io 111-222-3333 444-555-6666 1.2.3.4 5.6.7.8")
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (2, 2, 2)
    assert r["redacted_text"] == "<EMAIL> <EMAIL> <PHONE> <PHONE> <IP> <IP>"


def test_lookalikes_untouched():
    # no TLD, word-adjacent digits, 3-octet dotted number
    r = _one("not-an-email@host 12345-678-9012x 1.2.3 ok")
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (0, 0, 0)
    assert r["redacted_text"].endswith("1.2.3 ok")


def test_null_and_empty():
    out = redact_frame(pd.DataFrame({"doc_id": [1, 2], "text": [None, ""]}))
    assert out["n_emails"].tolist() == [0, 0]
    assert out["redacted_text"].tolist() == ["", ""]


def test_ip_inside_email_consumed_by_email_first():
    # the email pattern consumes the dotted-quad-looking domain; the
    # later ip pass sees only <EMAIL> (sequential semantics)
    r = _one("x@1.2.3.44 rest")
    assert r["n_emails"] == 0  # TLD must be alphabetic -> not an email
    assert r["n_ips"] == 1     # but it IS a dotted quad
    assert r["redacted_text"] == "x@<IP> rest"
