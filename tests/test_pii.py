"""PII detection/scrubbing (functions/pii.py): Python-re witness,
pinned scrub order, idempotence."""

import re

import pytest

from pisa_spark.functions.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    PII_RULES,
    pii_filter,
    pii_signals,
    scrub_pii,
)

TEXTS = [
    (0, "reach me at alice.smith+spam@mail.example.co.uk or not at all"),
    (1, "server 10.0.254.7 and backup 192.168.1.1 rebooted"),
    (2, "call 555-123-4567 or 555.987.6543 after five"),
    (3, "plain text with no contact information whatsoever"),
    (4, "ambiguous span 123.456.7890 should mask as a phone"),
    (5, "bob@host.org mailed 10.1.2.3 about 800-555-1212"),
    (6, ""),
]


def _count(pat, s):
    return len(re.findall(pat, s))


def _scrub(s):
    for _, pat, tok in PII_RULES:
        s = re.sub(pat, tok, s)
    return s


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_signals_match_re_witness(docs):
    got = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ipv4"], r["has_pii"])
        for r in pii_signals(docs).collect()
    }
    for d, s in TEXTS:
        ne, np_, ni = (
            _count(EMAIL_RE, s),
            _count(PHONE_RE, s),
            _count(IPV4_RE, s),
        )
        assert got[d] == (ne, np_, ni, ne + np_ + ni > 0), (d, s)
    assert got[0][0] == 1 and got[1][2] == 2 and got[2][1] == 2
    assert got[3] == (0, 0, 0, False)


def test_scrub_matches_re_witness_and_order(docs):
    got = {r["doc_id"]: r["text"] for r in scrub_pii(docs).collect()}
    for d, s in TEXTS:
        assert got[d] == _scrub(s), d
    # pinned order: the ambiguous span is a PHONE, not an IP
    assert "<PHONE>" in got[4] and "<IP>" not in got[4]
    # all three rules fire on doc 5
    assert "<EMAIL>" in got[5] and "<IP>" in got[5] and "<PHONE>" in got[5]


def test_scrub_idempotent(docs):
    once = scrub_pii(docs)
    twice = {r["doc_id"]: r["text"] for r in scrub_pii(once).collect()}
    assert twice == {r["doc_id"]: r["text"] for r in once.collect()}


def test_filter_cut(docs):
    kept = {r["doc_id"] for r in pii_filter(docs).collect()}
    assert kept == {3, 6}
    kept2 = {r["doc_id"] for r in pii_filter(docs, max_hits=2).collect()}
    assert kept2 == {0, 1, 2, 3, 4, 6}  # doc 5 has 3 hits
