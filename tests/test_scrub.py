"""PII scrub tests: counts and redaction verified against the Python
`re` module as an independent third regex engine (the driver gate
cross-checks Spark's Java regex vs DuckDB's RE2; here we pin the
intended semantics with a fresh oracle)."""

import re

from cello_spark.operators.scrub import PII_RULES, pii_redact, pii_signals

DOCS = [
    (1, "reach me at alice.smith+spam@mail-host.co.uk or in the office"),
    (2, "server at 10.0.42.7 and backup at 192.168.1.254 are down"),
    (3, "call 555-867-5309 or 555.123.4567 before 9"),
    (4, "mixed: bob@x.io from 8.8.8.8 dialed 800-555-0199 twice"),
    (5, "no pii here, just text about 1234.5 and version 3.2.1"),
    (6, "almost-email a@b and bare number 12-34-56 do not match"),
    (7, ""),
]


def _oracle(text):
    counts = {}
    red = text
    for name, pat, token in PII_RULES:
        counts[f"n_{name}"] = len(re.findall(pat, text))
        red = re.sub(pat, token, red)
    counts["n_pii"] = sum(counts.values())
    counts["redacted"] = red
    return counts


def test_pii_signals_vs_re_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in pii_signals(df).collect()}
    for doc_id, text in DOCS:
        want = _oracle(text)
        for k in ("n_email", "n_ipv4", "n_phone", "n_pii"):
            assert got[doc_id][k] == want[k], (doc_id, k, got[doc_id], want)


def test_pii_redact_vs_re_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in pii_redact(df).collect()}
    for doc_id, text in DOCS:
        want = _oracle(text)
        assert got[doc_id]["redacted"] == want["redacted"], doc_id
        assert got[doc_id]["n_pii"] == want["n_pii"]


def test_specific_expectations(spark):
    # pin a few absolute facts so the oracle itself is checked
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in pii_redact(df).collect()}
    assert got[1]["n_email"] == 1 and "<EMAIL>" in got[1]["redacted"]
    assert got[2]["n_ipv4"] == 2 and got[2]["redacted"].count("<IP>") == 2
    assert got[3]["n_phone"] == 2
    assert got[4]["n_pii"] == 3
    assert got[5]["n_pii"] == 0 and got[5]["redacted"] == DOCS[4][1]
    assert got[6]["n_pii"] == 0


def test_zero_shuffle_plan(spark):
    """The scrub is a pure projection: no Exchange in the plan."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = pii_redact(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
