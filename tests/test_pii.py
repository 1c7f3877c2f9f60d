"""PII detection + redaction: pattern semantics, ordering, clean docs."""

from bullet_storm_spark.operators.pii import (
    PII_PATTERNS,
    pii_redact,
    pii_report,
    pii_summary,
)

DOCS = [
    # (id, text, expected per-kind counts e/cc/ssn/ph/ip)
    (1, "contact alice@example.com or bob.smith+x@sub.domain.org today",
     (2, 0, 0, 0, 0)),
    (2, "card 4111-1111-1111-1234 expires soon", (0, 1, 0, 0, 0)),
    (3, "ssn 123-45-6789 on file", (0, 0, 1, 0, 0)),
    (4, "call 555-123-4567 or 555.987.6543", (0, 0, 0, 2, 0)),
    (5, "server at 192.168.0.1 and 10.0.255.7", (0, 0, 0, 0, 2)),
    (6, "a perfectly clean document with words only", (0, 0, 0, 0, 0)),
    # digits embedded in an email: report counts BOTH patterns on raw
    # text is impossible here (no dash run), redact masks email first
    (7, "mixed 555-111-2222 then carol@x.io then 1.2.3.4", (1, 0, 0, 1, 1)),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )


def test_report_counts(spark):
    rows = {r.id: r for r in pii_report(_df(spark), "doc_id", "text").collect()}
    for i, _, (e, cc, ssn, ph, ip) in DOCS:
        r = rows[i]
        got = (r.n_email, r.n_credit_card, r.n_ssn, r.n_phone, r.n_ipv4)
        assert got == (e, cc, ssn, ph, ip), (i, got)
        assert r.n_pii == sum((e, cc, ssn, ph, ip))
        assert r.has_pii == (r.n_pii > 0)


def test_redact_masks_every_kind(spark):
    rows = {r.id: r for r in pii_redact(_df(spark), "doc_id", "text").collect()}
    assert rows[1].text == "contact <EMAIL> or <EMAIL> today"
    assert rows[2].text == "card <CREDIT_CARD> expires soon"
    assert rows[3].text == "ssn <SSN> on file"
    assert rows[4].text == "call <PHONE> or <PHONE>"
    assert rows[5].text == "server at <IP> and <IP>"
    assert rows[6].text == "a perfectly clean document with words only"
    assert rows[7].text == "mixed <PHONE> then <EMAIL> then <IP>"
    for i, _, counts in DOCS:
        assert rows[i].n_redacted == sum(counts), i


def test_redact_order_email_swallows_inner_digits(spark):
    # an email whose local part looks like an SSN: the email pattern wins
    # (applied first), so no <SSN> appears inside the placeholder
    df = spark.createDataFrame(
        [(1, "reach 123-45-6789@corp.net now")], "doc_id long, text string"
    )
    [r] = pii_redact(df, "doc_id", "text").collect()
    assert r.text == "reach <EMAIL> now"
    assert r.n_redacted == 1


def test_summary_rates(spark):
    df = spark.createDataFrame(
        [(i, t, "a" if i % 2 else "b") for i, t, _ in DOCS],
        "doc_id long, text string, source string",
    )
    rows = {r.grp: r for r in pii_summary(df, "doc_id", "text", "source").collect()}
    # group a: ids 1,3,5,7 all have pii; group b: ids 2,4 have, 6 clean
    assert rows["a"].n_docs == 4 and rows["a"].docs_with_pii == 4
    assert rows["a"].pii_rate == 1.0
    assert rows["b"].n_docs == 3 and rows["b"].docs_with_pii == 2
    assert abs(rows["b"].pii_rate - round(2 / 3, 6)) < 1e-9


def test_patterns_re2_safe():
    # the DuckDB oracle runs RE2: no lookaround/backreference constructs
    for _, pat, _ in PII_PATTERNS:
        assert "(?<" not in pat and "(?=" not in pat and "(?!" not in pat
        assert "\\1" not in pat
