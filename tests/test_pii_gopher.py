"""Round-5 [EXT] operators: PII scan/redact + Gopher rule battery."""

from __future__ import annotations

from datacamp_etl_spark.operators.pii import pii_redact, pii_scan
from datacamp_etl_spark.operators.quality import gopher_rules


def _pii_docs(spark):
    return spark.createDataFrame(
        [
            (1, "mail me at jane.doe+spam@mail.example.org today"),
            (2, "server 192.168.0.1 and 10.0.0.255 are up"),
            (3, "call +1 555-0142 or (555) 014-2777 now"),
            (4, "nothing sensitive here at all"),
            (5, "combo a@b.io from 8.8.8.8 dial 555-0100 end"),
            (6, ""),
        ],
        "doc_id long, text string",
    )


def test_pii_scan_counts(spark):
    out = {r["doc_id"]: r for r in pii_scan(_pii_docs(spark)).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 0
    assert out[2]["n_ipv4"] == 2 and out[2]["n_email"] == 0
    assert out[3]["n_phone"] == 2
    assert out[4]["n_pii"] == 0
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_phone"]) == (1, 1, 1)
    assert out[6]["n_pii"] == 0


def test_pii_redact_replaces_and_preserves_rest(spark):
    out = {r["doc_id"]: r["text"] for r in pii_redact(_pii_docs(spark)).collect()}
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "server <IP> and <IP> are up"
    assert "<PHONE>" in out[3] and "555" not in out[3]
    assert out[4] == "nothing sensitive here at all"
    # email digits must not be re-eaten by the phone pass
    assert out[5] == "combo <EMAIL> from <IP> dial <PHONE> end"


def test_pii_redact_email_before_phone_ordering(spark):
    df = spark.createDataFrame(
        [(1, "reach 12345678@example.com ok")], "doc_id long, text string"
    )
    out = pii_redact(df).collect()[0]["text"]
    # the long digit run sits inside the email; the email pass wins
    assert out == "reach <EMAIL> ok"


def _gopher_docs(spark):
    long_ok = "the quick brown fox jumps over a lazy dog and keeps on " * 10
    bullets = "\n".join(["- item one", "* item two", "plain line", "- three"])
    elide = "\n".join(["trailing thought...", "and more…", "solid line"])
    symbols = ("# " * 30) + "the a of words here"
    return spark.createDataFrame(
        [
            (1, long_ok),  # passes everything
            (2, "tiny doc the a"),  # too few words
            (3, bullets),  # 3/4 bullet lines
            (4, elide),  # 2/3 ellipsis lines
            (5, symbols),  # symbol-heavy
            (6, ""),  # empty
        ],
        "doc_id long, text string",
    )


def test_gopher_signals_and_keep(spark):
    out = {r["doc_id"]: r for r in gopher_rules(_gopher_docs(spark)).collect()}
    assert out[1]["keep"] == 1
    assert out[1]["n_words"] >= 50 and out[1]["n_stop_distinct"] >= 2
    assert out[2]["keep"] == 0 and out[2]["n_words"] == 4
    assert out[3]["bullet_milli"] == 750  # 3 of 4 lines
    assert out[4]["ellipsis_milli"] == 666  # 2 of 3 lines, floor
    assert out[5]["symbol_milli"] >= 100 and out[5]["keep"] == 0
    assert out[6]["n_words"] == 0 and out[6]["keep"] == 0
    assert out[6]["mean_word_len_milli"] is None


def test_gopher_mean_word_len_exact(spark):
    df = spark.createDataFrame(
        [(1, "ab abc abcd")], "doc_id long, text string"
    )
    r = gopher_rules(df).collect()[0]
    # (2+3+4)*1000 div 3 = 3000
    assert r["mean_word_len_milli"] == 3000
