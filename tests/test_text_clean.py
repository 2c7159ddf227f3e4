"""C4 line filtering + PII scrubbing: hand-computed per-rule fixtures."""

import pytest

from featuregenerator_spark.operators.text_clean import (
    with_c4_clean,
    with_pii_scrub,
)


def _clean(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return with_c4_clean(df).collect()[0].asDict()


def _scrub(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return with_pii_scrub(df).collect()[0].asDict()


GOOD_LINES = "we keep this line.\nand we keep this one!\nalso keep this one?"


def test_c4_keeps_good_lines(spark):
    r = _clean(spark, GOOD_LINES)
    assert r["n_kept_lines"] == 3
    assert r["n_dropped_lines"] == 0
    assert r["clean_text"] == GOOD_LINES
    assert r["keep_doc"] is True


@pytest.mark.parametrize(
    "bad, rule",
    [
        ("no terminal punctuation here", "punct"),
        ("too short.", "min words"),
        ("this has Lorem Ipsum inside.", "blocklist case-insensitive"),
        ("enable javascript to continue.", "blocklist"),
        ("code block { begins here.", "brace"),
        ("read our Cookie Policy first.", "blocklist multiword"),
    ],
)
def test_c4_drops_each_rule(spark, bad, rule):
    r = _clean(spark, GOOD_LINES + "\n" + bad)
    assert r["n_kept_lines"] == 3, rule
    assert bad not in r["clean_text"], rule


def test_c4_keep_doc_threshold(spark):
    two = "first good line.\nsecond good line."
    r = _clean(spark, two)
    assert r["n_kept_lines"] == 2
    assert r["keep_doc"] is False


def test_c4_quote_terminal(spark):
    r = _clean(spark, 'he said "stop right there."')
    assert r["n_kept_lines"] == 1


def test_c4_empty_lines_ignored(spark):
    r = _clean(spark, "keep this line.\n\n\nand this line.")
    assert r["n_lines"] == 2


def test_pii_email(spark):
    r = _scrub(spark, "mail First.Last+tag%x@sub.example.co.uk now")
    assert r["n_email"] == 1
    assert r["scrubbed_text"] == "mail <EMAIL> now"


def test_pii_ipv4(spark):
    r = _scrub(spark, "host 192.168.0.1 and 10.0.0.255 up")
    assert r["n_ip"] == 2
    assert r["scrubbed_text"] == "host <IP> and <IP> up"


@pytest.mark.parametrize(
    "phone",
    ["+1 555-123-4567", "49 170 555 0199", "+353 861-234-567"],
)
def test_pii_phone_variants(spark, phone):
    r = _scrub(spark, f"call {phone} today")
    assert r["n_phone"] == 1
    assert r["scrubbed_text"] == "call <PHONE> today"


def test_pii_order_email_before_phone(spark):
    # digits inside an email local part must not be eaten by the phone
    # pattern: email replacement runs first
    r = _scrub(spark, "send to a123 456 789@ex.org ok")
    assert r["n_email"] == 1
    assert "<EMAIL>" in r["scrubbed_text"]
    assert "@" not in r["scrubbed_text"]


def test_pii_idempotent(spark):
    once = _scrub(spark, "e a@b.io ip 1.2.3.4 ph +1 555-123-4567")[
        "scrubbed_text"
    ]
    again = _scrub(spark, once)["scrubbed_text"]
    assert once == again
    assert once == "e <EMAIL> ip <IP> ph <PHONE>"


def test_pii_counts_on_original_text(spark):
    # counts reflect the ORIGINAL text even when patterns nest: the IP
    # also contains digit runs, but the phone pattern needs separators
    r = _scrub(spark, "nothing here")
    assert (r["n_email"], r["n_ip"], r["n_phone"]) == (0, 0, 0)
    assert r["scrubbed_text"] == "nothing here"


def test_normalize_text_closed_form(spark):
    from pyspark.sql import functions as F

    from featuregenerator_spark.operators.text_clean import (
        normalize_text_columns,
    )

    messy = "  A\tBC" + chr(7) + "   d "
    df = spark.createDataFrame(
        [(1, messy), (2, "already clean")], "doc_id long, text string"
    )
    cols = normalize_text_columns(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in cols.items()]
        ).collect()
    }
    assert out[1]["n_ctrl_removed"] == 1          # the BEL char
    assert out[1]["norm_text"] == "a bc d"
    assert out[1]["n_ws_collapsed"] == (len(messy) - 1) - len("A BC d")
    assert out[1]["changed"] == 1
    assert out[2]["norm_text"] == "already clean"
    assert out[2]["changed"] == 0
    assert out[2]["n_ctrl_removed"] == 0 and out[2]["n_ws_collapsed"] == 0
