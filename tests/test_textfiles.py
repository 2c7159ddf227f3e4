"""JSONL/CSV source roundtrips: lossless text-boundary fidelity."""

import datetime

from pyspark.sql import functions as F

from featuregenerator_spark.sources.textfiles import (
    read_events_csv,
    read_events_jsonl,
    write_events_csv,
    write_events_jsonl,
)

ROWS = [
    # (event_id, ts, user_id, event_type, value, props)
    (1, datetime.datetime(2024, 1, 1, 0, 0, 7, 179575), 10, "view",
     1.5, '{"k": 69}'),
    # embedded quotes AND commas AND the quote-doubling worst case
    (2, datetime.datetime(2024, 2, 29, 23, 59, 59, 999999), 11, "click",
     0.1 + 0.2, 'say "hi, there", then ""quoted"" again'),
    # leading/trailing spaces survive quoting; value null
    (3, datetime.datetime(2024, 6, 1, 12, 0, 0, 0), 12, "purchase",
     None, "  padded  "),
    # empty string props, negative sub-normal-ish double
    (4, datetime.datetime(2024, 6, 1, 12, 0, 0, 1), 13, "view",
     -1.23456789012345e-7, ""),
]
DDL = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _roundtrip(spark, tmp_path, writer, reader, sub):
    df = spark.createDataFrame(ROWS, DDL)
    path = str(tmp_path / sub)
    writer(df, path)
    back = reader(spark, path)
    assert back.columns == ["event_id", "ts", "user_id", "event_type", "value", "props"]
    got = {r["event_id"]: r for r in back.collect()}
    assert len(got) == len(ROWS)
    for eid, ts, uid, et, val, props in ROWS:
        r = got[eid]
        assert r["ts"] == ts, (eid, r["ts"], ts)
        assert (r["user_id"], r["event_type"]) == (uid, et)
        assert r["value"] == val  # exact double repr roundtrip
        assert r["props"] == (props if props != "" else r["props"])
    return got


def test_jsonl_roundtrip_exact(spark, tmp_path):
    got = _roundtrip(spark, tmp_path, write_events_jsonl, read_events_jsonl, "j")
    assert got[4]["props"] == ""  # JSON keeps empty string distinct from null
    assert got[2]["props"] == 'say "hi, there", then ""quoted"" again'


def test_csv_roundtrip_exact(spark, tmp_path):
    got = _roundtrip(spark, tmp_path, write_events_csv, read_events_csv, "c")
    # RFC 4180 quote-doubling must survive; backslash-escape readers break here
    assert got[2]["props"] == 'say "hi, there", then ""quoted"" again'
    assert got[3]["props"] == "  padded  "
    assert got[3]["value"] is None


def test_roundtrip_on_driver_events_cross_sf(spark):
    """Full events table at a DIFFERENT SF than the oracle gate uses
    (sf0.001): write both formats, read back, and diff against the
    parquet original exactly (anti-join both directions is empty)."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    for name in ("source_jsonl_roundtrip", "source_csv_roundtrip"):
        back = m.queries()[name](spark, sf)
        orig = spark.read.parquet(f"{sf}/events.parquet").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        assert back.count() == orig.count()
        assert back.exceptAll(orig).count() == 0
        assert orig.exceptAll(back).count() == 0


def test_jsonl_corrupt_audit_quarantines_exactly(spark, tmp_path):
    """Good rows are byte-identical to the input; the quarantine holds
    exactly the injected lines verbatim, including the partial-row
    type-mismatch case (other fields parse, row still flagged)."""
    import __spark_entry__  # noqa: F401  (same injection pattern as the query)
    from featuregenerator_spark.sources.textfiles import (
        read_events_jsonl_audited,
    )

    df = spark.createDataFrame(ROWS, DDL)
    path = str(tmp_path / "qa")
    write_events_jsonl(df, path)
    bad = [
        "definitely not json",
        '{"event_id": 1',
        '{"event_id": "not-a-long", "ts_str": "2024-01-01 '
        '00:00:00.000000", "user_id": 1, "event_type": "view", '
        '"value": 1.0, "props": "x"}',
    ]
    with open(f"{path}/part-99999-garbage.json", "w") as f:
        f.write("\n".join(bad) + "\n")

    good, quarantined = read_events_jsonl_audited(spark, path)
    assert good.count() == len(ROWS)
    assert {r["event_id"] for r in good.collect()} == {1, 2, 3, 4}
    q = quarantined.collect()
    assert sorted(r["raw_line"] for r in q) == sorted(bad)
    # partial-row semantics: the type-mismatch line parsed user_id but
    # is still quarantined (the reason "good" filters on _corrupt,
    # never on a field being non-null)
    mismatch = [r for r in q if "not-a-long" in r["raw_line"]]
    assert len(mismatch) == 1 and mismatch[0]["event_id"] is None


def test_csv_corrupt_audit_quarantines_exactly(spark, tmp_path):
    """CSV twin: per-part header lines are filtered (not quarantined),
    the injected garbage is quarantined verbatim with partial-row
    semantics, and good rows survive byte-identically — including the
    quote-doubling and padded-whitespace worst cases."""
    from featuregenerator_spark.sources.textfiles import (
        read_events_csv_audited,
    )

    df = spark.createDataFrame(ROWS, DDL)
    path = str(tmp_path / "ca")
    # several part files -> several header lines to filter
    write_events_csv(df.repartition(3), path)
    bad = [
        "not,enough,cols",
        'xx,2024-01-01 00:00:00.000000,1,view,1.0,"p"',
        '77,2024-01-01 00:00:00.000000,1,view,notadouble,"p"',
    ]
    with open(f"{path}/part-99999-garbage.csv", "w") as f:
        f.write("\n".join(bad) + "\n")

    good, quarantined = read_events_csv_audited(spark, path)
    got = {r["event_id"]: r for r in good.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2]["props"] == 'say "hi, there", then ""quoted"" again'
    assert got[3]["props"] == "  padded  "
    q = quarantined.collect()
    assert sorted(r["raw_line"] for r in q) == sorted(bad)
    # partial-row: the bad-double line keeps its parsed event_id
    baddouble = [r for r in q if "notadouble" in r["raw_line"]]
    assert len(baddouble) == 1 and baddouble[0]["event_id"] == 77
