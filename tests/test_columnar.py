"""ORC source roundtrip: columnar fidelity + index-backed pushdown."""

import datetime

from featuregenerator_spark.sources.columnar import (
    read_events_orc,
    write_events_orc,
)

ROWS = [
    # (event_id, ts, user_id, event_type, value, props)
    (1, datetime.datetime(2024, 1, 1, 0, 0, 7, 179575), 10, "view",
     1.5, '{"k": 69}'),
    (2, datetime.datetime(2024, 2, 29, 23, 59, 59, 999999), 11, "click",
     0.1 + 0.2, 'say "hi, there", then ""quoted"" again'),
    (3, datetime.datetime(2024, 6, 1, 12, 0, 0, 0), 12, "purchase",
     None, "  padded  "),
    (4, datetime.datetime(2024, 6, 1, 12, 0, 0, 1), 13, "view",
     -1.23456789012345e-7, ""),
]
DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def test_orc_roundtrip_exact(spark, tmp_path):
    df = spark.createDataFrame(ROWS, DDL)
    path = str(tmp_path / "o")
    write_events_orc(df, path)
    back = read_events_orc(spark, path)
    assert back.columns == [
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]
    got = {r["event_id"]: r for r in back.collect()}
    assert len(got) == len(ROWS)
    for eid, ts, uid, et, val, props in ROWS:
        r = got[eid]
        assert r["ts"] == ts, (eid, r["ts"], ts)
        assert (r["user_id"], r["event_type"]) == (uid, et)
        assert r["value"] == val  # exact double roundtrip (no text form)
        assert r["props"] == props  # binary container: no quoting layer
    assert got[3]["value"] is None
    assert got[3]["props"] == "  padded  "


def test_orc_filter_pushes_to_scan(spark, tmp_path):
    """A selective key filter must reach the ORC scan (PushedFilters),
    where the written bloom-filter/min-max stripe indexes can prune —
    the plan property the 100 TB point-lookup path depends on."""
    df = spark.createDataFrame(ROWS, DDL)
    path = str(tmp_path / "p")
    write_events_orc(df, path)
    df = (
        read_events_orc(spark, path)
        .filter("user_id = 11")
        .select("event_id", "value")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan, plan
    assert "EqualTo(user_id,11)" in plan.split("PushedFilters")[1], plan
    # column pruning: props/text never decoded for this projection
    read_schema = [
        l for l in plan.splitlines() if "ReadSchema" in l
    ][0]
    assert "props" not in read_schema


def test_orc_roundtrip_on_driver_events_cross_sf(spark):
    """Full events table at a DIFFERENT SF than the oracle gate uses
    (sf0.001): write ORC, read back, diff against the parquet original
    exactly (anti-join both directions is empty)."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    back = m.queries()["source_orc_roundtrip"](spark, sf)
    orig = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    assert back.count() == orig.count()
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


def test_schema_evolution_superset_read(spark, tmp_path):
    """Files written before a column existed read as null under the
    declared superset schema; a RETYPE stays a loud failure."""
    from featuregenerator_spark.sources.columnar import read_evolved

    old = spark.createDataFrame([(1, "a")], "id long, x string")
    new = spark.createDataFrame([(2, "b", 9.5)], "id long, x string, y double")
    old.write.parquet(str(tmp_path / "d1"))
    new.write.parquet(str(tmp_path / "d2"))
    got = {
        r["id"]: (r["x"], r["y"])
        for r in read_evolved(
            spark, "id long, x string, y double",
            str(tmp_path / "d1"), str(tmp_path / "d2"),
        ).collect()
    }
    assert got == {1: ("a", None), 2: ("b", 9.5)}

    # retype (x as long) must fail loudly, not coerce silently —
    # pinned to the scan-level type-mismatch error class
    import pytest

    with pytest.raises(Exception, match="PARQUET_COLUMN_DATA_TYPE_MISMATCH"):
        read_evolved(
            spark, "id long, x long, y double",
            str(tmp_path / "d1"), str(tmp_path / "d2"),
        ).collect()


def test_schema_evolution_query_cross_sf(spark):
    """The evolution query at sf0.001 (gate checks sf0.01): nulls land
    on exactly the pre-cutoff rows."""
    import __spark_entry__ as m

    from pyspark.sql import functions as F2

    out = m.queries()["schema_evolution_read"](spark, "/root/testdata/sf0.001")
    bad = out.filter(
        (
            (F2.date_format("ts", "yyyy-MM-dd") < "2024-02-01")
            & F2.col("props").isNotNull()
        )
        | (
            (F2.date_format("ts", "yyyy-MM-dd") >= "2024-02-01")
            & F2.col("props").isNull()
        )
    )
    assert bad.count() == 0
    assert out.count() == spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).count()
