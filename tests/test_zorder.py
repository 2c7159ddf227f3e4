"""Z-order layout: Morton-key parity + file-rectangle locality."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from featuregenerator_spark.sources.zorder import write_zordered


def _file_spans(path, col_name):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index(col_name)
        mn = min(
            md.row_group(i).column(ci).statistics.min
            for i in range(md.num_row_groups)
        )
        mx = max(
            md.row_group(i).column(ci).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append(mx - mn)
    return spans


def test_zorder_files_cover_small_rectangles(spark, tmp_path):
    """Each z-ordered file must span a small min/max rectangle on BOTH
    interleaved columns (footer stats are what a scan prunes on). A 1D
    sort gets ~1/N on one column and ~1.0 on the other; Morton gets
    partial locality on both — pinned: mean normalized span <= 0.5 per
    column and the two means sum below 1.0."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts_sec", F.col("ts").cast("timestamp").cast("double")
    )
    path = str(tmp_path / "z")
    write_zordered(ev, path, "user_id", "ts_sec", num_files=16, bits=8)

    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert back.select("event_id").exceptAll(ev.select("event_id")).count() == 0

    g_user = ev.agg(F.max("user_id") - F.min("user_id")).collect()[0][0]
    g_ts = ev.agg(F.max("ts_sec") - F.min("ts_sec")).collect()[0][0]
    su = _file_spans(path, "user_id")
    st = _file_spans(path, "ts_sec")
    fu = sum(su) / len(su) / g_user
    ft = sum(st) / len(st) / g_ts
    assert fu <= 0.5, (fu, su)
    assert ft <= 0.5, (ft, st)
    assert fu + ft < 1.0, (fu, ft)


def test_zorder_constant_column_is_rank_zero(spark, tmp_path):
    """A constant key column (span 0) must rank to 0 on that dimension
    instead of evaluating 0/0 (NaN -> ANSI cast error); the other
    dimension still orders the layout."""
    df = spark.range(200).select(
        F.col("id").alias("a"), F.lit(7).alias("b")
    )
    path = str(tmp_path / "zc")
    write_zordered(df, path, "a", "b", num_files=4, bits=8)
    back = spark.read.parquet(path)
    assert back.count() == 200
    # with b constant, z reduces to the interleave of a alone -> files
    # partition a into disjoint ranges
    spans = _file_spans(path, "a")
    assert sum(spans) / len(spans) <= 199 / 2, spans


def test_zorder_key_spark_duckdb_parity_cross_sf(spark):
    """The gate checks sf0.01; re-prove the generated-expression parity
    at sf0.001 (different data shape) against DuckDB directly."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_id"]: r["zkey"]
        for r in m.queries()["zorder_key"](spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = dict(con.execute(m.oracle_sql()["zorder_key"]).fetchall())
    assert got == want


def test_zorder3_files_cover_small_boxes(spark, tmp_path):
    """3-key Morton: each written file must span a small min/max BOX on
    all THREE interleaved columns — the (user, item, ts) point-lookup
    layout. Pinned: per-column mean normalized span <= 0.7 and the three
    means sum below 1.8 (a 1D sort gets ~2.0+: one tight axis, two ~1.0
    axes)."""
    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).withColumn("ts_sec", F.col("ts").cast("timestamp").cast("double"))
    path = str(tmp_path / "z3")
    write_zordered(
        ev, path, "user_id", "ts_sec", "value", num_files=16, bits=8
    )

    back = spark.read.parquet(path)
    assert back.count() == ev.count()

    fracs = []
    for col in ("user_id", "ts_sec", "value"):
        g = ev.agg(F.max(col) - F.min(col)).collect()[0][0]
        spans = _file_spans(path, col)
        fracs.append(sum(spans) / len(spans) / g)
    assert all(f <= 0.7 for f in fracs), fracs
    assert sum(fracs) < 1.8, fracs


def test_zorder_budget_and_arity_guards(spark):
    import pytest

    from featuregenerator_spark.sources.zorder import zorder_key_columns

    with pytest.raises(ValueError, match="63-bit"):
        zorder_key_columns(
            [F.col("a"), F.col("b"), F.col("c"), F.col("d")],
            [(0.0, 1.0)] * 4,
            bits=16,
        )
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key_columns([F.col("a")], [(0.0, 1.0)], bits=8)
