"""Pins for deterministic source-mix resampling."""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.operators.sampling import (
    source_mix_sample,
    split_rate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(2000)], "doc_id long, source string"
    )


def test_split_rate():
    assert split_rate(2.5) == (2, "80000000")
    assert split_rate(1.0) == (1, "00000000")
    assert split_rate(0.0) == (0, "00000000")
    assert split_rate(0.25) == (0, "40000000")
    with pytest.raises(ValueError):
        split_rate(-0.1)


def test_integer_rates_are_exact(spark, corpus):
    out = source_mix_sample(corpus, {"s0": 3.0, "s1": 1.0}, default_rate=0.0)
    rows = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert rows["s0"] == 500 * 3
    assert rows["s1"] == 500
    assert "s2" not in rows and "s3" not in rows
    # copy_idx enumerates 1..copies
    idx = out.filter("source = 's0' and doc_id = 0").select("copy_idx").collect()
    assert sorted(r["copy_idx"] for r in idx) == [1, 2, 3]


def test_fractional_rate_hits_band_and_is_deterministic(spark, corpus):
    out = source_mix_sample(corpus, {}, default_rate=0.5)
    n1 = out.count()
    n2 = source_mix_sample(corpus, {}, default_rate=0.5).count()
    assert n1 == n2  # same documents on every run, not just same count
    assert 0.45 * 2000 <= n1 <= 0.55 * 2000
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(tuple, source_mix_sample(corpus, {}, default_rate=0.5).collect())
    )
    assert a == b


def test_upsample_fraction_band(spark, corpus):
    out = source_mix_sample(corpus, {"s0": 2.5}, default_rate=0.0)
    n = out.count()  # 500 docs * (2 or 3 copies)
    assert 500 * 2 <= n <= 500 * 3
    assert abs(n - 1250) <= 0.05 * 2500
    per_doc = out.groupBy("doc_id").count().select("count").distinct().collect()
    assert {r["count"] for r in per_doc} <= {2, 3}


def test_map_only_plan(spark, corpus):
    plan = source_mix_sample(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_split_rate_near_one_fraction_carries():
    # a fraction rounding to 1.0 must carry, never emit a 9-hex threshold
    assert split_rate(2.99999999999) == (3, "00000000")
    assert split_rate(0.9999999999999) == (1, "00000000")
    base, thresh = split_rate(0.99999)
    assert base == 0 and len(thresh) == 8


def test_rates_values_sql_escapes_quotes():
    from featuregenerator_spark.operators.sampling import rates_values_sql

    sql = rates_values_sql({"o'reilly": 1.5})
    assert "'o''reilly'" in sql
    import duckdb
    assert duckdb.sql(f"SELECT * FROM {sql} t(s, b, h)").fetchall() == [
        ("o'reilly", 1, "80000000")
    ]


def test_split_assign_distribution_and_determinism(spark):
    from featuregenerator_spark.operators.sampling import split_assign

    df = spark.range(20000).select(F.col("id"))
    out = df.select(
        "id",
        split_assign(F.col("id"), {"train": 0.8, "val": 0.9, "test": 1.0})
        .alias("s"),
    )
    counts = {r["s"]: r["count"] for r in out.groupBy("s").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    # md5 uniformity: within 2% absolute of the declared fractions
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.02
    assert abs(counts["test"] / 20000 - 0.1) < 0.02
    # re-evaluation yields the identical assignment (no RNG anywhere)
    again = {r["id"]: r["s"] for r in out.collect()}
    assert {r["id"]: r["s"] for r in out.collect()} == again

    import pytest

    with pytest.raises(ValueError, match="1.0"):
        split_assign(F.col("id"), {"a": 0.5, "b": 0.8})
    with pytest.raises(ValueError, match="ascend"):
        split_assign(F.col("id"), {"a": 0.0, "b": 1.0})


def test_stratified_sample_exact_counts_and_stability(spark):
    from featuregenerator_spark.operators.sampling import (
        stratified_sample_exact,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("g"),
    )
    out = stratified_sample_exact(df, ["g"], n=10, id_col="doc_id")
    counts = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert all(v == 10 for v in counts.values()) and len(counts) == 7
    # groups smaller than n return the whole group
    small = df.filter(F.col("doc_id") < 20)
    out2 = stratified_sample_exact(small, ["g"], n=10, id_col="doc_id")
    assert out2.count() == 20
    # membership is stable across evaluations
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in out.collect()}
    assert a == b

    import pytest

    with pytest.raises(ValueError, match="positive"):
        stratified_sample_exact(df, ["g"], n=0)


def test_decontaminate_planted_overlap(spark):
    from featuregenerator_spark.operators.substring_dedup import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, bench_text),                               # the benchmark doc
        (1, "clean doc " + " ".join(f"x{j}" for j in range(20))),
        # contains an exact 8-token benchmark window mid-document
        (2, "intro words alpha beta gamma delta epsilon zeta eta theta tail"),
        (3, "short"),                                  # < k tokens: no windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter("doc_id = 0")
    corpus = df.filter("doc_id <> 0")
    got = {r["doc_id"]: r for r in decontaminate(corpus, bench, k=8).collect()}
    assert got[2]["contaminated"] == 1
    assert got[2]["n_hit_windows"] >= 1
    assert got[2]["first_hit_start"] == 2
    assert got[1]["contaminated"] == 0 and got[1]["n_hit_windows"] == 0
    assert got[3]["contaminated"] == 0
    assert got[3]["first_hit_start"] is None


class TestNegativePairs:
    def _emb(self, spark, n, labels=4):
        return spark.createDataFrame(
            [(i, i % labels) for i in range(n)], "vec_id long, label int"
        )

    def test_deterministic_across_partitioning(self, spark):
        from featuregenerator_spark.operators.sampling import negative_pairs

        df = self._emb(spark, 60)
        a = sorted(map(tuple, negative_pairs(df.repartition(7), k=4).collect()))
        b = sorted(map(tuple, negative_pairs(df.coalesce(1), k=4).collect()))
        assert a == b and len(a) > 0

    def test_no_self_or_same_label(self, spark):
        from featuregenerator_spark.operators.sampling import negative_pairs

        df = self._emb(spark, 50)
        rows = negative_pairs(df, k=4).collect()
        lab = {i: i % 4 for i in range(50)}
        for r in rows:
            assert r["neg_id"] != r["vec_id"]
            assert lab[r["neg_id"]] != lab[r["vec_id"]]

    def test_at_most_k_and_addressing_formula(self, spark):
        import hashlib

        from featuregenerator_spark.operators.sampling import negative_pairs

        n, k = 40, 3
        df = self._emb(spark, n)
        rows = negative_pairs(df, k=k).collect()
        per = {}
        for r in rows:
            per.setdefault(r["vec_id"], []).append((r["j"], r["neg_id"]))
        assert max(len(v) for v in per.values()) <= k
        # spot-check the address math against hashlib
        for vid, pairs in list(per.items())[:5]:
            for j, neg in pairs:
                h = hashlib.md5(f"neg:{vid}:{j}".encode()).hexdigest()[:8]
                assert neg == int(h, 16) % n
