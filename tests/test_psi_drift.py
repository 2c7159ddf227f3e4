"""PSI drift monitor: closed forms, smoothing, baseline requirement."""

import math

import pytest

from featuregenerator_spark.operators.feature_encoding import psi_drift


def _df(spark, rows):
    return spark.createDataFrame(rows, "cat string, value double")


def test_identical_windows_zero_psi(spark):
    rows = [("a", float(v)) for v in range(1, 101)]
    ref, cur = _df(spark, rows), _df(spark, rows)
    out = psi_drift(ref, cur, "value", "cat").collect()
    assert len(out) == 1 and out[0]["psi"] == 0.0


def test_shifted_window_flags_drift(spark):
    ref = _df(spark, [("a", float(v)) for v in range(1, 101)])
    cur = _df(spark, [("a", float(v + 200)) for v in range(1, 101)])
    psi = psi_drift(ref, cur, "value", "cat").first()["psi"]
    # everything lands in the top bin: severe shift, way past 0.25
    assert psi > 1.0


def test_closed_form_two_bins(spark):
    # single edge at the median: ref 50/50, cur 25/75
    ref = _df(spark, [("a", float(v)) for v in range(1, 101)])
    cur = _df(
        spark,
        [("a", 1.0)] * 25 + [("a", 1000.0)] * 75,
    )
    psi = psi_drift(ref, cur, "value", "cat", probs=(0.5,)).first()["psi"]
    want = (0.5 - 0.25) * math.log(0.5 / 0.25) + (0.5 - 0.75) * math.log(
        0.5 / 0.75
    )
    assert psi == pytest.approx(want, abs=2e-9)  # nano-quantized sum


def test_category_without_baseline_dropped(spark):
    ref = _df(spark, [("a", float(v)) for v in range(10)])
    cur = _df(spark, [("a", 1.0), ("b", 2.0)])
    cats = {r["cat"] for r in psi_drift(ref, cur, "value", "cat").collect()}
    assert cats == {"a"}  # 'b' has no reference edges -> no monitoring


def test_categorical_union_and_terms(spark):
    from featuregenerator_spark.operators.feature_encoding import (
        psi_drift_categorical,
    )

    ref = spark.createDataFrame(
        [("en",)] * 8 + [("de",)] * 2, "lang string"
    )
    cur = spark.createDataFrame(
        [("en",)] * 5 + [("fr",)] * 5, "lang string"
    )
    out = {
        r["lang"]: (r["p"], r["q"], r["term"])
        for r in psi_drift_categorical(ref, cur, "lang").collect()
    }
    assert set(out) == {"en", "de", "fr"}  # union of both windows
    p, q, term = out["en"]
    assert (p, q) == (0.8, 0.5)
    assert term == pytest.approx((0.8 - 0.5) * math.log(0.8 / 0.5), abs=2e-9)
    # vanished category: q clamps to eps -> large positive finite term
    assert out["de"][1] == 1e-6 and math.isfinite(out["de"][2])
    assert out["de"][2] > 1.0
    # new category: p clamps to eps
    assert out["fr"][0] == 1e-6 and out["fr"][2] > 1.0


def test_empty_bin_eps_smoothing_finite(spark):
    ref = _df(spark, [("a", float(v)) for v in range(1, 101)])
    cur = _df(spark, [("a", 50.0)] * 10)  # all mass in one bin
    psi = psi_drift(ref, cur, "value", "cat").first()["psi"]
    assert math.isfinite(psi) and psi > 0
