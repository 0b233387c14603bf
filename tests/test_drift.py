"""drift_metrics known answers: identical distributions score ~zero,
a shifted distribution scores positive PSI and the exact KS, one-sided
groups report NULLs, and the fold replays a pure-Python PSI."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from osprey_spark.operators.sketches import drift_metrics, py_hist_bin


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, v long, cur boolean")


def _expected_psi(vals_ref, vals_cur):
    bins = {}
    for v in vals_ref:
        b = py_hist_bin(v)
        bins.setdefault(b, [0, 0])[0] += 1
    for v in vals_cur:
        b = py_hist_bin(v)
        bins.setdefault(b, [0, 0])[1] += 1
    nb = len(bins)
    rn, cn = len(vals_ref), len(vals_cur)
    psi = 0.0
    for b in sorted(bins):
        rc, cc = bins[b]
        p = (rc + 1) / (rn + nb)
        q = (cc + 1) / (cn + nb)
        psi += (p - q) * math.log(p / q)
    return round(psi, 6)


def test_identical_distributions_zero(spark):
    rows = [("a", v, cur) for cur in (False, True) for v in (1, 2, 4, 8, 100)]
    out = drift_metrics(
        _df(spark, rows), F.col("v"), F.col("cur"), ["grp"]
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.ref_n, r.cur_n) == (5, 5)
    assert r.psi == 0.0
    assert r.ks == 0.0


def test_shifted_distribution_known_ks(spark):
    # ref all small (bin of 1), cur all large (bin of 1000): total
    # separation -> KS = 1.0 exactly (integer numerator = rn*cn)
    rows = [("a", 1, False)] * 4 + [("a", 1000, True)] * 4
    out = drift_metrics(
        _df(spark, rows), F.col("v"), F.col("cur"), ["grp"]
    ).collect()[0]
    assert out.ks == 1.0
    assert out.n_bins == 2
    assert out.psi == _expected_psi([1] * 4, [1000] * 4)
    assert out.psi > 1.0  # decisive drift on the PSI>0.25 rule of thumb


def test_partial_shift_matches_python_replay(spark):
    ref = [1, 2, 3, 4, 5, 17, 33, 120, 121, 250]
    cur = [1, 2, 3, 64, 65, 66, 120, 500, 501, 502]
    rows = [("a", v, False) for v in ref] + [("a", v, True) for v in cur]
    out = drift_metrics(
        _df(spark, rows), F.col("v"), F.col("cur"), ["grp"]
    ).collect()[0]
    assert out.psi == _expected_psi(ref, cur)
    # KS replay: shared sorted bin axis, exact integer numerator
    bins = sorted({py_hist_bin(v) for v in ref + cur})
    cum_r = cum_c = 0
    num = 0
    for b in bins:
        cum_r += sum(1 for v in ref if py_hist_bin(v) == b)
        cum_c += sum(1 for v in cur if py_hist_bin(v) == b)
        num = max(num, abs(cum_r * len(cur) - cum_c * len(ref)))
    assert out.ks == round(num / (len(ref) * len(cur)), 6)


def test_one_sided_group_nulls(spark):
    rows = [("only_ref", 5, False), ("only_cur", 5, True),
            ("both", 5, False), ("both", 5, True)]
    out = {r.grp: r for r in drift_metrics(
        _df(spark, rows), F.col("v"), F.col("cur"), ["grp"]
    ).collect()}
    assert out["only_ref"].psi is None and out["only_ref"].ks is None
    assert out["only_cur"].psi is None and out["only_cur"].ks is None
    assert out["both"].psi == 0.0 and out["both"].ks == 0.0


def test_null_and_zero_values_underflow_bin(spark):
    # NULL/<=0 land in the underflow bin and still count toward n
    rows = [("a", None, False), ("a", 0, False), ("a", 7, False),
            ("a", None, True), ("a", 0, True), ("a", 7, True)]
    out = drift_metrics(
        _df(spark, rows), F.col("v"), F.col("cur"), ["grp"]
    ).collect()[0]
    assert (out.ref_n, out.cur_n) == (3, 3)
    assert out.psi == 0.0 and out.ks == 0.0
