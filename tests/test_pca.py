"""In-engine PCA power iteration."""

from __future__ import annotations

import math

import pytest

from osprey_spark.operators.similarity import pca_power, pca_power_fit


def _vecs(spark, rows):
    data = [(i, [float(x) for x in v]) for i, v in enumerate(rows)]
    return spark.createDataFrame(data, "vec_id long, embedding array<float>")


def test_pca_dominant_direction_known_answer(spark):
    """Points spread along (0.6, 0.8) with tiny orthogonal jitter:
    the top PC is that direction (sign fixed by v0 = e1) and the
    eigenvalue is the variance along it."""
    rows = []
    for i in range(-5, 6):
        t = i / 10.0
        rows.append([0.6 * t + 0.001, 0.8 * t])
        rows.append([0.6 * t - 0.001, 0.8 * t])
    v, lam, _ = pca_power_fit(_vecs(spark, rows), dim=2, iterations=20)
    assert abs(v[0] - 0.6) < 1e-3 and abs(v[1] - 0.8) < 1e-3
    # variance of t over i/10 grid, scaled by |dir|^2 = 1
    ts = [i / 10.0 for i in range(-5, 6) for _ in range(2)]
    mean_t = sum(ts) / len(ts)
    var = sum((t - mean_t) ** 2 for t in ts) / len(ts)
    assert abs(lam - var) < 1e-4


def test_pca_matches_python_replica_and_partition_invariance(spark):
    """Exact (bit-level) agreement with a pure-Python replica of the
    quantized trajectory, identical at 1 and 7 partitions."""
    rows = [
        [math.sin(i * 0.7) * 0.5, math.cos(i * 1.3) * 0.3, (i % 5 - 2) * 0.1]
        for i in range(50)
    ]
    dim, iters, quant = 3, 6, 10**9

    def _round_half_away(x):
        from decimal import ROUND_HALF_UP, Decimal

        return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))

    # replica — mirrors every quantization and association order
    import numpy as np

    qx = [[float(np.float32(x)) for x in r[:dim]] for r in rows]
    qi = [[round(x * 1e6) for x in r] for r in qx]  # banker's? see below
    # Spark/DuckDB round() is half-away-from-zero; python round() is
    # half-even — x*1e6 here never lands exactly on .5 for these inputs
    n = len(rows)
    nd = float(n)
    mean = [sum(r[j] for r in qi) / (nd * 1e6) for j in range(dim)]
    v = [1.0] + [0.0] * (dim - 1)
    for _ in range(iters):
        sums = [0] * dim
        for r in qi:
            cent = [(r[j] / 1e6) - mean[j] for j in range(dim)]
            s = v[0] * cent[0]
            for j in range(1, dim):
                s = s + v[j] * cent[j]
            for j in range(dim):
                val = (s * cent[j]) * float(quant)
                q = math.floor(val + 0.5) if val >= 0 else math.ceil(val - 0.5)
                sums[j] += q
        u = [sums[j] / (nd * float(quant)) for j in range(dim)]
        ss = u[0] * u[0]
        for j in range(1, dim):
            ss = ss + u[j] * u[j]
        norm = math.sqrt(ss)
        v = [u[j] / norm for j in range(dim)]

    df1 = _vecs(spark, rows).coalesce(1)
    df7 = _vecs(spark, rows).repartition(7)
    v1, _, _ = pca_power_fit(df1, dim=dim, iterations=iters, quant=quant)
    v7, _, _ = pca_power_fit(df7, dim=dim, iterations=iters, quant=quant)
    assert v1 == v7  # partition-order independence, bitwise
    for j in range(dim):
        assert v1[j] == pytest.approx(v[j], abs=1e-12)


def test_pca_frame_output_shape(spark):
    out = pca_power(_vecs(spark, [[1.0, 0.0], [-1.0, 0.0], [0.5, 0.0]]), dim=2)
    rows = out.collect()
    assert [r.dim_idx for r in rows] == [0, 1]
    assert abs(abs(rows[0].loading) - 1.0) < 1e-9
    assert rows[0].eigval == rows[1].eigval


def test_pca_validation(spark):
    df = _vecs(spark, [[0.0, 0.0]])
    with pytest.raises(ValueError, match="iterations"):
        pca_power_fit(df, dim=2, iterations=0)
    with pytest.raises(ValueError, match="dim"):
        pca_power_fit(df, dim=0)
    with pytest.raises(ValueError, match="zero-variance"):
        pca_power_fit(_vecs(spark, [[0.5, 0.5], [0.5, 0.5]]), dim=2)
    with pytest.raises(ValueError, match="empty"):
        pca_power_fit(df.filter("vec_id = 99"), dim=2)


def test_pca_outliers_planted_orthogonal_point(spark):
    """A cloud along one axis + one point far off-axis: the planted
    point tops the residual ranking with resid2 ~ its offset^2."""
    from osprey_spark.operators.similarity import pca_outliers

    rows = [[i / 10.0, 0.001 * (i % 3 - 1)] for i in range(-5, 6)]
    rows.append([0.0, 0.8])  # vec_id 11: orthogonal outlier
    out = pca_outliers(_vecs(spark, rows), dim=2, iterations=15, k=3).collect()
    assert out[0].vec_id == 11
    # centered squared distance of the planted point, minus ~0 projection
    mean_y = (sum(0.001 * (i % 3 - 1) for i in range(-5, 6)) + 0.8) / 12
    assert abs(out[0].resid2 - (0.8 - mean_y) ** 2) < 0.01
    assert out[0].resid2 > 10 * out[1].resid2


def test_pca_outliers_k_and_determinism(spark):
    from osprey_spark.operators.similarity import pca_outliers

    rows = [[i / 10.0, ((i * 7) % 5 - 2) / 50.0] for i in range(20)]
    a = pca_outliers(_vecs(spark, rows), dim=2, iterations=6, k=5).collect()
    b = pca_outliers(
        _vecs(spark, rows).repartition(7), dim=2, iterations=6, k=5
    ).collect()
    assert a == b and len(a) == 5
    import pytest as _pt

    with _pt.raises(ValueError, match="k must"):
        pca_outliers(_vecs(spark, rows), dim=2, k=0)
