"""Covariance / PCA (operators/linalg.py).

The covariance relation is driver-oracled (embeddings_covariance); here we
pin the eigensolve+projection half: numpy differential on the covariance,
PCA invariants (orthonormal components, variance ordering, projection
equals centered-dot-product), and guardrails.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_order_book_spark.operators import linalg


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(11)
    # anisotropic cloud: PCA has a well-separated spectrum
    base = rng.randn(200, 6) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    rows = [(i, [float(np.float32(x)) for x in base[i]]) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_covariance_matches_numpy(spark, vecs):
    df, base = vecs
    got = {(r["i"], r["j"]): r["cov"] for r in
           linalg.covariance_matrix(df, dim=6).collect()}
    x = np.array([[np.float64(np.float32(v)) for v in row] for row in base])
    ref = np.cov(x, rowvar=False, ddof=1)
    assert len(got) == 21
    for (i, j), c in got.items():
        assert abs(c - ref[i, j]) < 2e-6


def test_pca_fit_invariants(spark, vecs):
    df, _ = vecs
    comps, ev, means = linalg.pca_fit(df, dim=6, n_components=3)
    c = np.array(comps)
    # orthonormal rows
    assert np.allclose(c @ c.T, np.eye(3), atol=1e-9)
    # descending explained variance, dominated by the planted axes
    assert ev[0] > ev[1] > ev[2] > 0
    assert ev[0] > 15  # planted sd=5 -> var ~25
    # deterministic sign: largest-|.| entry positive
    for row in c:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_pca_project_equals_centered_dot(spark, vecs):
    df, _ = vecs
    comps, _, means = linalg.pca_fit(df, dim=6, n_components=2)
    got = {r["vec_id"]: list(r["pca"]) for r in
           linalg.pca_project(df, comps, means).collect()}
    pdf = df.toPandas().set_index("vec_id")
    for vid, proj in list(got.items())[:20]:
        x = np.array([np.float64(v) for v in pdf.loc[vid, "embedding"]])
        ref = (np.array(comps) @ (x - np.array(means)))
        assert np.allclose(proj, ref, atol=1e-9)


def test_guardrails(spark, vecs):
    df, _ = vecs
    with pytest.raises(ValueError, match="dim must be > 0"):
        linalg.covariance_matrix(df, dim=0)
    with pytest.raises(ValueError, match="max_pairs"):
        linalg.covariance_matrix(df, dim=1000, max_pairs=10)
    with pytest.raises(ValueError, match="n_components"):
        linalg.pca_fit(df, dim=6, n_components=7)
    with pytest.raises(ValueError, match="dimensionality"):
        linalg.pca_project(df, [[1.0, 0.0]], [0.0, 0.0, 0.0])


def test_covariance_sign_normalized_zero(spark):
    """A covariance whose exact value is a tiny negative must emit +0.0
    after hash_stable_double (r7 driver red: Spark round() emitted +0.0
    where DuckDB emitted -0.0 for cov(5,9); both renderings now
    sign-normalize so neither engine can ship -0.0)."""
    import math

    # Two dims engineered so cov(0,1) is a tiny negative (-1e-9): dim 1 is
    # anti-correlated with dim 0 at 1e-9 amplitude — rounds to zero at 1e-6
    # and would keep the sign bit without normalization.
    rows = [
        (0, [1.0, 1e-9]),
        (1, [2.0, 0.0]),
        (2, [3.0, -1e-9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["i"], r["j"]): r["cov"]
           for r in linalg.covariance_matrix(df, dim=2).collect()}
    v = got[(0, 1)]
    assert v == 0.0
    assert math.copysign(1.0, v) == 1.0, f"-0.0 leaked: {v!r}"


def test_hash_stable_double_normalizes_negative_zero(spark):
    from polars_order_book_spark.functions.conversion import (
        hash_stable_double, hash_stable_double_sql)
    import math

    df = spark.createDataFrame([(-1e-9,), (1.5,), (-2.25,)], "x double")
    out = [r[0] for r in df.select(hash_stable_double("x", 6)).collect()]
    assert out == [0.0, 1.5, -2.25]
    assert math.copysign(1.0, out[0]) == 1.0
    import duckdb

    dv = duckdb.sql(
        f"SELECT {hash_stable_double_sql('-0.0000000001', 6)}"
    ).fetchone()[0]
    assert dv == 0.0 and math.copysign(1.0, dv) == 1.0


def test_gate_is_zero_sign_sensitive():
    """tools/check_correctness.compare must red-flag a deliberate -0.0."""
    import pandas as pd
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.check_correctness import compare

    a = pd.DataFrame({"x": [0.0, 1.5]})
    b = pd.DataFrame({"x": [-0.0, 1.5]})
    assert compare("t", a, b), "gate blind to -0.0 vs +0.0"
    assert not compare("t", a.copy(), a.copy())


def test_covariance_rejects_null_or_short_vectors(spark):
    """r8 self-review: a NULL (or shorter-than-dim) vector previously
    inflated n while its NULL products were skipped by sum() — every cell
    silently skewed by a different amount. Now loud."""
    rows = [([1.0, 2.0],), ([3.0, 4.0],), (None,)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    with pytest.raises(Exception, match="shorter-than-dim|NULL"):
        linalg.covariance_matrix(df, dim=2).collect()
    short = spark.createDataFrame([([1.0, 2.0],), ([3.0],)],
                                  "embedding array<double>")
    with pytest.raises(Exception, match="shorter-than-dim|NULL"):
        linalg.covariance_matrix(short, dim=2).collect()
    # clean input: exact sample covariance of [[1,2],[3,4]] is 2.0 per cell
    clean = spark.createDataFrame([([1.0, 2.0],), ([3.0, 4.0],)],
                                  "embedding array<double>")
    got = {(r["i"], r["j"]): r["cov"] for r in
           linalg.covariance_matrix(clean, dim=2).collect()}
    assert got == {(0, 0): 2.0, (0, 1): 2.0, (1, 1): 2.0}
