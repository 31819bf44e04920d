"""Numpy property tests for the embedding second-moment tier — the
coverage VERDICT r09 flagged as the only operator module with none.

The operators quantize cross-row sum terms (9dp products, DECIMAL
accumulation) for cross-engine bit-exactness, so against exact numpy
the tolerance is the quantization error (~1e-6 scale), not epsilon.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.operators import embeddings

DIM = 6
N = 48


@pytest.fixture(scope="module")
def xmat():
    """Deterministic corpus with a planted dominant direction (large
    eigengap, so 8 power iterations converge far past the comparison
    tolerance: (lam2/lam1)^8 residual)."""
    rng = np.random.default_rng(7)
    direction = rng.normal(size=DIM)
    direction /= np.linalg.norm(direction)
    strength = rng.normal(size=(N, 1)) * 5.0
    noise = rng.normal(size=(N, DIM)) * 0.3
    return strength * direction + noise + rng.normal(size=DIM)


@pytest.fixture(scope="module")
def vecs_df(spark, xmat):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(xmat)]
    return spark.createDataFrame(rows, "vec_id: bigint, embedding: array<double>")


def test_covariance_matches_numpy(vecs_df, xmat):
    got = {
        (r.dim_i, r.dim_j): r.cov
        for r in embeddings.embedding_covariance(
            vecs_df, "vec_id", "embedding"
        ).collect()
    }
    assert len(got) == DIM * (DIM + 1) // 2  # upper triangle only
    expect = np.cov(xmat.T, bias=True)  # population covariance
    for (i, j), cov in got.items():
        assert i <= j
        assert cov == pytest.approx(expect[i - 1, j - 1], abs=5e-6)
    # diagonal = variances, non-negative
    assert all(got[(i, i)] >= 0 for i in range(1, DIM + 1))


def test_pca_scores_match_numpy_projection(vecs_df, xmat):
    got = {
        r.vec_id: r.pc1
        for r in embeddings.pca_top_component_scores(
            vecs_df, "vec_id", "embedding", iters=8
        ).collect()
    }
    assert len(got) == N
    cov = np.cov(xmat.T, bias=True)
    w, v = np.linalg.eigh(cov)
    top = v[:, -1]
    centered = xmat - xmat.mean(axis=0)
    proj = centered @ top
    scores = np.array([got[i] for i in range(N)])
    # eigenvector sign is arbitrary in numpy; the operator pins it via
    # the all-positive init — align on the better-correlated sign
    if np.dot(scores, proj) < 0:
        proj = -proj
    tol = 1e-3 * float(np.abs(proj).max())
    assert np.allclose(scores, proj, atol=tol)


def test_pca_scores_never_emit_negative_zero(vecs_df):
    """The round-9 driver red: repr(-0.0) != repr(0.0) under the
    driver's hash. Both emitted relations must canonicalize zeros."""
    for r in embeddings.pca_top_component_scores(
        vecs_df, "vec_id", "embedding", iters=2
    ).collect():
        if r.pc1 == 0.0:
            assert repr(r.pc1) == "0.0"


def test_covariance_never_emits_negative_zero(spark):
    """Orthogonal indicator vectors make every off-diagonal covariance
    a tiny negative (-mu_i*mu_j) that rounds to zero at 6dp — the exact
    -0.0 shape DuckDB's ROUND emitted in round 9."""
    n = 2000
    rows = [
        (i, [1e-6 if i % 2 == 0 else 0.0, 1e-6 if i % 2 == 1 else 0.0])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id: bigint, embedding: array<double>")
    for r in embeddings.embedding_covariance(df, "vec_id", "embedding").collect():
        if r.cov == 0.0:
            assert repr(r.cov) == "0.0", f"({r.dim_i},{r.dim_j}) emitted -0.0"


def test_pca_empty_input_returns_typed_empty(spark):
    empty = spark.createDataFrame([], "vec_id: bigint, embedding: array<double>")
    out = embeddings.pca_top_component_scores(empty, "vec_id", "embedding")
    assert out.columns == ["vec_id", "pc1"]
    assert out.count() == 0


def test_pca_rejects_nonpositive_iters(vecs_df):
    with pytest.raises(ValueError):
        embeddings.pca_top_component_scores(vecs_df, "vec_id", "embedding", iters=0)


def test_covariance_plan_is_zero_join_aggregate(vecs_df):
    """Scale shape: the corpus-side plan is explode -> partial agg ->
    exchange of d(d+1)/2 rows per task — the only joins are against
    the broadcast d-row marginals, never corpus x corpus."""
    plan = embeddings.embedding_covariance(
        vecs_df, "vec_id", "embedding"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
