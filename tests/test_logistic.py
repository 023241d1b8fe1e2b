"""Distributed IRLS logistic regression vs a local numpy reference."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rastertiler_rs_ray.pipelines.ann import logistic_irls


def _local_irls(X, y, iters=8, ridge=1e-9):
    d = X.shape[1]
    beta = np.zeros(d)
    for _ in range(iters):
        eta = X @ beta
        p = 1.0 / (1.0 + np.exp(-eta))
        w = np.maximum(p * (1.0 - p), 1e-9)
        z = eta + (y - p) / w
        Xw = X * w[:, None]
        beta = np.linalg.solve(X.T @ Xw + ridge * np.eye(d), Xw.T @ z)
    return beta


def test_logistic_irls_matches_local(ray_session):
    rng = np.random.default_rng(19)
    n = 4000
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    true_beta = np.array([-0.5, 2.0, -1.0])
    p = 1.0 / (1.0 + np.exp(-(true_beta[0] + true_beta[1] * x1 + true_beta[2] * x2)))
    y = (rng.random(n) < p).astype(np.float64)
    tbl = pa.table({"x1": pa.array(x1), "x2": pa.array(x2), "y": pa.array(y)})
    ds = ray.data.from_arrow(tbl).repartition(7)
    beta, n_rows = logistic_irls(ds, ["x1", "x2"], "y", iters=8)
    assert n_rows == n
    X = np.column_stack([np.ones(n), x1, x2])
    ref = _local_irls(X, y, iters=8)
    # identical algorithm, different partial-sum order → tiny float drift
    assert np.allclose(beta, ref, atol=1e-7)
    # and the fit actually recovered the generating model
    assert np.allclose(beta, true_beta, atol=0.25)
