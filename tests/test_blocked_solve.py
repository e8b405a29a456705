"""Blocked big-D cholesky solve (core/solve.py::_blocked_cho_solve).

Rebuilds the reference solve semantics (`/root/reference/tensor/network.py:
293-327`) at flagship D: the XLA expander's single-rhs triangular solves are
latency-bound (~45 ms at D=16,200 on a v5e, benchmarks/chol_probe.py), so
above TNF_CHOL_BLOCKED_MIN the cholesky methods factor + substitute in
blocks. These tests pin the path to the default solve on CPU shapes small
enough to run in the suite.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensornetworksfork_tpu.core import solve as S


def _spd(D, seed=0, rank=None, ridge=5.0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((D, rank or max(64, D // 4))).astype(np.float32)
    return jnp.asarray(M @ M.T + ridge * np.eye(D, dtype=np.float32))


def test_substitute_matches_triangular_solve():
    D, block = 768, 128
    A = _spd(D, seed=1)
    L = jax.lax.linalg.cholesky(A, symmetrize_input=False)
    rhs = jnp.asarray(np.random.default_rng(2).standard_normal(D),
                      jnp.float32)
    y = jax.lax.linalg.triangular_solve(L, rhs[:, None], left_side=True,
                                        lower=True)
    ref = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                          transpose_a=True)[:, 0]
    got = S.blocked_cho_substitute(L, rhs, block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_substitute_ignores_upper_junk():
    """The masked substitution must never observe entries above the
    diagonal (the XLA Cholesky op leaves them unspecified)."""
    D, block = 512, 128
    A = _spd(D, seed=3)
    L = jax.lax.linalg.cholesky(A, symmetrize_input=False)
    rhs = jnp.asarray(np.random.default_rng(4).standard_normal(D),
                      jnp.float32)
    junk = L + jnp.triu(jnp.full((D, D), 7.0, jnp.float32), k=1)
    np.testing.assert_array_equal(
        np.asarray(S.blocked_cho_substitute(L, rhs, block)),
        np.asarray(S.blocked_cho_substitute(junk, rhs, block)))


def test_blocked_cholesky_matches_lax():
    D, block = 640, 128
    A = _spd(D, seed=5)
    ref = np.linalg.cholesky(np.asarray(A, np.float64))
    got = S.blocked_cholesky(A, block, jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)
    # exact-zero upper triangle (contract used by the substitution)
    assert not np.triu(np.asarray(got), k=1).any()


@pytest.mark.parametrize("D", [1500, 1536])  # pad branch + exact multiple
def test_solve_block_blocked_path_matches_default(monkeypatch, D):
    A = _spd(D, seed=6)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(D), jnp.float32)
    node = jnp.asarray(rng.standard_normal(D), jnp.float32)
    x_ref, ok_ref = S.solve_block(A, b, node, "ridge_cholesky", 1e-3)
    monkeypatch.setenv("TNF_CHOL_BLOCKED_MIN", "1024")
    monkeypatch.setenv("TNF_CHOL_BLOCK", "256")
    monkeypatch.setenv("TNF_CHOL_PRECISION", "default")
    for sub in ("0", "1"):  # trsv tail and the blocked-substitution tail
        monkeypatch.setenv("TNF_CHOL_SUB", sub)
        x, ok = S.solve_block(A, b, node, "ridge_cholesky", 1e-3)
        assert bool(ok) and bool(ok_ref)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   rtol=5e-4, atol=5e-4)


def test_solve_block_blocked_path_ok_flag_on_indefinite(monkeypatch):
    monkeypatch.setenv("TNF_CHOL_BLOCKED_MIN", "1024")
    monkeypatch.setenv("TNF_CHOL_BLOCK", "256")
    monkeypatch.setenv("TNF_CHOL_PRECISION", "default")
    D = 1280
    A = -jnp.eye(D, dtype=jnp.float32)
    b = jnp.ones(D, jnp.float32)
    x, ok = S.solve_block(A, b, jnp.zeros(D, jnp.float32), "cholesky", 0.0)
    assert not bool(ok)


def test_chol_blocked_kill_switch(monkeypatch):
    monkeypatch.setenv("TNF_CHOL_BLOCKED", "0")
    assert S._chol_blocked_min() > 10 ** 9
