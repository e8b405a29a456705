"""ε-ladder oracle tests for the solve numerics tiers (VERDICT r04 #2).

The reference solves every local system in torch float64 and its sweep/search
corners push ε to 1e-12 (`/root/reference/tensor/module.py:107,123` —
geomspace eps_start=eps_end=1e-12; `/root/reference/tensor/network.py:293-327`
runs np.linalg under f64). TPUs have no fast f64, so this framework offers
three solve tiers (core/solve.py, docs/DESIGN.md "Solve numerics tiers"):

  f32          device Cholesky in the params dtype (default)
  f32+refine   one f32 iterative-refinement pass (refine=True)
  f64 host     solve_dtype="float64": rescale+ridge+factor+solve rerun on the
               host in f64 via jax.pure_callback — the ridge is APPLIED in
               f64, so ε below the f32 floor is meaningful again

These tests pin the measured behaviour on a spectrum-controlled SPD ladder
(cond(A) ~ 1e8, eigenvalues logspace): the f32 forward error tracks
cond(A+2εI)·u_f32 and saturates once 2ε falls below f32 resolution; refine
does not rescue it (the residual itself carries f32 rounding); the f64 host
tier tracks a numpy-f64 oracle of the same f32-cast system to ~1e-7 at EVERY
ε down to 1e-12. The "fixed corner": at cond ~ 1e9, ε=1e-12, f32 Cholesky
fails outright (ok=False — the sweep's singular abort) while the f64 tier
factors the same matrix and matches the oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensornetworksfork_tpu.core.solve import solve_block

# The f64 tier runs through jax.pure_callback, which the axon TPU backend
# does not implement (UNIMPLEMENTED host send/recv) — the Sweeper raises
# early there with guidance (core/sweep.py). The ladder itself is
# platform-independent numerics, so the whole module runs on CPU only.
pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="f64 host-solve tier needs host callbacks (axon backend lacks "
           "them; the Sweeper raises early there)")

EPS_LADDER = [1e-3, 1e-6, 1e-9, 1e-12]


def _spd(D, cond_exp, seed):
    """SPD with eigenvalues logspace(0, -cond_exp) — exact condition control."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((D, D)))
    ev = np.logspace(0.0, -cond_exp, D)
    A = (Q * ev) @ Q.T
    return (A + A.T) / 2.0


def _oracle(A32, b32, eps):
    """numpy-f64 oracle reproducing solve_block's exact semantics
    (diag-mean rescale, then 2ε ridge) on the f32-cast system."""
    A = np.asarray(A32, np.float64)
    b = np.asarray(b32, np.float64)
    s = np.abs(np.diag(A)).mean()
    A, b = A / s, b / s
    A = A + 2.0 * eps * np.eye(A.shape[0])
    return np.linalg.solve(A, -b)


def _ladder_errors(cond_exp=8.0, D=64, seed=0, **solve_kw):
    A64 = _spd(D, cond_exp, seed)
    rng = np.random.default_rng(seed + 100)
    b64 = -(A64 @ rng.standard_normal(D))
    A = jnp.asarray(A64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    nv = jnp.zeros(D, jnp.float32)
    out = {}
    for eps in EPS_LADDER:
        xo = _oracle(A, b, eps)
        st, ok = solve_block(A, b, nv, "ridge_cholesky", eps, **solve_kw)
        err = float(np.linalg.norm(np.asarray(st, np.float64) - xo)
                    / np.linalg.norm(xo))
        out[eps] = (err, bool(ok))
    return out


class TestLadderVsOracle:
    def test_f32_tier_tracks_cond_and_saturates(self):
        errs = _ladder_errors()
        # supported regime: moderate effective condition number
        assert errs[1e-3][1] and errs[1e-3][0] < 1e-3
        # ε at/below the f32 floor: error is dominated by cond(A)·u_f32 and
        # stops responding to ε (the documented floor, DESIGN.md)
        assert errs[1e-9][0] > 1e-2
        assert errs[1e-12][0] > 1e-2
        assert errs[1e-12][0] == pytest.approx(errs[1e-9][0], rel=0.5)

    def test_refine_does_not_beat_the_floor(self):
        base = _ladder_errors()
        ref = _ladder_errors(refine=True)
        # refine may polish the well-conditioned end a bit...
        assert ref[1e-3][0] < 5 * base[1e-3][0]
        # ...but cannot recover deep-ε accuracy (measured: same magnitude)
        assert ref[1e-12][0] > 1e-2

    def test_f64_host_tier_tracks_oracle_at_every_eps(self):
        errs = _ladder_errors(solve_dtype="float64")
        for eps in EPS_LADDER:
            err, ok = errs[eps]
            assert ok, f"f64 tier not ok at eps={eps}"
            assert err < 1e-6, f"f64 tier err {err} at eps={eps}"

    def test_fixed_corner_f32_aborts_f64_solves(self):
        """cond ~ 1e9, ε=1e-12: BEFORE solve_dtype existed this system was
        unsolvable (f32 Cholesky ok=False → sweep singular abort, the
        reference's LinAlgError path); the f64 tier factors it and matches
        the oracle."""
        D = 96
        A64 = _spd(D, 9.0, seed=2)
        rng = np.random.default_rng(3)
        b64 = -(A64 @ rng.standard_normal(D))
        A = jnp.asarray(A64, jnp.float32)
        b = jnp.asarray(b64, jnp.float32)
        nv = jnp.zeros(D, jnp.float32)
        _, ok32 = solve_block(A, b, nv, "ridge_cholesky", 1e-12)
        assert not bool(ok32)
        st, ok64 = solve_block(A, b, nv, "ridge_cholesky", 1e-12,
                               solve_dtype="float64")
        assert bool(ok64)
        xo = _oracle(A, b, 1e-12)
        err = float(np.linalg.norm(np.asarray(st, np.float64) - xo)
                    / np.linalg.norm(xo))
        assert err < 1e-5

    def test_f64_ridge_semantics_match_f32_in_supported_regime(self):
        """Where f32 is healthy (cond ~ 1e3, ε=1e-3) the two tiers must agree
        — same rescale/ridge/rhs semantics, different arithmetic only."""
        errs32 = _ladder_errors(cond_exp=3.0, seed=5)
        errs64 = _ladder_errors(cond_exp=3.0, seed=5, solve_dtype="float64")
        assert abs(errs32[1e-3][0] - errs64[1e-3][0]) < 1e-4

    def test_ridge_trace_and_exact_methods_f64(self):
        D = 32
        A64 = _spd(D, 4.0, seed=7)
        rng = np.random.default_rng(8)
        b64 = -(A64 @ rng.standard_normal(D))
        A = jnp.asarray(A64, jnp.float32)
        b = jnp.asarray(b64, jnp.float32)
        nv = jnp.asarray(rng.standard_normal(D), jnp.float32)
        for method in ("ridge_exact", "ridge_trace", "exact", "cholesky"):
            s32, ok32 = solve_block(A, b, nv, method, 1e-4)
            s64, ok64 = solve_block(A, b, nv, method, 1e-4,
                                    solve_dtype="float64")
            assert bool(ok32) and bool(ok64)
            # f32 vs f64 arithmetic at cond ~1e4: expect ~cond·u_f32 ≈ 1e-3
            np.testing.assert_allclose(np.asarray(s32), np.asarray(s64),
                                       rtol=1e-2, atol=1e-4)

    def test_bad_solve_dtype_rejected(self):
        A = jnp.eye(4)
        b = jnp.ones(4)
        with pytest.raises(ValueError):
            solve_block(A, b, b, "ridge_cholesky", 1e-3, solve_dtype="bf16")


class TestEndToEnd:
    @staticmethod
    def _collinear_problem():
        rng = np.random.default_rng(11)
        X = rng.standard_normal((128, 4))
        X[:, 3] = X[:, 2] + 1e-5 * rng.standard_normal(128)  # near-collinear
        y = X @ np.array([1.0, -2.0, 0.5, 0.5]) + 0.01 * rng.standard_normal(128)
        return X, y

    def test_estimator_f32_aborts_at_deep_eps_with_hint(self):
        """ε=1e-12 on a near-collinear problem: the f32 sweep hits the
        singular abort and emits the actionable solve_dtype hint."""
        from tensornetworksfork_tpu.models.estimators import (
            TensorTrainRegressor)
        X, y = self._collinear_problem()
        m = TensorTrainRegressor(N=2, r=3, num_swipes=4, eps_start=1e-12,
                                 eps_decay=1.0, early_stopping=0, verbose=0)
        with pytest.warns(RuntimeWarning, match="solve_dtype"):
            m.fit(X, y, validation_split=0.2)

    def test_estimator_solve_dtype_survives_deep_eps(self):
        """Same problem, solve_dtype='float64' (kwarg → SweepConfig →
        solve_block): no singular abort at ε=1e-12 — the f64 ridge is real
        — and at ε=1e-6 the fit converges."""
        import warnings
        from tensornetworksfork_tpu.models.estimators import (
            TensorTrainRegressor)
        X, y = self._collinear_problem()
        m = TensorTrainRegressor(N=2, r=3, num_swipes=4, eps_start=1e-12,
                                 eps_decay=1.0, solve_dtype="float64",
                                 early_stopping=0, verbose=0)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            m.fit(X, y, validation_split=0.2)
        assert np.isfinite(np.asarray(m.predict(X))).all()

        m2 = TensorTrainRegressor(N=2, r=3, num_swipes=10, eps_start=1e-6,
                                  eps_decay=1.0, solve_dtype="float64",
                                  early_stopping=0, verbose=0)
        m2.fit(X, y, validation_split=0.2)
        pred = np.asarray(m2.predict(X)).ravel()
        ss = 1 - ((pred - y) ** 2).sum() / ((y - y.mean()) ** 2).sum()
        assert ss > 0.9

    def test_estimator_refine_plumbed(self):
        from tensornetworksfork_tpu.models.estimators import (
            TensorTrainRegressor)
        rng = np.random.default_rng(12)
        X = rng.standard_normal((64, 3))
        y = X.sum(axis=1)
        m = TensorTrainRegressor(N=2, r=2, num_swipes=2, refine=True,
                                 early_stopping=0, verbose=0)
        m.fit(X, y, validation_split=0.2)
        assert np.isfinite(np.asarray(m.predict(X))).all()

    def test_runconfig_fields_exist(self):
        from tensornetworksfork_tpu.utils.config import RunConfig
        cfg = RunConfig()
        assert cfg.refine is False and cfg.solve_dtype is None
        cfg2 = cfg.merge({"refine": True, "solve_dtype": "float64"})
        assert cfg2.refine is True and cfg2.solve_dtype == "float64"
