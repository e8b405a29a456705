"""Matrix-free tier oracles (SURVEY.md §4): Krylov solvers vs dense solve,
fused Gram matvec vs materialised A, iterative sweep convergence."""
import numpy as np
import jax
import jax.numpy as jnp

from tensornetworksfork_tpu.core import krylov
from tensornetworksfork_tpu.core.sweep import SweepConfig, accumulating_sweep
from tensornetworksfork_tpu.models.layers import TensorTrainLayer
from tensornetworksfork_tpu.ops.bregman import SquareBregFunction


def _spd(n, seed):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n)).astype(np.float32)
    return M @ M.T + n * np.eye(n, dtype=np.float32)


def test_cg_matches_dense():
    A = _spd(12, 0)
    b = np.random.default_rng(1).standard_normal(12).astype(np.float32)
    x, k = krylov.cg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                     maxiter=100, tol=1e-6)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-3, atol=1e-3)
    assert int(k) <= 100


def test_minres_matches_dense_indefinite():
    rng = np.random.default_rng(2)
    M = rng.standard_normal((10, 10)).astype(np.float32)
    A = (M + M.T) + 0.1 * np.eye(10, dtype=np.float32)  # symmetric indefinite
    b = rng.standard_normal(10).astype(np.float32)
    x, _ = krylov.minres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                         maxiter=200, tol=1e-7)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=2e-2, atol=2e-2)


def test_lanczos_galerkin_matches_dense():
    A = _spd(8, 3)
    b = np.random.default_rng(4).standard_normal(8).astype(np.float32)
    x = krylov.lanczos_galerkin(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                                jnp.zeros(8), maxiter=8, tol=1e-8)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-2, atol=1e-2)


def test_fused_gram_matvec_matches_dense_A():
    """Jᴴ H (J v) via fused contractions == A @ v with materialised A."""
    layer = TensorTrainLayer(3, 3, 3, output_shape=(2,), seed=0)
    net = layer.network
    t = net.topology
    x = jnp.asarray(np.random.default_rng(5).standard_normal((7, 3)), jnp.float32)
    inputs = net.bind_inputs(x)
    params = layer.params
    envs_l = net.env_chain(params, inputs, "left")
    envs_r = net.env_chain(params, inputs, "right")
    ni = t.main_nodes[1]
    L, R = envs_l[0], envs_r[2]
    ops = net.jacobian_operands(ni, params, inputs, L, R)
    J = net.jacobian(ni, params, inputs, L, R)
    pred = net.predict_from_jacobian(ni, J, params[t.nodes[ni].name])
    _, g, H = SquareBregFunction()(pred, jnp.zeros_like(pred))
    A, b = net.gram_and_rhs(ni, J, g, H)
    D = b.size
    v = jnp.asarray(np.random.default_rng(6).standard_normal(b.shape), jnp.float32)

    Jv = net.jacobian_apply(ni, ops, v)
    coeff = net.hessian_apply(H, Jv)
    Av_fused = net.jacobian_transpose_apply(ni, ops, coeff)
    Av_dense = np.asarray(A).reshape(D, D) @ np.asarray(v).reshape(D)
    np.testing.assert_allclose(np.asarray(Av_fused).reshape(D), Av_dense,
                               rtol=1e-3, atol=1e-3)
    # b path: Jᴴ g
    b_fused = net.jacobian_transpose_apply(ni, ops, g)
    np.testing.assert_allclose(np.asarray(b_fused), np.asarray(b),
                               rtol=1e-3, atol=1e-3)


def test_iterative_sweep_cg_converges():
    """cg-method sweep solves the same local systems as the dense path."""
    rng = np.random.default_rng(7)
    S, f = 128, 4
    X = np.concatenate([rng.standard_normal((S, f - 1)).astype(np.float32),
                        np.ones((S, 1), np.float32)], axis=1)
    y = (X[:, 0] * X[:, 1] + X[:, 2]).reshape(S, 1).astype(np.float32)
    layer = TensorTrainLayer(2, f, f, output_shape=(1,), constrict_bond=False,
                             seed=8)
    cfg = SweepConfig(num_swipes=6, method="cg", max_iter=40, tol=1e-7,
                      batch_size=64, eps=1e-3)
    params, ok = accumulating_sweep(layer.network, layer.params,
                                    jnp.asarray(X), jnp.asarray(y),
                                    SquareBregFunction(), cfg)
    assert ok
    pred = np.asarray(layer.network.forward(params,
                                            layer.network.bind_inputs(jnp.asarray(X))))
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    assert rmse < 5e-2, rmse


def test_precompile_matches_lazy():
    """precompile() then run() must produce identical results to lazy run."""
    from tensornetworksfork_tpu.core.sweep import Sweeper
    rng = np.random.default_rng(9)
    X = np.concatenate([rng.standard_normal((64, 3)).astype(np.float32),
                        np.ones((64, 1), np.float32)], axis=1)
    y = (X[:, 0] * X[:, 1]).reshape(-1, 1).astype(np.float32)
    cfg = SweepConfig(num_swipes=2, method="ridge_cholesky", eps=1e-4,
                      batch_size=32)
    l1 = TensorTrainLayer(2, 3, 4, output_shape=(1,), seed=1)
    sw = Sweeper(l1.network, SquareBregFunction(), cfg)
    n_jobs = sw.precompile([dict(l1.params)], jnp.asarray(X), jnp.asarray(y))
    assert n_jobs > 0
    p1, ok1 = sw.run([dict(l1.params)], jnp.asarray(X), jnp.asarray(y))
    l2 = TensorTrainLayer(2, 3, 4, output_shape=(1,), seed=1)
    p2, ok2 = Sweeper(l2.network, SquareBregFunction(), cfg).run(
        [dict(l2.params)], jnp.asarray(X), jnp.asarray(y))
    assert ok1 and ok2
    for k in p1[0]:
        np.testing.assert_allclose(np.asarray(p1[0][k]), np.asarray(p2[0][k]),
                                   rtol=1e-5, atol=1e-5)
