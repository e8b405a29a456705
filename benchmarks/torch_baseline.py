"""Reference-semantics torch baseline for the conv-TT sweep benchmark.

An independent, minimal reimplementation of the reference's training
algorithm — per-batch full environment recomputation + dense Gauss-Newton
block solve, following the flow of `/root/reference/tensor/network.py:379-608`
— in plain torch einsums, float64, CPU. Used only by bench.py to produce the
`vs_baseline` speedup ratio against the reference's computational pattern on
the torch stack. This is NOT part of the framework.

Model: conv-TT (type-II) with N carriages, bond r, conv bond CB, P patches,
pp patch pixels, C output logits (carried by core 0). XE loss with appended
zero logit, analytic softmax grad/Hessian.
"""
from __future__ import annotations

import time
from typing import List


def conv_tt_epoch_seconds(N=4, r=8, CB=4, P=50, pp=17, C=9, S=2048,
                          batch=512, seed=0, eps=1.0) -> float:
    """Wall-clock seconds for ONE sweep epoch (l2r + r2l over all cores and
    conv blocks), reference algorithm shape."""
    import torch

    torch.set_default_dtype(torch.float64)
    g = torch.Generator().manual_seed(seed)
    X = torch.randn(S, P, pp, generator=g)
    y = torch.nn.functional.one_hot(
        torch.randint(0, C + 1, (S,), generator=g), C + 1).double()

    cores: List[torch.Tensor] = []
    convs: List[torch.Tensor] = []
    for i in range(N):
        rl = 1 if i == 0 else r
        rr = 1 if i == N - 1 else r
        c = C if i == 0 else 1
        cores.append(torch.randn(rl, c, P, rr, generator=g) * 0.1)
        cl = 1 if i == 0 else CB
        cr = 1 if i == N - 1 else CB
        convs.append(torch.randn(cl, pp, cr, generator=g) * 0.1)

    def U(i, xb):  # conv applied to input: (s, p, cb_l, cb_r)
        return torch.einsum("spq,aqb->spab", xb, convs[i])

    def col(i, xb):  # full column tensor (s, rl, c, rr, cbl, cbr)
        return torch.einsum("spab,lcpr->slcrab", U(i, xb), cores[i])

    def lenvs(xb):
        """envs[k] = contraction of columns 0..k-1, shape (s, c, r_k, cb_k)."""
        envs = [None] * (N + 1)
        e = col(0, xb)[:, 0, :, :, 0, :]  # (s, c, r, cb)
        envs[1] = e
        for k in range(1, N):
            tk = col(k, xb).squeeze(2)  # (s, r, r', cb, cb')
            e = torch.einsum("scrb,srtbe->scte", e, tk)
            envs[k + 1] = e
        return envs

    def renvs(xb):
        """envs[k] = contraction of columns k..N-1, shape (s, r_k, cb_k)."""
        envs = [None] * (N + 1)
        e = col(N - 1, xb).squeeze(2)[:, :, 0, :, 0]  # (s, r, cb)
        envs[N - 1] = e
        for k in range(N - 2, 0, -1):
            tk = col(k, xb).squeeze(2)
            e = torch.einsum("srtbe,ste->srb", tk, e)
            envs[k] = e
        return envs

    def xe_grad_hess(z, yb):
        z = torch.cat([z, torch.zeros_like(z[:, :1])], dim=1)
        s = torch.softmax(z, dim=1)
        grad = (s - yb)[:, :-1]
        hess = (torch.diag_embed(s) - torch.einsum("si,sj->sij", s, s))[:, :-1, :-1]
        return grad, hess

    nb = (S + batch - 1) // batch
    node_list = [("core", i) for i in range(N)] + [("conv", i) for i in range(N)]

    t_start = time.perf_counter()
    for direction in (0, 1):
        order = node_list if direction == 0 else list(reversed(node_list))
        for kind, i in order:
            A_out, b_out = None, None
            for b in range(nb):
                xb = X[b * batch:(b + 1) * batch]
                yb = y[b * batch:(b + 1) * batch]
                le = lenvs(xb)   # reference recomputes stacks per batch
                re = renvs(xb)
                if kind == "core":
                    u = U(i, xb)
                    if i == 0:
                        ub = u[:, :, 0, :]                       # (s,p,b)
                        J = (torch.einsum("spb,srb->spr", ub, re[1])
                             if N > 1 else ub[:, :, :1])          # (s,p,r)
                        z = torch.einsum("spr,cpr->sc", J, cores[0][0])
                        g_, H_ = xe_grad_hess(z, yb)
                        A = torch.einsum("spr,sqt,scd->cprdqt", J, J, H_)
                        bb = torch.einsum("spr,sc->cpr", J, g_)
                    elif i < N - 1:
                        J = torch.einsum("scib,spbe,sje->scipj",
                                         le[i], u, re[i + 1])     # (s,c,ri,p,rj)
                        z = torch.einsum("scipj,ipj->sc", J, cores[i].squeeze(1))
                        g_, H_ = xe_grad_hess(z, yb)
                        A = torch.einsum("scipj,sdkql,scd->ipjkql", J, J, H_)
                        bb = torch.einsum("scipj,sc->ipj", J, g_)
                    else:
                        ub = u[:, :, :, 0]                       # (s,p,b)
                        J = torch.einsum("scib,spb->scip", le[i], ub)
                        z = torch.einsum("scip,ip->sc", J,
                                         cores[i][:, 0, :, 0])
                        g_, H_ = xe_grad_hess(z, yb)
                        A = torch.einsum("scip,sdjq,scd->ipjq", J, J, H_)
                        bb = torch.einsum("scip,sc->ip", J, g_)
                else:
                    v = torch.einsum("spq,lcpr->sqlcr", xb, cores[i])
                    if i == 0:
                        vb = v[:, :, 0, :, :]                    # (s,q,c,r)
                        J = (torch.einsum("sqcr,srb->scqb", vb, re[1])
                             if N > 1 else vb.permute(0, 2, 1, 3))  # (s,c,q,b)
                        z = torch.einsum("scqb,qb->sc", J, convs[0][0])
                        g_, H_ = xe_grad_hess(z, yb)
                        A = torch.einsum("scqb,sdpa,scd->qbpa", J, J, H_)
                        bb = torch.einsum("scqb,sc->qb", J, g_)
                    elif i < N - 1:
                        vb = v.squeeze(3)                        # (s,q,l,r)
                        J = torch.einsum("scla,sqlr,srf->scaqf",
                                         le[i], vb, re[i + 1])   # (s,c,cbi,q,cbj)
                        z = torch.einsum("scaqf,aqf->sc", J, convs[i])
                        g_, H_ = xe_grad_hess(z, yb)
                        A = torch.einsum("scaqf,sdepg,scd->aqfepg", J, J, H_)
                        bb = torch.einsum("scaqf,sc->aqf", J, g_)
                    else:
                        vb = v.squeeze(3)[:, :, :, 0]            # (s,q,l)
                        J = torch.einsum("scla,sql->scaq", le[i], vb)
                        z = torch.einsum("scaq,aq->sc", J, convs[i][:, :, 0])
                        g_, H_ = xe_grad_hess(z, yb)
                        A = torch.einsum("scaq,sdbp,scd->aqbp", J, J, H_)
                        bb = torch.einsum("scaq,sc->aq", J, g_)
                A_out = A if A_out is None else A_out + A
                b_out = bb if b_out is None else b_out + bb
            D = b_out.numel()
            A_f = A_out.reshape(D, D)
            scale = A_f.diagonal().abs().mean().clamp_min(1e-30)
            A_f = A_f / scale + 2.0 * eps * torch.eye(D)
            rhs = -(b_out.reshape(D, 1) / scale)
            try:
                L = torch.linalg.cholesky(A_f)
                step = torch.cholesky_solve(rhs, L).reshape(b_out.shape)
                if kind == "core":
                    if i == 0:
                        cores[i] = cores[i] + step.reshape(cores[i].shape)
                    else:
                        cores[i] = cores[i] + step.reshape(cores[i].shape)
                else:
                    convs[i] = convs[i] + step.reshape(convs[i].shape)
            except Exception:
                pass
    return time.perf_counter() - t_start


def measure_flagship_rates(D_probe=2592, S_probe=192, C=9, seed=0, reps=5):
    """Median-of-reps torch-f64 rates for the two dominant kernels (the flat
    Gram matmul Mᵀ(WM) and the Cholesky solve). Single-shot timings on this
    contended 1-core host swung the extrapolated anchor ~2x between same-day
    runs (VERDICT r04 weak #2); the median over reps plus caching in
    results/baseline_cache.json makes the anchor reproducible. Returns a
    dict with the rates and their relative spreads ((max-min)/median)."""
    import statistics

    import torch

    torch.set_default_dtype(torch.float64)
    g = torch.Generator().manual_seed(seed)
    M = torch.randn(S_probe * C, D_probe, generator=g)
    w = torch.rand(S_probe * C, 1, generator=g) + 0.5

    t_grams, t_chols = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        A = M.T @ (w * M)
        t_grams.append(time.perf_counter() - t0)
        A = A / A.diagonal().abs().mean() + 2.0 * torch.eye(D_probe)
        t0 = time.perf_counter()
        L = torch.linalg.cholesky(A)
        torch.cholesky_solve(torch.ones(D_probe, 1), L)
        t_chols.append(time.perf_counter() - t0)

    def med_spread(ts):
        m = statistics.median(ts)
        return m, (max(ts) - min(ts)) / m

    t_gram, gram_spread = med_spread(t_grams)
    t_chol, chol_spread = med_spread(t_chols)
    return {
        "gram_rate": 2.0 * S_probe * C * D_probe ** 2 / t_gram,
        "chol_rate": (D_probe ** 3 / 3) / t_chol,
        "gram_spread": round(gram_spread, 3),
        "chol_spread": round(chol_spread, 3),
        "D_probe": D_probe, "reps": reps,
    }


def flagship_epoch_seconds_extrapolated(N=4, r=18, CB=8, P=50, pp=17, C=9,
                                        S=53248, D_probe=2592, S_probe=192,
                                        seed=0, verbose=False, rates=None):
    """Extrapolated torch-CPU-f64 epoch seconds at the FLAGSHIP shapes.

    A measured flagship epoch is infeasible (the D=16200 Gram alone is
    ~2.5e14 f64 flops per node-pass — days on this host), so this measures
    the achieved torch f64 flop rate on the two dominant kernels at a
    measurable size — the flat Gram matmul Mᵀ(WM) and the Cholesky solve —
    and scales analytically to the flagship epoch (Gram + solve flops only;
    env/Jacobian recompute terms are DROPPED, which strictly favours the
    baseline). Rates measured at D_probe=2592 (= r·P·r for r=18, P=8),
    median-of-5 (see measure_flagship_rates); pass `rates` (its return
    value, possibly loaded from results/baseline_cache.json) to skip
    re-measuring.
    """
    if rates is None:
        rates = measure_flagship_rates(D_probe, S_probe, C, seed)
    gram_rate, chol_rate = rates["gram_rate"], rates["chol_rate"]

    # flagship per-epoch flops (2 half-sweeps over cores + conv blocks)
    core_D = [C * P * r] + [r * P * r] * (N - 2) + [r * P]
    conv_D = [pp * CB] + [CB * pp * CB] * (N - 2) + [CB * pp]
    Ds = core_D + conv_D
    gram_flops = 2 * sum(2.0 * S * C * D * D for D in Ds)
    chol_flops = 2 * sum(D ** 3 / 3 for D in Ds)
    t_est = gram_flops / gram_rate + chol_flops / chol_rate
    if verbose:
        print(f"torch f64 rates: gram {gram_rate/1e9:.1f} GFLOP/s, "
              f"chol {chol_rate/1e9:.1f} GFLOP/s -> flagship epoch "
              f"~{t_est:.0f}s ({t_est/3600:.1f}h)")
    return t_est


def conv_tt_matvec_seconds(N=3, r=8, CB=4, P=50, pp=17, C=9, S=8192,
                           batch=2048, n_matvecs=5, seed=0) -> float:
    """Seconds per Gram matvec, reference scipy_swipe pattern
    (network.py:896-918): per matvec, per batch, recompute ALL environment
    stacks, build J, apply two einsums, round-trip through numpy float32.
    Returns mean seconds per matvec for the middle core."""
    import numpy as np
    import torch

    torch.set_default_dtype(torch.float64)
    g = torch.Generator().manual_seed(seed)
    X = torch.randn(S, P, pp, generator=g)
    cores, convs = [], []
    for i in range(N):
        rl = 1 if i == 0 else r
        rr = 1 if i == N - 1 else r
        c = C if i == 0 else 1
        cores.append(torch.randn(rl, c, P, rr, generator=g) * 0.1)
        cl = 1 if i == 0 else CB
        cr = 1 if i == N - 1 else CB
        convs.append(torch.randn(cl, pp, cr, generator=g) * 0.1)
    H = torch.randn(S, C, C, generator=g)
    H = torch.einsum("sij,skj->sik", H, H) / C  # PSD per-sample Hessian

    def U(i, xb):
        return torch.einsum("spq,aqb->spab", xb, convs[i])

    def col(i, xb):
        return torch.einsum("spab,lcpr->slcrab", U(i, xb), cores[i])

    i = 1  # middle core
    v = torch.randn_like(cores[i])
    nb = (S + batch - 1) // batch
    t0 = time.perf_counter()
    for _ in range(n_matvecs):
        v_np = v.numpy().astype("float32")  # scipy hands numpy f32 back
        v_t = torch.tensor(v_np, dtype=torch.float64)
        Av = torch.zeros_like(v)
        for b in range(nb):
            xb = X[b * batch:(b + 1) * batch]
            Hb = H[b * batch:(b + 1) * batch]
            # reference recomputes the full stacks EVERY matvec per batch
            e = col(0, xb)[:, 0, :, :, 0, :]
            le = e
            rr_env = col(N - 1, xb).squeeze(2)[:, :, 0, :, 0]
            for k in range(N - 2, i, -1):
                tk = col(k, xb).squeeze(2)
                rr_env = torch.einsum("srtbe,ste->srb", tk, rr_env)
            J = torch.einsum("scib,spbe,sje->scipj", le, U(i, xb), rr_env)
            Jv = torch.einsum("scipj,ipj->sc", J, v_t.squeeze(1))
            coeff = torch.einsum("scd,sd->sc", Hb, Jv)
            Av += torch.einsum("scipj,sc->ipj", J, coeff).reshape(Av.shape)
        _ = Av.numpy().astype("float32")
    return (time.perf_counter() - t0) / n_matvecs
