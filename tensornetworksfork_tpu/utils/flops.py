"""Analytic FLOP accounting for sweep epochs (MFU reporting).

The reference publishes no throughput numbers (SURVEY.md §6), so the bench's
north star needs first-class flop counting: every contraction the sweep
executes has trace-time-known shapes, so an epoch's algorithmic FLOPs can be
summed exactly without running anything. Costs follow the MFU convention used
by the scaling literature: *algorithmic* flops (2·prod(dims) per contracted
multiply-add), independent of how the compiler lowers them — a 6-pass
f32-HIGHEST matmul still counts its algorithmic flops once.

Covered, mirroring the hot loop of the reference trainer
(`/root/reference/tensor/network.py:379-608`):
- environment chains (far precompute + near incremental advance),
- per-node Jacobian builds, predictions, Gram/rhs accumulation,
- the dense Cholesky block solves.

Costs of einsum-shaped contractions are taken from opt_einsum's optimal path
(`contract_path(..., shapes=True)`), i.e. the same path the engine's
`contract()` executes.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
import opt_einsum as oe

from ..core.contract import einsum_expr

# bf16 MXU peak per chip, by jax device_kind. MFU is reported against the
# bf16 peak regardless of precision mode (the f32-HIGHEST ladder spends
# multiple MXU passes per algorithmic flop; that inefficiency is exactly what
# MFU should expose).
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e (Trillium)
}

# int8 MXU peak per chip (OPS). The int8 Gram tier's honest utilization
# denominator: counting int8 work at bf16 peak overstates MFU ~2x on chips
# whose MXU doubles int8 rate (v5e: 394 TOPS vs 197 bf16 TFLOP/s). v4 has
# no int8 acceleration (same rate as bf16).
PEAK_OPS_INT8 = {
    "TPU v5 lite": 394e12,   # v5e
    "TPU v5e": 394e12,
    "TPU v5": 918e12,        # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 1836e12,  # v6e (Trillium)
}


def device_peak_flops(dtype: str = "bf16") -> Optional[float]:
    table = PEAK_OPS_INT8 if dtype == "int8" else PEAK_FLOPS
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return None
    for k, v in table.items():
        if kind.startswith(k):
            return v
    return None


def _axis_sizes(topology, B: int) -> Dict[int, int]:
    return {a: (B if sz is None else int(sz))
            for a, sz in topology.axis_size.items()}


def contraction_flops(operand_axes, keep, sizes) -> int:
    """FLOPs of contract(operands, keep) via opt_einsum's chosen path."""
    shapes = [tuple(sizes[a] for a in axes) for axes in operand_axes]
    if len(shapes) < 2:
        return 0
    expr = einsum_expr(list(operand_axes), tuple(keep))
    optimize = "optimal" if len(shapes) <= 6 else "auto"
    _, info = oe.contract_path(expr, *shapes, shapes=True, optimize=optimize)
    return int(info.opt_cost)


def _chunking(cfg, S: int):
    B = cfg.batch_size
    if B is None or B <= 0 or B > S:
        B = S
    P = ((S + B - 1) // B) * B
    return B, P // B


def _probe_hessian(loss_fn, out_sizes, y, B: int):
    """Returns (C_out, full_hessian) by abstractly evaluating the loss."""
    pred = jax.ShapeDtypeStruct((B,) + tuple(out_sizes), np.float32)
    y_s = jax.ShapeDtypeStruct((B,) + tuple(np.asarray(y).shape[1:]),
                               np.float32)
    _, g, H = jax.eval_shape(loss_fn, pred, y_s)
    return int(np.prod(g.shape[1:], dtype=np.int64)), H.ndim > g.ndim


def epoch_flops(sweeper, x, y) -> Dict[str, float]:
    """Algorithmic FLOPs of ONE sweeper.run() call (num_swipes × ≤2 passes).

    Mirrors the control flow of `Sweeper.run/_half_pass` (core/sweep.py):
    per half-sweep each member precomputes a far env chain, advances the near
    env once per column, and runs one accumulate+solve per train node; the
    junction rule skips one node on every pass after the first.
    """
    cfg = sweeper.cfg
    S = int(np.asarray(y).shape[0])
    B, nchunks = _chunking(cfg, S)

    env_half_sweep = 0
    node_costs = []   # per (member, node) update cost for one half-sweep
    solve_costs = []

    for m in sweeper.members:
        net = m.net
        t = net.topology
        sizes = _axis_sizes(t, B)
        out_sizes = tuple(sizes[a] for a in t.output_axes)
        C_out, full_hess = _probe_hessian(sweeper.loss_fn, out_sizes, y, B)
        ncols = len(t.columns)
        if not t.input_nodes:
            # standalone (input-less) path: jacobian over all nodes, full batch
            for ni in m.train_nodes:
                ops = [t.node_axes[nj] for nj in range(len(t.nodes))
                       if nj != ni]
                keep = net.jacobian_keep(
                    ni, [(t.node_axes[nj], None) for nj in range(len(t.nodes))
                         if nj != ni])
                D = int(np.prod([sizes[a] for a in t.node_axes[ni]],
                                dtype=np.int64))
                jcost = contraction_flops(ops, keep, sizes)
                gram = 2 * S * C_out * D * D + (
                    2 * S * C_out * C_out * D if full_hess else 0)
                node_costs.append(jcost + gram + 4 * S * C_out * D)
                solve_costs.append(D ** 3 // 3 + 2 * D * D)
            continue

        # --- environment chains (far + near), per half-sweep, per chunk ----
        def chain_cost(direction):
            order = (range(ncols) if direction == "left"
                     else range(ncols - 1, -1, -1))
            total, seen, prev_keep = 0, [], None
            for ci in order:
                seen.append(ci)
                ops = [t.node_axes[nj] for nj in t.columns[ci]]
                if prev_keep is not None:
                    ops = [prev_keep] + ops
                keep = net.env_keep(tuple(seen))
                total += contraction_flops(ops, keep, sizes)
                prev_keep = keep
            return total

        # far chain covers all columns; near advances cover ncols-1 of them
        far = chain_cost("right")
        near = chain_cost("left")
        env_half_sweep += (far + near * max(0, ncols - 1) / max(1, ncols)) * nchunks

        # --- per-node update cost -----------------------------------------
        for ni in m.train_nodes:
            ci = t.col_of[ni]
            ops_axes = []
            if ci > 0:
                ops_axes.append(net.env_keep(tuple(range(0, ci))))
            ops_axes += [t.node_axes[nj] for nj in t.columns[ci] if nj != ni]
            if ci < ncols - 1:
                ops_axes.append(net.env_keep(tuple(range(ci + 1, ncols))))
            keep = net.jacobian_keep(
                ni, [(a, None) for a in ops_axes])
            jcost = contraction_flops(ops_axes, keep, sizes)
            D = int(np.prod([sizes[a] for a in t.node_axes[ni]],
                            dtype=np.int64))
            CJ = int(np.prod([sizes[a] for a in keep
                              if a in t.output_axes], dtype=np.int64))
            # pred = J·core; K build (full H); Gram; rhs
            pred = 2 * B * CJ * D
            kbuild = 2 * B * CJ * CJ * D if full_hess else B * CJ * D
            gram = 2 * B * CJ * D * D
            rhs = 2 * B * CJ * D
            node_costs.append((jcost + pred + kbuild + gram + rhs) * nchunks)
            solve_costs.append(D ** 3 // 3 + 2 * D * D)

    per_pass = env_half_sweep + sum(node_costs) + sum(solve_costs)
    npasses = cfg.num_swipes * (1 if cfg.skip_second else 2)
    total = per_pass * npasses
    # junction rule: one node (same column as the previous pass's last) is
    # skipped on every pass after the first — subtract the mean node cost
    if npasses > 1 and node_costs:
        total -= (npasses - 1) * (float(np.mean(node_costs))
                                  + float(np.mean(solve_costs)))
    return {
        "total": float(total),
        "per_pass": float(per_pass),
        "env": float(env_half_sweep * npasses),
        "gram_and_jac": float(sum(node_costs) * npasses),
        "solve": float(sum(solve_costs) * npasses),
    }


def mfu(flops_total: float, seconds: float,
        peak: Optional[float] = None) -> Optional[float]:
    if peak is None:
        peak = device_peak_flops()
    if not peak or seconds <= 0:
        return None
    return flops_total / seconds / peak
