"""Label-driven einsum contraction.

The reference engine (`/root/reference/tensor/node.py:28-74`) builds einsum
strings at *runtime* from string dim-labels and contracts pairwise with
priority ordering. Here the same label semantics are resolved at *trace time*:
a contraction over an arbitrary set of operands becomes one `jnp.einsum` call
whose path is found by opt_einsum, so XLA sees a static, fusable program and
the pairwise-priority machinery is unnecessary.

Axes are integer ids (assigned by `topology.Topology`); two operands sharing
an axis id are connected on it. An id appearing in `keep` survives as a batch
axis; ids absent from `keep` are summed. Hyperedges (one id on 3+ operands,
e.g. the CPD rank axis) follow einsum semantics: multiplied elementwise across
all carriers, then summed once — exactly the reference `CPDNetwork` behaviour
(`/root/reference/tensor/network.py:955-974`).
"""
from __future__ import annotations

import os
import string
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_LETTERS = string.ascii_lowercase + string.ascii_uppercase


def _symbol(i: int) -> str:
    """Einsum symbol #i: ascii letters first, then unicode (opt_einsum scheme).

    chr(140+i) matches opt_einsum.get_symbol, so expressions stay parseable by
    the opt_einsum front-end jnp.einsum uses. Removes the 52-axis ceiling that
    wide MPS chains (e.g. 30-feature TNML, one core per feature) exceed.
    """
    if i < len(_LETTERS):
        return _LETTERS[i]
    return chr(140 + i)


Axes = Tuple[int, ...]


class Labeler:
    """Assigns einsum letters to axis ids, first-come first-served."""

    def __init__(self):
        self._map = {}

    def __getitem__(self, axis_id) -> str:
        if axis_id not in self._map:
            self._map[axis_id] = _symbol(len(self._map))
        return self._map[axis_id]

    def __contains__(self, axis_id) -> bool:
        return axis_id in self._map


def einsum_expr(operand_axes: Sequence[Axes], keep: Axes) -> str:
    """Builds the einsum string for contracting operands down to `keep`."""
    lab = Labeler()
    terms = ["".join(lab[a] for a in axes) for axes in operand_axes]
    out = "".join(lab[a] for a in keep)
    return ",".join(terms) + "->" + out


# Largest intermediate (in ELEMENTS) a FLOP-optimal path may materialise
# before the planner is re-run memory-constrained. 2^28 el = 1 GiB f32 —
# far above anything the flagship configs produce (their big contractions
# use dedicated lowerings, not this planner), but a big-bond one-shot
# forward (CIFAR r=100: (B, CB, CB, r, r) ~ 4 GiB/chunk) re-plans to a
# slower path that fits. TNF_CONTRACT_MAX_ELEMS overrides (0 disables).
_DEFAULT_MAX_ELEMS = 1 << 28


def contract(
    operands: Sequence[Tuple[Axes, jax.Array]],
    keep: Axes,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Contracts labelled operands into an array whose axes are `keep`, in order.

    Every axis id not in `keep` is summed over; ids shared between operands are
    matched (connected edges). Uses opt_einsum path search ("optimal" for small
    operand counts, "auto" beyond) so chain/tree contraction order is optimal
    without the reference's manual priority scheme. FLOP-optimal paths whose
    largest intermediate exceeds the element cap re-plan memory-constrained
    (see _DEFAULT_MAX_ELEMS) — all trace-time, static shapes.
    """
    expr = einsum_expr([axes for axes, _ in operands], keep)
    arrays = [arr for _, arr in operands]
    optimize = "optimal" if len(arrays) <= 6 else "auto"
    cap_s = os.environ.get("TNF_CONTRACT_MAX_ELEMS", "")
    cap = int(cap_s) if cap_s else _DEFAULT_MAX_ELEMS
    if cap > 0 and len(arrays) > 1:
        try:
            import opt_einsum as oe
            path, info = oe.contract_path(
                expr, *[a.shape for a in arrays], shapes=True,
                optimize=optimize)
            if info.largest_intermediate > cap:
                path, info = oe.contract_path(
                    expr, *[a.shape for a in arrays], shapes=True,
                    optimize=optimize, memory_limit=cap)
                # an unsatisfiable memory_limit (e.g. the OUTPUT itself
                # exceeds the cap) makes opt_einsum emit a simultaneous
                # >=3-operand step, which jnp.einsum cannot execute —
                # keep the unconstrained pairwise path in that case
                if all(len(step) <= 2 for step in path):
                    optimize = path
        except Exception:
            pass  # planner quirk: fall through to the unconstrained path
    return jnp.einsum(expr, *arrays, precision=precision, optimize=optimize)
