"""Pure-functional tensor-network engine.

Reimplements the reference `TensorNetwork` runtime
(`/root/reference/tensor/network.py:14-377`) as pure functions over a static
`Topology` + a params dict, so every piece can be `jax.jit`-ed:

- `forward`            <-> TensorNetwork.forward (network.py:115-137)
- `env_chain`          <-> compute_stacks       (network.py:55-76)
- `jacobian`           <-> compute_jacobian_stack (network.py:101-113)
- `gram_and_rhs`       <-> get_A_b              (network.py:174-217)
- `gram_matvec_*`      <-> get_J / matvec       (network.py:219-291, 769-790)

Design differences (TPU-first, not a translation):
- environments are arrays carried *between* jitted calls, giving O(N) work
  per half-sweep instead of the reference's per-batch full-stack recompute;
- the Jacobian is never expanded over broadcast output dims
  (reference expand_labels, network.py:183): output axes are contracted
  directly inside the A/b einsums, which is algebraically identical and
  cheaper;
- diagonal Hessians are (B, C) arrays; full Hessians (B, C, C). Both are
  handled natively by the einsum builder rather than materialised.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .contract import contract
from .topology import CONST, INPUT, PARAM, Topology

Operand = Tuple[Tuple[int, ...], jax.Array]

# Matmul precision for all engine contractions. The reference runs float64;
# on TPU the default here is full-precision f32 (6-pass bf16 on the MXU,
# SURVEY.md §7 hard part 1). TNF_PRECISION=default switches to single-pass
# bf16 — ~4x faster on the Gram einsums, at ~1e-2 relative error in A
# (benchmarking mode; validate accuracy per config before trusting it).
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}
DEFAULT_PRECISION = _PRECISIONS[os.environ.get("TNF_PRECISION",
                                               "highest").lower()]


def _prime(a):
    return ("~", a)


class Network:
    """Binds a Topology to constant tensors and exposes pure compute fns.

    All methods taking `params`/`inputs` are pure and jittable. `inputs` is a
    dict {input_node_name: array}; use `bind_inputs` to normalise the
    reference's flexible x conventions (single shared tensor or per-node list,
    network.py:329-345).
    """

    def __init__(self, topology: Topology, consts: Optional[Dict[str, jax.Array]] = None,
                 precision=None, use_pallas: Optional[bool] = None):
        if precision is None:
            precision = DEFAULT_PRECISION
        if use_pallas is None:
            from ..ops.pallas.gram import pallas_enabled
            use_pallas = pallas_enabled()
        self.use_pallas = use_pallas
        # Active device mesh for the Pallas tier (set by Sweeper.run(mesh=) on
        # 1-D data meshes): kernels run per-shard under shard_map with a psum
        # on the partial Gram — GSPMD cannot partition the custom call itself.
        self.mesh = None
        self.mesh_axis = "data"
        self.topology = topology
        self.consts = dict(consts or {})
        for spec in topology.nodes:
            if spec.kind == CONST and spec.name not in self.consts:
                self.consts.update(topology.consts())
                break
        self.precision = precision
        t = topology
        self._col_axes = [
            set().union(*(set(t.node_axes[ni]) for ni in col)) if col else set()
            for col in t.columns
        ]

    # ---------------------------------------------------------------- mesh
    def _mesh_row_axes(self):
        """All mesh axis names, for sharding the Gram's row (sample) axis.

        Sample sums are exact under ANY row partition, so the kernel tier
        shards rows over the FULL mesh — a 2-D (data × model) mesh uses all
        chips for the Gram stage instead of replicating work along the
        model axis (or falling back to XLA dots, as before round 4)."""
        return tuple(self.mesh.axis_names)

    def _mesh_ndev(self) -> int:
        n = 1
        for s in dict(self.mesh.shape).values():
            n *= int(s)
        return n

    # ------------------------------------------------------------ precisions
    @property
    def aux_precision(self):
        """Precision for the auxiliary contraction tier: environment chains,
        Jacobian builds, predictions, rhs dots, K builds. TNF_AUX_PRECISION
        (highest|high|default) relaxes it independently of the Gram policy —
        'default' runs these single-pass bf16-operand/f32-accumulate on the
        MXU (measured ~3-6x on env/J work) while A's dot keeps its own ladder
        (TNF_GRAM_DTYPE) and the Cholesky solves stay full f32. Read per
        trace; participates in the sweep's jit cache key
        (sweep._numeric_env_key)."""
        name = os.environ.get("TNF_AUX_PRECISION")
        if name is None:
            return self.precision
        return _PRECISIONS[name.lower()]

    # ------------------------------------------------------------- pallas tier
    def _kernel_gram(self, kind: str, X: jax.Array, Y: jax.Array,
                     row_group: int = 1, mirror: bool = True) -> jax.Array:
        """Dispatch a Pallas Gram kernel: A = Xᵀ diag(Y) X ('weighted') or
        Xᵀ Y ('pair', symmetric). X is (rows, D) with rows the flattened
        (sample, class) axis; row_group is the class-block size C — under a
        mesh, shards must hold whole samples for the symmetric mirror to be
        exact.

        With an active mesh (self.mesh), the call is wrapped in shard_map
        over the row axis: each device runs the kernel on its local row
        shard and the partial Grams are psum'd — exactly the sharded
        accumulation GSPMD performs for the XLA dot paths, so
        sharded-with-pallas == single-device (tested on the 8-device CPU
        mesh). GSPMD alone cannot partition a pallas_call custom call.

        Rows shard over ALL mesh axes (`_mesh_row_axes`), not just 'data':
        the Gram is a plain sum over samples, so re-partitioning the row
        axis across a 2-D (data × model) mesh is exact regardless of each
        axis's role elsewhere — shard_map's in_specs reshard the
        (GSPMD-laid-out) operands to row shards, every chip computes a
        row-partial at single-chip kernel throughput, and one psum over
        both axes replicates A. This is what keeps the kernel tier ACTIVE
        under tensor parallelism (VERDICT r03 weak #6)."""
        from ..ops.pallas.gram import _on_tpu, gram_pair, weighted_gram
        interp = not _on_tpu()

        def call(x, y):
            if kind == "weighted":
                return weighted_gram(x, y, interpret=interp, mirror=mirror)
            return gram_pair(x, y, interpret=interp, symmetric=True,
                             mirror=mirror)

        if self.mesh is None:
            return call(X, Y)
        axis = self._mesh_row_axes()
        ndev = self._mesh_ndev()
        if X.shape[0] % (ndev * row_group) != 0:
            # shard_map needs the row axis to divide evenly; rows from the
            # sweep's chunked path always do (_prepare pads B to a device
            # multiple), but other callers (e.g. raw baked-data rows) may
            # not — fall back to the equivalent XLA dot, which GSPMD
            # partitions exactly.
            prec = (jax.lax.Precision.DEFAULT if X.dtype == jnp.bfloat16
                    else self.precision)
            Yop = (X * Y[:, None].astype(X.dtype)) if kind == "weighted" else Y
            return jax.lax.dot_general(X, Yop, (((0,), (0,)), ((), ())),
                                       precision=prec,
                                       preferred_element_type=jnp.float32)
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
            kw = {"check_vma": False}
        except ImportError:  # older jax: same flag under its old name
            from jax.experimental.shard_map import shard_map
            kw = {"check_rep": False}

        def sharded(x, y):
            return jax.lax.psum(call(x, y), axis)

        yspec = P(axis, None) if Y.ndim == 2 else P(axis)
        # check_vma/check_rep=False: pallas_call's out ShapeDtypeStruct
        # carries no vma metadata, which the checker (jax>=0.9) would
        # reject; the psum makes the output mesh-invariant by construction.
        # Correctness note for gram_pair(symmetric=True) under sharding: a
        # shard's partial Gram is only symmetric if it holds WHOLE samples
        # (all C class rows of each s). Rows are s-major and the sweep pads
        # the per-chunk sample count to a device multiple, so each shard
        # gets (B/ndev)*C whole-sample rows.
        return shard_map(sharded, mesh=self.mesh,
                         in_specs=(P(axis, None), yspec),
                         out_specs=P(), **kw)(X, Y)

    # ------------------------------------------------------------------ inputs
    def bind_inputs(self, x) -> Dict[str, jax.Array]:
        t = self.topology
        names = [t.nodes[ni].name for ni in t.input_nodes]
        if isinstance(x, dict):
            return x
        if isinstance(x, (list, tuple)):
            return dict(zip(names, x))
        return {n: x for n in names}

    # ---------------------------------------------------------------- operands
    def operand(self, ni: int, params, inputs) -> Operand:
        spec = self.topology.nodes[ni]
        if spec.kind == PARAM:
            arr = params[spec.name]
        elif spec.kind == INPUT:
            arr = inputs[spec.name]
        else:
            arr = self.consts[spec.name]
        return (self.topology.node_axes[ni], arr)

    def column_operands(self, ci: int, params, inputs, exclude: Sequence[int] = ()) -> List[Operand]:
        return [
            self.operand(ni, params, inputs)
            for ni in self.topology.columns[ci]
            if ni not in exclude
        ]

    # ------------------------------------------------------------------- keeps
    def _keep_for_group(self, group_axes: set, outside_axes: set) -> Tuple[int, ...]:
        """Environment keep order: bond/output axes first, SAMPLE AXIS LAST.

        TPU layout discipline (docs/DESIGN.md): program-boundary arrays tile
        their last two dims to (8, 128). Env arrays' non-sample axes are
        small (bond r, conv bond CB, classes C — 8..18), so sample-first
        order pads the lane dim up to 16x and the env DMA dominated the
        round-2 epoch's non-Gram overhead (advance 78 ms/call measured vs
        ~2 ms of MXU work). With the big sample axis minor, padding is ~1x.
        All consumers address axes symbolically, so only this order changes.
        """
        t = self.topology
        want = group_axes & (outside_axes | set(t.output_axes))
        want.discard(t.sample_axis)
        ordered = tuple(sorted(want))
        if t.sample_axis in group_axes:
            return ordered + (t.sample_axis,)
        return ordered

    def env_keep(self, cols: Sequence[int]) -> Tuple[int, ...]:
        cols = set(cols)
        group = set().union(*(self._col_axes[c] for c in cols)) if cols else set()
        ncols = len(self.topology.columns)
        outside_cols = [c for c in range(ncols) if c not in cols]
        outside = set().union(*(self._col_axes[c] for c in outside_cols)) if outside_cols else set()
        return self._keep_for_group(group, outside)

    # ------------------------------------------------------------ environments
    def env_step(self, prev: Optional[Operand], ci: int, params, inputs,
                 cols_so_far: Sequence[int]) -> Operand:
        """Contract column `ci` into the running environment (reference
        compute_stacks inner loop, network.py:62-69)."""
        col_ops = self.column_operands(ci, params, inputs)
        keep = self.env_keep(cols_so_far)
        if prev is not None and os.environ.get("TNF_ENV_STAGED", "1") == "1":
            fast = self._env_step_conv_fast(prev, col_ops, keep)
            if fast is not None:
                return (keep, fast)
        ops = ([prev] if prev is not None else []) + col_ops
        return (keep, contract(ops, keep, self.aux_precision))

    def _env_step_conv_fast(self, prev, col_ops, keep):
        """Staged lowering of a conv-TT-like column advance, or None.

        The generic einsum path lowers the 4-operand advance
        (prev env × core × conv block × input) as batched dot_generals
        whose M/N dims are the TINY bond axes with the 2048-sample axis as
        the batch dim — each batch element is one sub-MXU-sized op, and the
        column advance ran at ~0.7 TFLOP/s (benchmarks/env_bench.py,
        76.5 ms/advance at the flagship — the second-largest epoch phase).
        This staging merges large axes into the matmul M dimension instead
        (measured 144 -> 85 ms per 26-chunk advance standalone):

          1. U[(s·p), (cb·cb')]   = X[(s·p), q] @ conv[q, (cb·cb')]
          2. V[s, (p·cb'), (o·r)] = U ⋅ prev[s, (o·r), cb]   (contract cb)
          3. env[(s·cb'·o), r']   = V[(s·cb'·o), (r·p)] @ core[(r·p), r']

        Acceptance is structural (axis-id driven, both sweep directions):
        exactly one sample-carrying input X(s, p, q), one 3-axis operand
        sharing p (the core), one sharing q (the conv block), each with one
        axis bridging to prev and one surviving into keep; prev carries
        only (s, bridges, kept-out axes). Anything else — plain TT columns,
        CPD hyperedges, complex dtypes, multi-input columns — returns None
        and takes the generic contract. TNF_ENV_STAGED=0 reverts.

        Numerics: same FLOPs, different summation ORDER than the einsum
        lowering — bit-exactness with the generic path is not guaranteed
        (accuracy re-validated on digits, see RESULTS.md)."""
        t = self.topology
        s = t.sample_axis
        prev_axes, P = prev
        if len(col_ops) != 3 or s not in prev_axes:
            return None
        xs = [o for o in col_ops if s in o[0]]
        if len(xs) != 1:
            return None
        x_axes, X = xs[0]
        if len(x_axes) != 3 or len(set(x_axes)) != 3:
            return None
        others = [o for o in col_ops if o is not xs[0]]
        if any(len(ax) != 3 or len(set(ax)) != 3 or s in ax
               for ax, _ in others):
            return None
        if any(jnp.iscomplexobj(a) for _, a in [prev] + col_ops):
            return None
        # exactly 2 by the len/set/s checks above
        x_free = [a for a in x_axes if a != s]

        def classify(op):
            ax, arr = op
            shared = [a for a in ax if a in x_free]
            bridge = [a for a in ax if a in prev_axes]
            kept = [a for a in ax if a in keep]
            if (len(shared) != 1 or len(bridge) != 1 or len(kept) != 1
                    or shared[0] in prev_axes or shared[0] in keep
                    or bridge[0] == kept[0] or bridge[0] in keep):
                return None
            return shared[0], bridge[0], kept[0], ax, arr

        c0, c1 = classify(others[0]), classify(others[1])
        if c0 is None or c1 is None or c0[0] == c1[0]:
            return None
        # cross-operand distinctness: a 3-way hyperedge bridging prev
        # through BOTH operands (c0[1]==c1[1], e.g. a CPD rank axis
        # contracted at this column) or both operands keeping the same
        # axis (c0[2]==c1[2]) is not this structure — without these
        # checks the transposes below would build invalid permutations
        # at trace time instead of falling back to the generic contract.
        # (shared-vs-bridge / shared-vs-kept / bridge-vs-kept collisions
        # are already excluded inside classify.)
        if c0[1] == c1[1] or c0[2] == c1[2]:
            return None
        # conv := the operand sharing X's q; core := the one sharing p —
        # the roles are CORRECTNESS-symmetric but NOT memory-symmetric:
        # U below materialises (B, Pn, CBb*CBk), i.e. X's p-axis size times
        # the product of the CONV role's non-shared axes. At the reference
        # CIFAR_minres config (r=100, CB=5, pixels=193) assigning the TT
        # core as CONV makes U a 15 GB buffer ((B, 193, 100*100), the
        # round-3 HBM-OOM in the far-env program) while the other choice is
        # (B, 17, 25). Keep the operand-order roles (the flagship's measured
        # and replication-validated lowering) unless their intermediates
        # exceed the byte cap — swap only then, falling back to the generic
        # einsum when neither choice fits. All static, trace-time.
        szs = t.axis_size
        B_guess = X.shape[x_axes.index(s)]
        cap = int(os.environ.get("TNF_ENV_STAGED_MAX_BYTES",
                                 str(2 * 1024 ** 3)))

        def staged_elems(conv_c, core_c):
            """max(U, V) elements for a (conv, core) role assignment."""
            o = 1
            for a in prev_axes:
                if a not in (s, core_c[1], conv_c[1]):
                    o *= szs[a]
            u = B_guess * szs[core_c[0]] * szs[conv_c[1]] * szs[conv_c[2]]
            v = B_guess * szs[core_c[0]] * szs[conv_c[2]] * o * szs[core_c[1]]
            return max(u, v)

        if 4 * staged_elems(c0, c1) > cap:
            if 4 * staged_elems(c1, c0) > cap:
                return None
            c0, c1 = c1, c0
        (q, cb_b, cb_k, conv_ax, CONV), (p, r_b, r_k, core_ax, CORE) = c0, c1
        outs = tuple(a for a in prev_axes if a not in (s, r_b, cb_b))
        if any(a not in keep for a in outs):
            return None
        if set(keep) != {s, r_k, cb_k, *outs}:
            return None
        # static sizes
        sz = t.axis_size
        Pn, Qn = sz[p], sz[q]
        CBb, CBk, Rb, Rk = sz[cb_b], sz[cb_k], sz[r_b], sz[r_k]
        O = 1
        for a in outs:
            O *= sz[a]
        B = X.shape[x_axes.index(s)]
        prec = self.aux_precision
        # match the generic einsum's UPWARD dtype promotion (a bf16 x with
        # f32 params must compute f32, not silently downcast everything to
        # x's dtype); the aux tier relaxes via `prec`, never via dtypes
        rt = jnp.result_type(X, CONV, P, CORE)

        X3 = jnp.transpose(X.astype(rt), (x_axes.index(s), x_axes.index(p),
                                          x_axes.index(q)))
        convm = jnp.transpose(CONV, (conv_ax.index(q), conv_ax.index(cb_b),
                                     conv_ax.index(cb_k))).reshape(
                                         Qn, CBb * CBk)
        U = jax.lax.dot_general(
            X3.reshape(B * Pn, Qn), convm.astype(rt),
            (((1,), (0,)), ((), ())),
            precision=prec).reshape(B, Pn, CBb, CBk)
        pe = jnp.transpose(P, tuple(prev_axes.index(a)
                                    for a in (s,) + outs + (r_b, cb_b)))
        pe = pe.reshape(B, O * Rb, CBb)
        V = jax.lax.dot_general(
            jnp.transpose(U, (0, 1, 3, 2)).reshape(B, Pn * CBk, CBb),
            pe.astype(rt),
            (((2,), (2,)), ((0,), (0,))),
            precision=prec)  # (B, P*CBk, O*Rb)
        V = V.reshape(B, Pn, CBk, O, Rb)
        Vp = jnp.transpose(V, (0, 2, 3, 4, 1)).reshape(
            B * CBk * O, Rb * Pn)
        corem = jnp.transpose(CORE, (core_ax.index(r_b), core_ax.index(p),
                                     core_ax.index(r_k))).reshape(
                                         Rb * Pn, Rk)
        out = jax.lax.dot_general(
            Vp, corem.astype(rt), (((1,), (0,)), ((), ())),
            precision=prec)
        out = out.reshape((B, CBk) + tuple(sz[a] for a in outs) + (Rk,))
        cur = (s, cb_k) + outs + (r_k,)
        return jnp.transpose(out, tuple(cur.index(a) for a in keep))

    def env_chain(self, params, inputs, direction: str = "left",
                  skip_last: bool = False) -> List[Optional[Operand]]:
        """envs[c] = contraction of columns 0..c (left) or c..end (right).

        skip_last drops the terminal cumulative step (the full-network env),
        which no sweep consumer reads — a far chain only feeds the OTHER
        side of each node."""
        ncols = len(self.topology.columns)
        order = list(range(ncols) if direction == "left"
                     else range(ncols - 1, -1, -1))
        if skip_last:
            order = order[:-1]
        envs: List[Optional[Operand]] = [None] * ncols
        prev = None
        seen: List[int] = []
        for ci in order:
            seen.append(ci)
            prev = self.env_step(prev, ci, params, inputs, seen)
            envs[ci] = prev
        return envs

    # ---------------------------------------------------------------- forward
    def output_keep(self) -> Tuple[int, ...]:
        t = self.topology
        keep = []
        oi = 0
        for ol in t.output_labels:
            if ol == t.sample_dim:
                keep.append(t.sample_axis)
            else:
                keep.append(t.output_axes[oi])
                oi += 1
        return tuple(keep)

    def forward(self, params, x) -> jax.Array:
        """Model output with axes ordered as output_labels (reference
        TensorNetwork.forward, network.py:115-137)."""
        inputs = self.bind_inputs(x)
        ops = [self.operand(ni, params, inputs) for ni in range(len(self.topology.nodes))]
        return contract(ops, self.output_keep(), self.precision)

    # --------------------------------------------------------------- jacobian
    def jacobian_operands(self, ni: int, params, inputs,
                          left_env: Optional[Operand], right_env: Optional[Operand]) -> List[Operand]:
        ci = self.topology.col_of[ni]
        ops: List[Operand] = []
        if left_env is not None:
            ops.append(left_env)
        ops += self.column_operands(ci, params, inputs, exclude=(ni,))
        if right_env is not None:
            ops.append(right_env)
        return ops

    def jacobian_keep(self, ni: int, operands: Sequence[Operand]) -> Tuple[int, ...]:
        """Jacobian axis order is (s, out axes..., node axes...): downstream
        Gram flattening then reshapes J without any transpose copy.

        When J carries NO output axes (the node owns them all — e.g. the
        first TT/conv-TT core) the sample axis goes LAST instead: the node
        axes are small (p, r), so sample-first would tile-pad the minor dims
        up to 8x (the env-array lesson, _keep_for_group) while sample-last
        pads ~1.3x. All consumers address J axes symbolically."""
        t = self.topology
        present = set()
        for axes, _ in operands:
            present.update(axes)
        node_axes = t.node_axes[ni]
        out_part = tuple(a for a in t.output_axes
                         if a in present and a not in node_axes)
        node_part = tuple(dict.fromkeys(a for a in node_axes if a in present))
        if not out_part:
            return node_part + (t.sample_axis,)
        return (t.sample_axis,) + out_part + node_part

    def jacobian(self, ni: int, params, inputs, left_env, right_env) -> Operand:
        """Environment of everything except node `ni`: the per-sample Jacobian
        of the (multi-linear) output w.r.t. that node (reference
        compute_jacobian_stack, network.py:101-113)."""
        ops = self.jacobian_operands(ni, params, inputs, left_env, right_env)
        keep = self.jacobian_keep(ni, ops)
        return (keep, contract(ops, keep, self.aux_precision))

    # ------------------------------------------------------ packed jacobian
    # TPU layout note (measured, see CLAUDE.md): a Jacobian materialised with
    # its node axes spread over several trailing dims pads catastrophically —
    # f32[2048,9,18,50,18] tiles to 8x its logical size, and the resulting
    # HBM traffic (not the Gram MXU work) dominated the round-1 flagship
    # epoch (1237 ms/chunk measured vs 366 ms of Gram). The packed build
    # contracts everything except the out/a0-carrying environment first,
    # flattens the remaining node axes into ONE trailing dim, and finishes
    # with a batched matmul, so the big intermediate is (S, C, A0, REST)
    # whose padding is ~1.5x. The flat index order (a0, rest...) equals the
    # node's own axis order, so A, b, and steps reshape for free.

    def packed_jacobian(self, ni: int, params, inputs, left_env, right_env):
        """Layout-packed Jacobian (S, [out...], A0, prod(rest node axes)).

        Returns None when the topology around `ni` doesn't fit the packing
        precondition (caller falls back to `jacobian`): needs >=3 node axes
        in J, each on exactly one operand, one operand carrying all present
        out axes plus node_axes[0], and the others free of out axes.
        """
        if os.environ.get("TNF_PACKED_J", "1") == "0":
            return None
        t = self.topology
        ops = self.jacobian_operands(ni, params, inputs, left_env, right_env)
        keep = self.jacobian_keep(ni, ops)
        s = t.sample_axis
        node_axes = t.node_axes[ni]
        out_part = tuple(a for a in keep if a in t.output_axes)
        node_part = tuple(a for a in keep if a in node_axes and a not in out_part)
        if len(node_part) < 3 or len(set(node_axes)) != len(node_axes):
            return None
        if tuple(a for a in node_axes if a in node_part) != node_part:
            return None  # J must keep node axes in node order
        a0 = node_part[0]
        rest = node_part[1:]
        if any(jnp.iscomplexobj(arr) for _, arr in ops):
            return None
        # the Gram stage needs all-or-single output coverage
        out_total = 1
        for a in t.output_axes:
            out_total *= t.axis_size[a]
        if len(out_part) != len(t.output_axes) and not (
                len(out_part) == 0 and out_total == 1):
            return None
        # each node axis must live on exactly one operand
        carriers = {a: [i for i, (ax, _) in enumerate(ops) if a in ax]
                    for a in node_part}
        if any(len(c) != 1 for c in carriers.values()):
            return None
        li = carriers[a0][0]
        L_axes, L_arr = ops[li]
        # the a0 carrier must hold the sample axis (it anchors the batched
        # matmul) and every out axis present; the others carry no out axes
        if s not in L_axes:
            return None
        if any(a not in L_axes for a in out_part):
            return None
        others = [op for i, op in enumerate(ops) if i != li]
        if any(a in ax for a in out_part for ax, _ in others):
            return None
        if any(a in L_axes for a in rest):
            return None
        other_axes = set()
        for ax, _ in others:
            other_axes.update(ax)
        bridges = tuple(a for a in L_axes
                        if a != s and a not in out_part and a != a0
                        and a in other_axes)
        extra_L = [a for a in L_axes
                   if a != s and a not in out_part and a != a0
                   and a not in bridges]
        if extra_L:
            return None  # L has axes going nowhere (unexpected)
        if not any(s in ax for ax, _ in others):
            return None  # stage-1 result must carry the sample axis
        # stage 1: everything but L, rest axes flattened last
        W_keep = (s,) + bridges + rest
        W = contract(others, W_keep, self.aux_precision)
        S_sz = W.shape[0]
        b_sz = 1
        for a in bridges:
            b_sz *= t.axis_size[a]
        r_sz = 1
        for a in rest:
            r_sz *= t.axis_size[a]
        W2 = W.reshape(S_sz, b_sz, r_sz)
        # stage 2: batched matmul over the sample axis
        perm = ([L_axes.index(s)] + [L_axes.index(a) for a in out_part]
                + [L_axes.index(a0)] + [L_axes.index(a) for a in bridges])
        L2 = jnp.transpose(L_arr, perm)
        c_sz = 1
        for a in out_part:
            c_sz *= t.axis_size[a]
        a0_sz = t.axis_size[a0]
        L3 = L2.reshape(S_sz, c_sz * a0_sz, b_sz)
        J2 = jax.lax.dot_general(L3, W2, (((2,), (1,)), ((0,), (0,))),
                                 precision=self.aux_precision)
        from ..ops.pallas.gram import gram_dtype
        gd = gram_dtype()
        if gd is not None:
            # Store the packed J directly in the Gram operand dtype: every
            # downstream consumer (Gram dot, K build, rhs, prediction)
            # either wants bf16 operands or runs at DEFAULT precision, which
            # rounds operands to bf16 anyway — so this loses nothing
            # numerically and halves J's HBM footprint (the f32 J was
            # written once and read three times per chunk, ~7 ms/chunk of
            # pure DMA at flagship shapes). The cast fuses into the dot's
            # epilogue; the f32 J never reaches HBM.
            J2 = J2.astype(gd)
        out_sizes = tuple(t.axis_size[a] for a in out_part)
        J2 = J2.reshape((S_sz,) + out_sizes + (a0_sz, r_sz))
        node_shape = tuple(t.axis_size[a] for a in node_axes)
        return {"arr": J2, "out_part": out_part, "n_out": len(out_part),
                "node_shape": node_shape, "a0_sz": a0_sz, "r_sz": r_sz,
                # size-1 output axes absent from J (the out_total==1
                # acceptance): packed_predict reinserts them so the packed
                # prediction has the same shape as the output_keep path
                "pad_out": len(t.output_axes) - len(out_part)}

    def packed_predict(self, pj, core: jax.Array) -> jax.Array:
        J2 = pj["arr"]
        core2 = core.reshape(pj["a0_sz"], pj["r_sz"]).astype(J2.dtype)
        nd = J2.ndim
        pred = jax.lax.dot_general(
            J2, core2, (((nd - 2, nd - 1), (0, 1)), ((), ())),
            precision=self.aux_precision,
            preferred_element_type=jnp.float32)
        if pj["pad_out"]:
            pred = pred.reshape(pred.shape + (1,) * pj["pad_out"])
        return pred

    def _packed_kernel_route(self, pj) -> bool:
        """Trace-time: will packed_gram_rhs take the tiled Pallas route?"""
        from ..ops.pallas.gram import _packed_enabled, gram_dtype
        J2 = pj["arr"]
        if jnp.iscomplexobj(J2):
            return False
        gd = gram_dtype()
        D = pj["a0_sz"] * pj["r_sz"]
        return (self.use_pallas and self.mesh is None
                and (gd is None or _packed_enabled())
                and D >= int(os.environ.get("TNF_PACKED_SYRK_MIN_D", "4096")))

    def packed_gram_acc_init(self, pj):
        """Zeros chunk-accumulator for the in-kernel accumulation route —
        PADDED to the kernel's tile grid (Dp, Dp) f32 — or None when the
        tiled kernel route won't be taken (caller keeps its (D, D) carry).
        Passing the scan carry into the kernel replaces the separate
        full-matrix A_acc + A pass (~3 GB HBM traffic per chunk at
        D=16200) with an upper-tiles-only read inside the pipeline.

        Default OFF (TNF_PALLAS_ACC=1 enables): measured NEUTRAL at the
        flagship A2 update on the bf16 kernels (70 vs 68 ms/chunk) — the
        acc tile's VMEM buffers force the sample block 2048 -> 1536 and the
        extra input stream offsets the saved add pass. The int8 tier
        (round 5) runs a quantized acc kernel whose half-size operand slabs
        keep the full 2048 block (planned at itemsize 1); measure per
        workload before enabling."""
        from ..ops.pallas.gram import band_enabled, plan_tiles
        if (os.environ.get("TNF_PALLAS_ACC", "0") != "1"
                and not band_enabled()):
            return None
        if not self._packed_kernel_route(pj):
            return None
        D = pj["a0_sz"] * pj["r_sz"]
        _, _, _, Dp = plan_tiles(D, jnp.dtype(pj["arr"].dtype).itemsize,
                                 acc=True)
        return jnp.zeros((Dp, Dp), jnp.float32)

    def packed_gram_finisher(self, pj):
        """fn(A_raw_padded) -> (D, D) symmetric A for the in-kernel-acc
        carry: band layout (mirror_band) under TNF_PALLAS_BAND, raw-upper
        (slice + mirror_gram) otherwise. Static — resolved at trace time
        alongside packed_gram_acc_init."""
        from ..ops.pallas.gram import (band_enabled, mirror_band,
                                       mirror_gram, plan_tiles)
        D = pj["a0_sz"] * pj["r_sz"]
        if band_enabled():
            # band implies the quant route, which plans at the int8 itemsize
            tile, _, n, _ = plan_tiles(D, 1, acc=True)

            def fin(A):
                return mirror_band(A, n, tile)[:D, :D]
            return fin
        return lambda A: mirror_gram(A[:D, :D])

    def packed_gram_pad(self, pj):
        """(Dp, tile) of the tiled kernel route's PADDED raw A, or None when
        that route won't be taken. defer_mirror callers that get a padded A
        accumulate chunks with ops.pallas.gram.add_packed_upper — an add
        that walks the kernels' (k, i) pair map and touches only the
        visited upper tiles (measured 5.0 -> ~2.7 ms/chunk at D=16,200 vs
        XLA's full-matrix add, which spends half its traffic on the
        undefined lower triangle) — and slice [:D, :D] once after their
        scan. tile is the grid's D-tile: the add must use the SAME pair
        map as the kernel that produced the operands."""
        if not self._packed_kernel_route(pj):
            return None
        from ..ops.pallas.gram import plan_tiles
        D = pj["a0_sz"] * pj["r_sz"]
        tile, _, _, Dp = plan_tiles(D, jnp.dtype(pj["arr"].dtype).itemsize)
        return Dp, tile

    def packed_gram_rhs(self, pj, grad: jax.Array, hess: jax.Array,
                        defer_mirror: bool = False, acc=None):
        """A = Jᵀ H J, b = Jᵀ g on the packed Jacobian. Requires the out
        axes present in J to be ALL output axes (or none); the sweep's
        conv-TT/TT nodes satisfy this. Honors TNF_GRAM_DTYPE=bf16.

        defer_mirror=True changes the return to (A, b, deferred): when the
        packed-syrk kernel route is taken, A comes back RAW (exact upper
        triangle, undefined lower — ops.pallas.gram mirror=False) and
        `deferred` is True (a trace-time Python bool). The caller accumulates
        raw chunks and applies mirror_gram() ONCE before the solve — the
        mirror's full-matrix transpose costs ~15 ms at D=16200, which per
        chunk would eat the kernel's entire win."""
        t = self.topology
        J2 = pj["arr"]
        n_out = pj["n_out"]
        node_shape = pj["node_shape"]
        S_sz = J2.shape[0]
        out_sizes = J2.shape[1:1 + n_out]
        C_sz = 1
        for d in out_sizes:
            C_sz *= d
        D0, D1 = pj["a0_sz"], pj["r_sz"]
        J3 = J2.reshape(S_sz, C_sz, D0, D1)
        diag = hess.ndim == grad.ndim
        g2 = grad.reshape(S_sz, -1).astype(J3.dtype)

        def rhs_from_J3():
            return jax.lax.dot_general(J3, g2, (((0, 1), (0, 1)), ((), ())),
                                       precision=self.aux_precision,
                                       preferred_element_type=jnp.float32)
        from ..ops.pallas.gram import _packed_enabled, gram_dtype
        gd = gram_dtype() if not jnp.iscomplexobj(J2) else None
        dot_prec = (jax.lax.Precision.DEFAULT if gd is not None
                    else self.precision)
        D = D0 * D1
        # Big-D fast path: the packed-grid Pallas syrk computes and DMAs only
        # the upper-triangle tiles (benchmarks/gram_bench.py ladder). The
        # packed J3 is (S, C, D0, D1) with ~1.0-1.5x padding, so flattening
        # to (S*C, D) is a cheap relayout copy, not the round-1 8x-padded OOM
        # (that was the UNpacked multi-axis J). f32: 32.7 vs 26.5 TFLOP/s for
        # the multi-dot (round 2). bf16: the packed grid halves the DMA too —
        # kernel 42.6 ms vs XLA's 52.8 ms flat dot at flagship shape (slope-
        # timed, axon RTT excluded) — but ONLY
        # with the mirror deferred to the accumulation consumer; the round-2
        # visit-all syrk (TNF_PALLAS_PACKED=0) still paid the skipped tiles'
        # DMA and lost at bf16, so that fallback keeps the XLA multi-dot.
        use_kernel = (self.use_pallas
                      and not jnp.iscomplexobj(J2)
                      and (gd is None or _packed_enabled())
                      and D >= int(os.environ.get("TNF_PACKED_SYRK_MIN_D",
                                                  "4096")))
        mesh_tiled = False
        if use_kernel and self.mesh is not None and acc is None:
            # The tiled pipeline runs under shard_map when every shard holds
            # WHOLE samples (the class rows of a sample must stay together
            # for the K mix and the symmetric mirror): each device retiles
            # and grams its local rows at single-chip kernel throughput and
            # the raw partial (A, b) are psum'd — the same sharded
            # accumulation GSPMD performs for the XLA dot paths. Samples
            # shard over ALL mesh axes (_mesh_row_axes): under a 2-D
            # data × model mesh the in_specs reshard J from its GSPMD
            # layout (rows over data, patches over model) to row shards,
            # so the kernel tier stays active under TP too.
            ndev = self._mesh_ndev()
            mesh_tiled = ndev > 0 and S_sz % ndev == 0
        if use_kernel and (self.mesh is None or mesh_tiled):
            # Tiled fast path: retile J ONCE to (n, rows, tile) slabs
            # and feed the SAME tiled array to the rhs dot, the K build and
            # the Gram kernel — tiled slab reads realize ~650 GB/s vs ~480
            # for (BS, tile) blocks of the row-major J (kernel 42.6 ->
            # 30.5 ms at flagship shape), and amortizing one retile over all
            # three consumers is what makes it a net win end-to-end
            # (retiling per kernel operand measured a net LOSS: 72 -> 78
            # ms/chunk on the A2 update).
            from ..ops.pallas.gram import (_on_tpu, gram_pair_tiled,
                                           gram_pair_tiled_q, gram_quant,
                                           plan_tiles, quantize_tiled,
                                           retile_hmix, retile_rows,
                                           weighted_gram_tiled)
            interp = not _on_tpu()
            # int8 tier (TNF_GRAM_DTYPE=int8): quantize both Gram operands
            # per (slab, sample-block, column) and run the int8 packed-syrk
            # pair kernel — the bf16 kernel is DMA-bound, so int8 halves
            # its bytes on top of the 1.45x MXU rate. Everything else on
            # this path (retile/kmix, rhs) stays on the bf16 tier. With an
            # in-kernel chunk accumulator (acc) the int8 acc kernel runs —
            # its half-size operand slabs leave VMEM room to keep the full
            # sample block (the bf16 acc variant had to shrink 2048 -> 1536,
            # which ate the saved add pass; plan with the int8 itemsize).
            quant = gd is not None and gram_quant()
            tile, block, n, Dp = plan_tiles(
                D, 1 if (quant and acc is not None)
                else jnp.dtype(J3.dtype).itemsize, acc=acc is not None)
            mirror = not defer_mirror and acc is None
            # Merged int8 tiles (TNF_INT8_MERGE=1 opts in): the quantizer
            # fuses two ADJACENT D-slabs into one 1024-wide int8 tile for
            # free (per-column scales are width-independent — bit-identical
            # quantization), and the packed pair grid's slab traffic scales
            # as D/tile, so the Gram kernel's DMA would halve (a standalone
            # tile-1024 grid once measured 14.8 vs 18.4 ms,
            # benchmarks/int8_tile1024_probe.py). Only the int8 kernel sees
            # the wide tiles — the shared bf16 slabs (kmix / rhs / retile
            # consumers) stay at the narrow tile. Dp is unchanged
            # ((n/2)·2·tile), so the raw-upper chunk accumulation
            # (add_packed_upper at the narrow tile — a subset of the
            # written coarse-upper tiles: k<=i implies k//2<=i//2) and the
            # final triu mirror are untouched. OPT-IN, default OFF: the
            # tile-1024 pair kernel's out tile + int32/f32 dot temps are
            # 3 x 4 MB of VMEM before the operand windows, and on re-test
            # (2026-08-19 evening, benchmarks/int8_merge_probe.py) the
            # probe's (1024, 1024) plan no longer compiles (Mosaic
            # compile-helper failure) while the compilable 512-row sample
            # block measures 22.2 ms — SLOWER than the narrow plan's 18.4
            # (4x the grid visits eat the DMA saving). Semantics are
            # interpret-verified (tests/test_pallas.py merge tests).
            qmerge = (2 if quant and acc is None and n % 2 == 0
                      and tile == 512
                      and os.environ.get("TNF_INT8_MERGE", "0") == "1"
                      else 1)
            qblock = min(block, 512) if qmerge > 1 else block

            def qpair(Jt_, Kt_, acc_s=None):
                Q1, s1 = quantize_tiled(Jt_, qblock, interpret=interp,
                                        merge=qmerge)
                Q2, s2 = quantize_tiled(Kt_, qblock, interpret=interp,
                                        merge=qmerge)
                if acc_s is not None:
                    from ..ops.pallas.gram import (band_enabled,
                                                   gram_pair_band_q)
                    if band_enabled():
                        # resident-band chain: carry rides the kernels,
                        # result in band layout (packed_gram_finisher).
                        # The carry comes from packed_gram_acc_init, which
                        # plans at the stored (bf16) itemsize while this
                        # route plans at int8 — tile (hence Dp) agrees at
                        # every budget in _clamp_packed today; assert so a
                        # future clamp divergence fails loudly at trace
                        # time instead of mis-tiling the carry.
                        assert acc_s.shape == (Dp, Dp), (acc_s.shape, Dp)
                        return gram_pair_band_q(Q1, s1, Q2, s2, acc_s,
                                                interpret=interp, tile=tile)
                return gram_pair_tiled_q(Q1, s1, Q2, s2, interpret=interp,
                                         tile=tile * qmerge, mirror=mirror,
                                         acc=acc_s)
            # Fused retile+mix kernel (TNF_KMIX=0 reverts to the slab-wise
            # XLA K einsum): one read of J produces class-major Jt AND
            # Kt = H*J — XLA lowered the (S,C,C)x(S,C,D) mixing as an MXU
            # batched matmul with C~9 padded to 128 (~14x wasted work,
            # 8.8 ms/chunk at the flagship) where the kernel's unrolled VPU
            # FMAs ride the retile's DMA. Rows come back (c, s)-ordered;
            # the Gram/rhs contract over rows, so only g must reorder.
            # Default ON since measured on the v5e at the flagship A2
            # update: bf16 64 -> 63, f32 216 -> 211 ms/chunk (the fused
            # kernel's VMEM-clamped sample block eats most of the 8.8 ms
            # einsum saving, but it stays a net win at both dtypes).
            kmix = (not diag and C_sz > 1
                    and os.environ.get("TNF_KMIX", "1") == "1")

            def tiled(J3s, g2s, hess_s, acc_s):
                Ss = J3s.shape[0]
                rows = Ss * C_sz
                if kmix:
                    Jt4, Kt4 = retile_hmix(
                        J3s, hess_s.reshape(Ss, C_sz, C_sz), n, tile,
                        interpret=interp)
                    Jt = Jt4.reshape(n, rows, tile)
                    Kt = Kt4.reshape(n, rows, tile)
                    gvec = jnp.transpose(  # class-major rows
                        g2s.reshape(Ss, C_sz)).reshape(rows)
                else:
                    Jt = retile_rows(J3s.reshape(rows, D), n, tile)
                    gvec = g2s.reshape(rows)
                b = jax.lax.dot_general(
                    Jt, gvec.astype(J3s.dtype),
                    (((1,), (0,)), ((), ())),
                    precision=self.aux_precision,
                    preferred_element_type=jnp.float32).reshape(Dp)[:D]
                if diag:
                    if quant:
                        # no fused-weighting int8 form (the f32 weight can't
                        # ride an int8 operand): materialise K = h*J and
                        # quantize it — K's scales absorb the weighting.
                        # K must be the SAME dtype as Jt: quantize_tiled's
                        # VMEM clamp is itemsize-dependent, and the pair
                        # kernel requires both operands to share one
                        # sample-block size (an f32 K halves its block at
                        # the bf16-planned shape, misaligning the scales)
                        hr = hess_s.reshape(rows).astype(jnp.float32)
                        A = qpair(Jt, (Jt.astype(jnp.float32)
                                       * hr[None, :, None]).astype(Jt.dtype),
                                  acc_s)
                    else:
                        # fused weighting: the H-weighted copy of J never
                        # hits HBM
                        A = weighted_gram_tiled(
                            Jt, hess_s.reshape(rows).astype(jnp.float32),
                            interpret=interp, tile=tile, block=block,
                            mirror=mirror, acc=acc_s)
                elif kmix:
                    if quant:
                        A = qpair(Jt, Kt, acc_s)
                    else:
                        A = gram_pair_tiled(Jt, Kt, interpret=interp,
                                            tile=tile, block=block,
                                            mirror=mirror, acc=acc_s)
                else:
                    H2 = hess_s.reshape(Ss, C_sz, C_sz).astype(J3s.dtype)
                    # K slab-wise from the tiled J: class mixing acts on the
                    # rows axis, so tiling D commutes with the K build
                    Kt = jnp.einsum(
                        "scd,nsdt->nsct", H2, Jt.reshape(n, Ss, C_sz, tile),
                        precision=dot_prec).reshape(n, rows, tile)
                    # (an earlier "198 ms XLA pathology" that gated int8
                    # off this branch was a benchmark dispatch bug — the
                    # f32 route mislabeled tiledq; the real int8+einsum
                    # composition measures 39.9 ms vs bf16's 49.6 at the
                    # flagship shape, benchmarks/gram_bench.py tiledq)
                    if quant:
                        A = qpair(Jt, Kt, acc_s)
                    else:
                        A = gram_pair_tiled(Jt, Kt, interpret=interp,
                                            tile=tile, block=block,
                                            mirror=mirror, acc=acc_s)
                return A, b

            J3v = J3.reshape(S_sz, C_sz, D)
            if mesh_tiled:
                from jax.sharding import PartitionSpec as P
                try:
                    from jax import shard_map
                    kw = {"check_vma": False}
                except ImportError:  # older jax name
                    from jax.experimental.shard_map import shard_map
                    kw = {"check_rep": False}
                ax = self._mesh_row_axes()

                def local(J3s, g2s, hess_s):
                    A, b = tiled(J3s, g2s, hess_s, None)
                    return (jax.lax.psum(A[:D, :D], ax),
                            jax.lax.psum(b, ax))

                A, b = shard_map(
                    local, mesh=self.mesh,
                    in_specs=(P(ax), P(ax), P(ax)),
                    out_specs=(P(), P()), **kw)(
                        J3v, g2.reshape(S_sz, C_sz), hess)
            else:
                A, b = tiled(J3v, g2, hess, acc)
            if acc is not None:
                # A is the updated PADDED (Dp, Dp) raw carry: acc + this
                # chunk's contribution, accumulated inside the kernel.
                # Caller slices [:D, :D] and mirrors once after its scan.
                return A, b, True
            if defer_mirror and not mesh_tiled:
                # PADDED (Dp, Dp) raw: the caller accumulates chunks with
                # add_packed_upper (see packed_gram_pad) and slices
                # [:D, :D] once after its scan — slicing here would force
                # a full-matrix relayout copy per chunk for nothing.
                return A, b, True
            A = A[:D, :D].astype(jnp.float32)
            if defer_mirror:
                return A, b, True
            return A, b
        assert acc is None, (
            "acc accumulation requires the tiled kernel route; callers gate "
            "on packed_gram_acc_init() which mirrors the same conditions")
        b = rhs_from_J3()
        if use_kernel:
            rows = S_sz * C_sz
            Jf = J3.reshape(rows, D)
            if diag:
                # fused weighting: the H-weighted copy of J never hits HBM
                A = self._kernel_gram(
                    "weighted", Jf, hess.reshape(rows).astype(jnp.float32),
                    mirror=not defer_mirror)
            else:
                H2 = hess.reshape(S_sz, C_sz, C_sz).astype(J3.dtype)
                K3 = jax.lax.dot_general(
                    H2, J3.reshape(S_sz, C_sz, D),
                    (((1,), (1,)), ((0,), (0,))),
                    precision=dot_prec).reshape(S_sz, C_sz, D0, D1)
                A = self._kernel_gram("pair", Jf, K3.reshape(rows, D),
                                      row_group=C_sz,
                                      mirror=not defer_mirror)
            A = A.astype(jnp.float32)  # kernels accumulate f32; keep it
            if defer_mirror:
                return A, b.reshape(D), True
            return A, b.reshape(D)
        if diag:
            h2 = hess.reshape(S_sz, -1)
            K3 = J3 * h2[:, :, None, None].astype(J3.dtype)
        else:
            H2 = hess.reshape(S_sz, C_sz, C_sz).astype(J3.dtype)
            # K[s,c',d0,d1] = sum_c H[s,c,c'] J[s,c,d0,d1]; with a bf16 J
            # the K build and K itself stay bf16 (C-sized reduction, far
            # below the operand rounding)
            K3 = jax.lax.dot_general(
                H2, J3.reshape(S_sz, C_sz, D0 * D1),
                (((1,), (1,)), ((0,), (0,))),
                precision=dot_prec).reshape(S_sz, C_sz, D0, D1)
        Jop, Kop = J3, K3
        if gd is not None:
            Jop, Kop = J3.astype(gd), K3.astype(gd)
        A = jax.lax.dot_general(Jop, Kop, (((0, 1), (0, 1)), ((), ())),
                                precision=dot_prec,
                                preferred_element_type=jnp.float32)
        # Returned FLAT — (D, D) and (D,) — in the node's own flattening
        # order ((a0, rest) == node axes). The caller accumulates and solves
        # in this form: a (D, D) array tiles at ~1.0x, while the node-shaped
        # 6-D form pads ~8x at flagship shapes and carrying it through the
        # chunk scan costs ~17 GB of HBM traffic per chunk (measured: the
        # update dropped from 981 to ~400 ms/chunk with the flat carry).
        D = D0 * D1
        if defer_mirror:
            return A.reshape(D, D), b.reshape(D), False
        return A.reshape(D, D), b.reshape(D)

    def predict_from_jacobian(self, ni: int, J: Operand, core: jax.Array) -> jax.Array:
        """out = J · core — exact because the network is multi-linear in each
        node. Replaces the reference's separate full forward per batch
        (network.py:456)."""
        J_axes, J_arr = J
        node_axes = self.topology.node_axes[ni]
        return contract([(J_axes, J_arr), (node_axes, core)], self.output_keep(),
                        self.aux_precision)

    # ------------------------------------------------------------------- A, b
    def gram_and_rhs(self, ni: int, J: Operand, grad: jax.Array,
                     hess: jax.Array, big_flat_ok: bool = False,
                     defer_ownout=None):
        """A = Jᴴ H J (Gram over node dims), b = Jᴴ g.

        grad axes: (s, *output_axes); hess axes (s, *out, *out') for a full
        Hessian or (s, *out) for a diagonal one. Output axes not owned by the
        node are summed directly — equivalent to the reference's broadcast
        expand_labels + einsum (network.py:183-215) but without materialising
        the expanded Jacobian.

        defer_ownout (optional dict): trace-time cell for chunk-scanning
        callers. If the structured output-owning-node path fires AND the
        Hessian is symmetric in its class pair (the Bregman/Gauss-Newton
        contract), A comes back RAW as the (P, DJ, DJ) upper class-pair
        blocks (P = C(C+1)/2) with `defer_ownout["plan"]` set — the caller
        accumulates the raw form across chunks and calls expand_ownout()
        ONCE before the solve. This drops the per-chunk K = H·J build and
        Gram dot from C² to C(C+1)/2 class pairs and shrinks the scan carry
        likewise (the flagship A1 update is DMA-bound on exactly these).
        """
        t = self.topology
        J_axes, J_arr = J
        node_axes = t.node_axes[ni]
        out_axes = t.output_axes
        s = t.sample_axis
        Jc = J_arr.conj() if jnp.iscomplexobj(J_arr) else J_arr

        present = set(J_axes) | set(out_axes) | {s}
        missing = [a for a in node_axes if a not in present]
        if missing:
            raise ValueError(f"node axes {missing} appear in neither jacobian nor outputs")

        g_axes = (s,) + out_axes
        b = contract([(J_axes, Jc), (g_axes, grad)], node_axes,
                     self.aux_precision)

        diag = hess.ndim == grad.ndim

        # ---- flattened-matmul fast path -----------------------------------
        # When the node owns no output axis and all its axes are in J, the
        # Gram is A = Mᴴ K with M = J reshaped (S*C, D) and K the H-weighted
        # copy. One dot_general is ~3x faster than the equivalent 6-axis
        # einsum on TPU (measured at the flagship shapes, both precisions).
        flattenable = (
            not any(a in out_axes for a in node_axes)
            and all(a in J_axes for a in node_axes)
            and set(a for a in J_axes if a != s) <= set(node_axes) | set(out_axes)
            and len(set(node_axes)) == len(node_axes)
            and len(set(J_axes)) == len(J_axes)
        )
        out_in_J = [a for a in out_axes if a in J_axes]
        big_node = False
        if flattenable:
            # the remote TPU compiler crashes on very large flattened-Gram
            # update programs (observed at D=16200); those nodes use a
            # reshape-free multi-contracting-dim dot instead.
            # Tunable: TNF_FLAT_GRAM_MAX_D.
            D_est = 1
            for a in node_axes:
                D_est *= J_arr.shape[J_axes.index(a)]
            big_node = (not big_flat_ok) and D_est > int(
                os.environ.get("TNF_FLAT_GRAM_MAX_D", "8192"))
        if (flattenable and big_node and not diag
                and len(out_in_J) == len(out_axes)
                and tuple(J_axes) == (s,) + tuple(out_in_J) + tuple(node_axes)):
            # K[s,c',i...] = sum_c H[s,c,c'] J[s,c,i...]; A = sum_{s,c'} Jᴴ K
            # with (s, out) as joint contracting dims — no reshapes of J.
            # Big nodes NEVER flatten: reshaping the multi-axis J to (S*C, D)
            # forces XLA to materialise a tiled-layout copy whose minor-dim
            # padding explodes ~8x at flagship shapes — f32[2048,9,18,50,18]
            # pads to 8.9 GB and the compile fails with an HBM OOM (this is
            # the round-1 "remote compiler crash"). The multi-contracting-dim
            # dot consumes J in place. With TNF_GRAM_DTYPE=bf16 the operands
            # are cast (single-pass MXU, f32 accumulation) — measured vs the
            # 6-pass f32-HIGHEST form in benchmarks/gram_bench.py.
            n_out = len(out_in_J)
            H_axes = (s,) + tuple(out_axes) + tuple(_prime(a) for a in out_axes)
            K_axes = (s,) + tuple(_prime(a) for a in out_axes) + tuple(node_axes)
            from ..ops.pallas.gram import gram_dtype
            gd = gram_dtype() if not jnp.iscomplexobj(J_arr) else None
            # with bf16 Gram operands the K build drops to single-pass
            # precision too — its C-sized reductions are far below the
            # rounding already applied to the operands
            K_prec = (jax.lax.Precision.DEFAULT if gd is not None
                      else self.precision)
            K = contract([(H_axes, hess), (J_axes, J_arr)], K_axes, K_prec)
            cdims = tuple(range(1 + n_out))
            J_op, K_op = Jc, K
            dot_prec = self.precision
            if gd is not None:
                J_op, K_op = Jc.astype(gd), K.astype(gd)
                dot_prec = jax.lax.Precision.DEFAULT
            A = jax.lax.dot_general(J_op, K_op, ((cdims, cdims), ((), ())),
                                    precision=dot_prec,
                                    preferred_element_type=J_arr.dtype)
            return A, b
        if flattenable and big_node:
            flattenable = False
        if flattenable and not diag:
            # full Hessian must cover exactly the out axes present in J
            flattenable = len(out_in_J) == len(out_axes)
        if flattenable and diag:
            # mixed presence (some out axes in J, some not) under a diagonal
            # Hessian is not flattenable — einsum fallback
            flattenable = len(out_in_J) in (0, len(out_axes))
        if flattenable:
            perm = ([J_axes.index(s)]
                    + [J_axes.index(a) for a in out_in_J]
                    + [J_axes.index(a) for a in node_axes])
            Jp = jnp.transpose(J_arr, perm)
            S = Jp.shape[0]
            C = 1
            for a in out_in_J:
                C *= J_arr.shape[J_axes.index(a)]
            D = Jp.size // (S * C)
            node_shape = tuple(J_arr.shape[J_axes.index(a)] for a in node_axes)
            J3 = Jp.reshape(S, C, D)
            if diag:
                W = hess.reshape(S, -1)
                if not out_in_J:
                    W = W.sum(axis=1, keepdims=True)  # C == 1
            else:
                W = hess.reshape(S, C, C)
            if self.use_pallas and not jnp.iscomplexobj(J_arr):
                from ..ops.pallas.gram import gram_dtype
                gd = gram_dtype()
                J2 = J3.reshape(S * C, D)
                if gd is not None:
                    J2 = J2.astype(gd)
                if diag:
                    # fused-weighting kernel: the weighted copy of J never
                    # hits HBM
                    A = self._kernel_gram("weighted", J2, W.reshape(S * C))
                else:
                    K3 = jnp.einsum("scd,sci->sdi", W.astype(J3.dtype), J3,
                                    precision=self.precision)
                    K2 = K3.reshape(S * C, D)
                    if gd is not None:
                        K2 = K2.astype(gd)
                    A = self._kernel_gram("pair", J2, K2, row_group=C)
            else:
                A = _flat_gram(J3, W, diag, self.precision)
            return A.reshape(node_shape + node_shape), b

        # ---- general einsum path ------------------------------------------
        primed = {a: _prime(a) for a in set(node_axes) | set(out_axes)}
        if diag and any(a in out_axes for a in node_axes):
            # A node-owned output axis makes the Gram block-diagonal in it;
            # einsum can't emit a delta, so embed the diagonal explicitly
            # (rare: diagonal Hessian + multi-class output on this node).
            hess = _embed_diag(hess)
            diag = False

        # ---- structured path for output-owning nodes ----------------------
        # When the node owns ALL output axes (the first TT/conv-TT core), J
        # carries none of them and A[c,d,c',d'] = sum_s H[s,c,c'] J[s,d]
        # J[s,d'] — an H-weighted batch of outer products. Materialising
        # K[s,c,c',d] = H*J and finishing with ONE dot over s does the same
        # FLOPs as the best einsum path but with controlled layout (minor dim
        # DJ large) and a bf16-operand route under TNF_GRAM_DTYPE — measured
        # 4x on the flagship A1 update (the einsum ran ~7 TFLOP/s).
        if (not diag and out_axes
                and all(a in node_axes for a in out_axes)
                and not any(a in J_axes for a in out_axes)
                and not jnp.iscomplexobj(J_arr)):
            rest = tuple(a for a in node_axes if a not in out_axes)
            if (set(J_axes) == {s, *rest}
                    and len(J_axes) == 1 + len(rest)
                    and len(set(node_axes)) == len(node_axes)):
                S_sz = J_arr.shape[J_axes.index(s)]
                C_sz = 1
                for a in out_axes:
                    C_sz *= t.axis_size[a]
                DJ = 1
                for a in rest:
                    DJ *= t.axis_size[a]
                cap = int(os.environ.get("TNF_OWNOUT_K_MAX_ELEMS",
                                         str(1 << 28)))
                if S_sz * C_sz * C_sz * DJ <= cap:
                    from ..ops.pallas.gram import gram_dtype
                    gd = gram_dtype()
                    perm = [J_axes.index(s)] + [J_axes.index(a) for a in rest]
                    Jf = jnp.transpose(J_arr, perm).reshape(S_sz, DJ)
                    Hf = hess.reshape(S_sz, C_sz, C_sz)
                    Jop = Jf if gd is None else Jf.astype(gd)
                    Hop = Hf if gd is None else Hf.astype(gd)
                    out_sizes = tuple(t.axis_size[a] for a in out_axes)
                    rest_sizes = tuple(t.axis_size[a] for a in rest)
                    O, R = len(out_axes), len(rest)
                    upos = {a: i for i, a in enumerate(out_axes)}
                    upos.update({a: 2 * O + j for j, a in enumerate(rest)})
                    ppos = {a: O + i for i, a in enumerate(out_axes)}
                    ppos.update({a: 2 * O + R + j for j, a in enumerate(rest)})
                    perm_out = tuple([upos[a] for a in node_axes]
                                     + [ppos[a] for a in node_axes])
                    if (self.use_pallas and self.mesh is None
                            and os.environ.get("TNF_OWNOUT_KERNEL") == "1"
                            and DJ >= int(os.environ.get(
                                "TNF_OWNOUT_KERNEL_MIN_DJ", "256"))):
                        # NB: checked BEFORE the default-on deferral so the
                        # explicit opt-in stays effective for sweep-driven
                        # updates (which always pass defer_ownout once the
                        # probe sets a plan) — ADVICE r03.
                        # fused class-pair kernel: the H weighting loads
                        # inside the kernel (no (S, C², DJ) K4 in HBM) and
                        # only the C(C+1)/2 upper class blocks are computed
                        # (A[c',.,c,.] = A[c,.,c',.]ᵀ over d — one mirror
                        # after). ops/pallas/gram.py::own_out_gram.
                        # OPT-IN (TNF_OWNOUT_KERNEL=1): measured SLOWER than
                        # the structured dot at the flagship A1 (25 vs 22
                        # ms/chunk) — the structured form's Kronecker
                        # factorisation already does 4.5x fewer FLOPs than
                        # a syrk, and at DJ=900 the kernel's 180-point grid
                        # is overhead-bound. Kept for high-C / large-DJ
                        # own-out nodes where the C(C+1)/2 saving can win.
                        from ..ops.pallas.gram import (
                            _on_tpu, mirror_own_out, own_out_gram,
                            plan_tiles, retile_rows)
                        tile_, block_, nd_, _ = plan_tiles(
                            DJ, jnp.dtype(Jop.dtype).itemsize)
                        Jt = retile_rows(Jop, nd_, tile_)
                        A4 = own_out_gram(Jt, Hf, C_sz,
                                          interpret=not _on_tpu(),
                                          tile=tile_, block=block_)
                        A4 = mirror_own_out(A4)[:, :, :DJ, :DJ]
                        A5 = A4.reshape(out_sizes + out_sizes
                                        + rest_sizes + rest_sizes)
                        return (jnp.transpose(A5, perm_out)
                                .astype(J_arr.dtype), b)
                    if (defer_ownout is not None and C_sz > 1
                            and os.environ.get("TNF_OWNOUT_DEFER",
                                               "1") != "0"):
                        # upper class pairs only: H[s,c,c'] = H[s,c',c]
                        # (loss contract), so A[c',.,c,.] = A[c,.,c',.]ᵀ(d↔d')
                        # — compute P = C(C+1)/2 of the C² blocks and let the
                        # caller expand once after its chunk scan. Same dot,
                        # 45% less K traffic/FLOPs at the flagship C=9.
                        iu, ju = np.triu_indices(C_sz)
                        Kup = (Hop[:, iu, ju, None]
                               * Jop[:, None, :])  # (S, P, DJ)
                        dot_prec = (self.precision if gd is None
                                    else jax.lax.Precision.DEFAULT)
                        A_raw = jax.lax.dot_general(
                            Kup.reshape(S_sz, len(iu) * DJ), Jop,
                            (((0,), (0,)), ((), ())),
                            precision=dot_prec,
                            preferred_element_type=J_arr.dtype)
                        defer_ownout["plan"] = (
                            C_sz, DJ, out_sizes, rest_sizes, perm_out)
                        return A_raw.reshape(len(iu), DJ, DJ), b
                    K4 = Hop[:, :, :, None] * Jop[:, None, None, :]
                    dot_prec = (self.precision if gd is None
                                else jax.lax.Precision.DEFAULT)
                    A_raw = jax.lax.dot_general(
                        K4.reshape(S_sz, C_sz * C_sz * DJ), Jop,
                        (((0,), (0,)), ((), ())),
                        precision=dot_prec,
                        preferred_element_type=J_arr.dtype)
                    A5 = A_raw.reshape(out_sizes + out_sizes
                                       + rest_sizes + rest_sizes)
                    # computed axis order: (out..., out'..., rest..., rest');
                    # transpose to keep_A = node_axes + primed(node_axes)
                    return jnp.transpose(A5, perm_out), b
        if diag:
            # H[s, c] couples only c==c': both Jacobian copies share the
            # unprimed out axes; only node axes get primed on the second copy.
            H_axes = (s,) + out_axes
            J2_axes = tuple(
                a if (a == s or a in out_axes) else primed[a] for a in J_axes
            )
        else:
            H_axes = (s,) + out_axes + tuple(primed[a] for a in out_axes)
            J2_axes = tuple(primed.get(a, a) if a != s else s for a in J_axes)
        keep_A = node_axes + tuple(primed.get(a, a) for a in node_axes)
        A = contract([(J_axes, Jc), (J2_axes, J_arr), (H_axes, hess)],
                     keep_A, self.precision)
        return A, b

    @staticmethod
    def expand_ownout(A_raw: jax.Array, plan) -> jax.Array:
        """Expand a deferred own-out Gram (see gram_and_rhs defer_ownout).

        A_raw: (P, DJ, DJ) accumulated upper class-pair blocks, P = C(C+1)/2
        in np.triu_indices order. Returns the node²-shaped A exactly as the
        non-deferred structured path would: lower pairs are the (d, d')
        transpose of their upper mirror (H symmetric per sample — the loss
        contract), so the expansion is a static gather + one masked
        transpose, run ONCE per update instead of per chunk."""
        C, DJ, out_sizes, rest_sizes, perm_out = plan
        iu, ju = np.triu_indices(C)
        pidx = np.zeros((C, C), np.int32)
        pidx[iu, ju] = np.arange(len(iu))
        pidx[ju, iu] = pidx[iu, ju]
        Afull = A_raw[pidx.reshape(-1)].reshape((C, C, DJ, DJ))
        upper = jnp.asarray(np.triu(np.ones((C, C), bool)))
        Afull = jnp.where(upper[:, :, None, None], Afull,
                          jnp.transpose(Afull, (0, 1, 3, 2)))
        A5 = Afull.reshape(out_sizes + out_sizes + rest_sizes + rest_sizes)
        return jnp.transpose(A5, perm_out)

    # ------------------------------------------------------- matrix-free tier
    def jacobian_apply(self, ni: int, operands: Sequence[Operand],
                       v: jax.Array) -> jax.Array:
        """(J v)[s, *out] computed as ONE fused contraction over the jacobian
        operands — J itself is never materialised (contrast with the reference
        matvec that builds J every iteration, network.py:908-916)."""
        t = self.topology
        keep = (t.sample_axis,) + t.output_axes
        ops = list(operands) + [(t.node_axes[ni], v)]
        return contract(ops, keep, self.precision)

    def jacobian_transpose_apply(self, ni: int, operands: Sequence[Operand],
                                 u: jax.Array) -> jax.Array:
        """(Jᴴ u)[node axes] as one fused contraction; u axes (s, *out)."""
        t = self.topology
        u_axes = (t.sample_axis,) + t.output_axes
        ops = [(axes, arr.conj() if jnp.iscomplexobj(arr) else arr)
               for axes, arr in operands] + [(u_axes, u)]
        return contract(ops, t.node_axes[ni], self.precision)

    def hessian_apply(self, hess: jax.Array, u: jax.Array) -> jax.Array:
        """H u over the output axes; diagonal (ndim == u.ndim) or full."""
        if hess.ndim == u.ndim:
            return hess * u
        t = self.topology
        s = t.sample_axis
        out = t.output_axes
        H_axes = (s,) + out + tuple(_prime(a) for a in out)
        u_axes = (s,) + tuple(_prime(a) for a in out)
        return contract([(H_axes, hess), (u_axes, u)], (s,) + out,
                        self.precision)

    def gram_matvec(self, ni: int, J: Operand, hess: jax.Array, grad_ndim: int,
                    v: jax.Array) -> jax.Array:
        """(Jᴴ H J) v without materialising A (reference get_J matvec recipe,
        network.py:769-790). Two contractions: coeff = H (J v), Av = Jᴴ coeff."""
        t = self.topology
        J_axes, J_arr = J
        node_axes = t.node_axes[ni]
        out_axes = t.output_axes
        s = t.sample_axis
        diag = hess.ndim == grad_ndim
        # coeff[s, *out'] = sum_node ( J v ) * H
        coeff_keep = (s,) + out_axes
        Jv = contract([(J_axes, J_arr), (node_axes, v)], coeff_keep, self.precision)
        if diag:
            coeff = hess * Jv
        else:
            H_axes = (s,) + tuple(_prime(a) for a in out_axes) + out_axes
            coeff = contract([(H_axes, hess), ((s,) + tuple(_prime(a) for a in out_axes), Jv)],
                             coeff_keep, self.precision)
        Jc = J_arr.conj() if jnp.iscomplexobj(J_arr) else J_arr
        return contract([(J_axes, Jc), (coeff_keep, coeff)], node_axes, self.precision)


def _flat_gram(J3: jax.Array, W: jax.Array, diag: bool, precision,
               max_block: int = 512, max_elems: int = 1 << 26) -> jax.Array:
    """A = sum_s J3ᴴ W J3 over (sample, class) rows, as flattened matmuls.

    ~3x faster than the equivalent multi-axis einsum on TPU. For large
    operands the pipeline (H-weighting + Mᵀ K dot) runs under a scan over
    sample blocks: one huge dot at HIGHEST precision exceeds TPU scratch
    limits and materialising the weighted copy costs a J-sized buffer.
    Sample blocks are divisors of S, so every reshape is copy-free."""
    S, C, D = J3.shape
    Jc = J3.conj() if jnp.iscomplexobj(J3) else J3

    def block_gram(j, jc, w):
        if diag:
            k = j * w[..., None].astype(j.dtype)
        else:
            k = jnp.einsum("scd,sci->sdi", w.astype(j.dtype), j,
                           precision=precision)
        rows = j.shape[0] * C
        return jax.lax.dot_general(jc.reshape(rows, D), k.reshape(rows, D),
                                   (((0,), (0,)), ((), ())),
                                   precision=precision)

    if S * C * D <= max_elems:
        return block_gram(J3, Jc, W)
    bs = _flat_gram_block_size(S, max_block)
    nb = S // bs
    # statically unrolled block loop: a nested lax.scan here (the caller
    # already scans data chunks) crashes the TPU compiler at flagship shapes
    A = jnp.zeros((D, D), J3.dtype)
    for i in range(nb):
        sl = slice(i * bs, (i + 1) * bs)
        A = A + block_gram(J3[sl], Jc[sl], W[sl])
    return A


def _flat_gram_block_size(S: int, max_block: int) -> int:
    """Sample-block size for _flat_gram's statically unrolled loop.

    Largest divisor of S <= max_block, then grown until the unroll count
    nb = S/bs stays under TNF_FLAT_GRAM_MAX_UNROLL (default 64) — compile
    time scales linearly in nb, so a pathological S (e.g. a huge dataset in
    one chunk) must not explode it. bs = S (one block) always qualifies."""
    bs = max((d for d in range(max_block, 0, -1) if S % d == 0), default=S)
    max_unroll = int(os.environ.get("TNF_FLAT_GRAM_MAX_UNROLL", "64"))
    if S // bs > max_unroll:
        bs = min(d for d in range(bs, S + 1)
                 if S % d == 0 and S // d <= max_unroll)
    return bs


def _embed_diag(hess_diag: jax.Array) -> jax.Array:
    """(B, *out) diagonal Hessian -> (B, *out, *out) full form."""
    B = hess_diag.shape[0]
    out_shape = hess_diag.shape[1:]
    C = 1
    for d in out_shape:
        C *= d
    flat = hess_diag.reshape(B, C)
    full = jax.vmap(jnp.diag)(flat)
    return full.reshape((B,) + out_shape + out_shape)
