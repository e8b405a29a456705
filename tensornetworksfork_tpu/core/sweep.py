"""Accumulating sweep optimizer (DMRG-style alternating least squares).

Reimplements the reference trainer `TensorNetwork.accumulating_swipe`
(`/root/reference/tensor/network.py:379-608`) and the ensemble routing of
`SumOfNetworks` (network.py:988-1060), redesigned for XLA:

- One jitted *node update* per (node, direction): a `lax.scan` over data
  chunks accumulates the Gauss-Newton system A,b on device (bit-exact to the
  reference's per-batch `A_out.add_` accumulation, network.py:463-468), then
  solves and applies the update — zero host round-trips inside a node update.
- Environments are carried *between* node updates as device arrays: far-side
  environments are precomputed once per half-sweep and the near side advances
  incrementally, so a half-sweep costs O(N) column contractions per sample
  instead of the reference's O(N * batches * N) full-stack recomputes
  (network.py:119-120 recomputes both stacks every forward).
- Sum-of-networks members maintain cached member outputs; the total
  prediction at a node is J·core + rest, so member forwards are never
  recomputed from scratch (reference recomputes every member every batch,
  network.py:1009-1021).

Python keeps control *between* node updates, preserving the reference's
callback semantics: `convergence_criterion()` early stopping, `block_callback`,
`loss_callback`, wall-clock `timeout`, and the singular-solve abort (we check
an all-finite flag instead of catching LinAlgError, network.py:481-484).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .engine import Network
from .solve import apply_update, cpd_diag_mask, solve_block
from .topology import INPUT


@dataclasses.dataclass
class SweepConfig:
    """Mirrors the reference accumulating_swipe kwargs (network.py:379)."""

    num_swipes: int = 1
    batch_size: int = -1  # chunk size; <=0 means full batch
    method: str = "ridge_cholesky"
    eps: object = 1e-12  # float or per-half-sweep list
    eps_decay: Optional[float] = None
    eps_per_node: bool = False
    lr: float = 1.0
    direction: str = "l2r"
    skip_second: bool = False
    orthonormalize: bool = False
    adaptive_step: bool = False
    max_norm: Optional[float] = None
    timeout: Optional[float] = None
    refine: bool = False  # one iterative-refinement pass after each solve
    # None (device dtype) | "float64": host f64 rescale+ridge+solve via
    # pure_callback — the supported tier for eps below the f32 floor
    # (solve.py, docs/DESIGN.md "Solve numerics tiers")
    solve_dtype: Optional[str] = None
    max_iter: int = 50    # iterative methods (cg/minres/lanczos)
    tol: float = 1e-6
    verbose: int = 0


ITERATIVE_METHODS = ("cg", "minres", "lanczos")


def _net_mode_key(net):
    """Trace-time Network state that changes the compiled update program:
    the Pallas flag and the active shard_map mesh (engine._kernel_gram
    closes over net.mesh at trace time)."""
    mesh = net.mesh
    mk = (None if mesh is None
          else (net.mesh_axis, tuple(sorted(dict(mesh.shape).items()))))
    return (net.use_pallas, mk)


def _numeric_env_key():
    """Env knobs read at TRACE time inside cached update programs: they must
    participate in the jit-cache key (like use_pallas) or toggling them
    mid-process would silently reuse programs traced with the old setting."""
    return (os.environ.get("TNF_PACKED_J", "1"),
            os.environ.get("TNF_GRAM_DTYPE", "f32").lower(),
            os.environ.get("TNF_FLAT_GRAM_MAX_D", "8192"),
            os.environ.get("TNF_PACKED_SYRK_MIN_D", "4096"),
            os.environ.get("TNF_AUX_PRECISION", ""),
            os.environ.get("TNF_OWNOUT_K_MAX_ELEMS", ""),
            os.environ.get("TNF_FLAT_GRAM_MAX_UNROLL", ""),
            os.environ.get("TNF_FULLBATCH_MAX_BYTES", ""),
            os.environ.get("TNF_INT8_MERGE", "0"),
            os.environ.get("TNF_PALLAS_ACC", "0"),
            os.environ.get("TNF_PALLAS_BAND", "1"),
            os.environ.get("TNF_PALLAS_BAND_HB", "3"),
            os.environ.get("TNF_KMIX", "1"),
            os.environ.get("TNF_PALLAS_GROUP", "1"),
            os.environ.get("TNF_PALLAS_GROUP_BS", ""),
            os.environ.get("TNF_KMIX_BLOCK", ""),
            os.environ.get("TNF_OWNOUT_DEFER", "1"),
            os.environ.get("TNF_ENV_STAGED", "1"),
            os.environ.get("TNF_ENV_STAGED_MAX_BYTES", ""))


class Member:
    """One network of an (optional) type-I sum. `input_fn` adapts the global
    x to this member's inputs (reference slices x[..., :shape] per member,
    network.py:1012). `train` selects which nodes sweep: 'train' = the
    topology's train nodes, 'main' = main nodes only — the reference
    SumOfNetworks(train_operators=...) switch (network.py:1002-1005)."""

    def __init__(self, net: Network, input_fn: Optional[Callable] = None,
                 train: str = "train"):
        self.net = net
        self.input_fn = input_fn or (lambda x: net.bind_inputs(x))
        self.train_nodes = (net.topology.train_nodes if train == "train"
                            else net.topology.main_nodes)


class Sweeper:
    def __init__(self, members, loss_fn, cfg: SweepConfig):
        if isinstance(members, Network):
            members = [Member(members)]
        self.members: List[Member] = list(members)
        self.loss_fn = loss_fn
        self.cfg = cfg
        self._jits: Dict = {}
        self._node_sols: Dict = {}
        # per-phase wall-clock attribution (TNF_SWEEP_TIMERS=1): each jit
        # call is synced (scalar fetch — block_until_ready is unreliable on
        # the axon tunnel, CLAUDE.md) and accumulated under a phase label.
        # Serialising dispatch inflates totals slightly; use for attribution,
        # not headline numbers. benchmarks/epoch_bench.py reports the table.
        self.timers: Dict[str, List[float]] = {}
        self._timing = os.environ.get("TNF_SWEEP_TIMERS", "0") == "1"
        # The f64 solve tier runs through jax.pure_callback; the axon tunnel
        # backend has no host-callback support (UNIMPLEMENTED at run time,
        # surfacing as an opaque singular abort) — fail early and say why.
        # Standard CPU/TPU/GPU PJRT backends all support host callbacks.
        if cfg.solve_dtype is not None and str(cfg.solve_dtype) in (
                "float64", "f64") and jax.default_backend() == "axon":
            raise ValueError(
                "solve_dtype='float64' needs host-callback support "
                "(jax.pure_callback), which the axon tunnel backend lacks. "
                "Run this config on CPU (jax.config.update('jax_platforms',"
                "'cpu')) or a directly-attached TPU.")
        # Two-sided stack reuse (reference left/right_update_stacks made
        # incremental, network.py:152-172): every computed environment —
        # near-side advances AND far-chain entries — is recorded per
        # (member, side, column) together with the ids of the param arrays
        # it contracted. A later run needing a far chain first checks the
        # history: a full set of entries whose recorded param ids still
        # match the live params is a valid chain and skips the O(ncols)
        # recompute. In the canonical [cores l2r, convs l2r] x2 epoch this
        # eliminates 2 of the 4 far chains per epoch (the l2r runs' left
        # histories feed the r2l runs, and the final r2l near history feeds
        # the next epoch's first l2r run).
        self._near_hist: Dict = {}
        # retained-history byte budget: at big-bond configs (CIFAR r=100) a
        # full two-sided history is several GB of HBM held ACROSS runs and
        # can push the live working set past device memory — beyond the
        # budget new entries are dropped (recompute instead of retain).
        # TNF_ENV_HISTORY_MAX_BYTES overrides (0 disables retention).
        cap_s = os.environ.get("TNF_ENV_HISTORY_MAX_BYTES", "")
        self._near_hist_cap = int(cap_s) if cap_s else 4 * 1024 ** 3
        self._near_hist_bytes = 0
        self._data_cache = None  # (src_tuple, data) — input-identity cache
        # deferred per-node ok flags (device scalars) — see _flush_ok
        self._pending_ok: List = []

    def _defer_ok(self, ok, name: str) -> None:
        self._pending_ok.append((ok, name))

    def _flush_ok(self) -> bool:
        """ONE host fetch for all deferred per-node singular flags.

        bool(ok) after every update forced a full device sync plus the
        ~31 ms tunnel RTT (CLAUDE.md) and stopped the host from dispatching
        the next node's programs — ~26 syncs per flagship epoch. The jitted
        updates guard themselves (new_core = where(ok, new, old), matching
        the reference's LinAlgError abort that leaves the failing node
        unassigned, network.py:481-484), so a singular solve cannot poison
        later updates and detection can wait until the end of the half-pass:
        run() still returns success=False, at worst one half-pass later."""
        if not self._pending_ok:
            return True
        pending, self._pending_ok = self._pending_ok, []
        oks = np.asarray(jnp.stack([o for o, _ in pending]))
        if bool(oks.all()):
            return True
        if self.cfg.verbose > 0:
            bad = pending[int(np.argmin(oks))][1]
            print(f"Singular system for node {bad}")
        if self.cfg.solve_dtype is None:
            import warnings
            warnings.warn(
                "Singular/non-finite solve in an f32 sweep. The f32 tier's "
                "supported eps floor is ~1e-6 on a unit-rescaled Gram "
                "(docs/DESIGN.md 'Solve numerics tiers'); for the "
                "reference's deep-eps corners (eps<=1e-9, high condition "
                "number) set SweepConfig.solve_dtype='float64' (estimator "
                "kwarg solve_dtype) to run the solve in host f64.",
                RuntimeWarning, stacklevel=2)
        return False

    def _timed(self, phase: str, fn, *args):
        if not self._timing:
            return fn(*args)
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        if leaves:  # a 1-column far chain is all-None (terminal skipped)
            np.asarray(leaves[0].reshape(-1)[:1])
        dt = time.perf_counter() - t0
        acc = self.timers.setdefault(phase, [0.0, 0])
        acc[0] += dt
        acc[1] += 1
        return out

    def timer_report(self) -> str:
        rows = sorted(self.timers.items(), key=lambda kv: -kv[1][0])
        total = sum(v[0] for v in self.timers.values())
        lines = [f"{'phase':<28} {'total_s':>8} {'calls':>6} {'ms/call':>8}"]
        for k, (s, n) in rows:
            lines.append(f"{k:<28} {s:>8.3f} {n:>6d} {s/n*1e3:>8.1f}")
        lines.append(f"{'TOTAL':<28} {total:>8.3f}")
        return "\n".join(lines)

    # ------------------------------------------------------------------ data
    def _prepare(self, x, y, sample_weight, mesh=None, model_labels=()):
        """Pads the sample axis and stores everything pre-chunked as
        (nchunks, B, ...). With a mesh, the per-chunk sample axis (dim 1) is
        sharded over 'data' — padding rows carry weight 0, so the sharded
        accumulation is exact (SURVEY.md §5.8). With a 2-D (data, model) mesh
        and `model_labels`, input axes carrying those topology labels also
        shard over 'model' (tensor parallelism; SURVEY.md §2.9 TP row)."""
        S = int(y.shape[0])
        B = self.cfg.batch_size
        if B is None or B <= 0 or B > S:
            B = S
        if mesh is not None:
            ndev = dict(mesh.shape).get("data", mesh.devices.size)
            B = ((B + ndev - 1) // ndev) * ndev
        P = ((S + B - 1) // B) * B
        pad = P - S

        def chunk(a):
            a = jnp.asarray(a)
            if pad:
                a = jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
            return a.reshape((P // B, B) + a.shape[1:])

        w = jnp.ones((S,), jnp.float32) if sample_weight is None else jnp.asarray(
            sample_weight, jnp.float32)

        # Dedupe content-identical member inputs: type-I image sums slice
        # the SAME patch tensor for members 2..N (identical (P-1, pp-1)
        # views), so one device copy can serve all of them — at the CIFAR
        # r=100 config this saves ~1 GB of HBM residency. Host-side numpy
        # equality only (never fetches device arrays).
        _dedup: List = []  # (host_array, chunked_device_array)

        def chunk_dedup(v):
            host = isinstance(v, np.ndarray)
            for hv, dv in _dedup:
                if hv is v:
                    return dv
                if (host and isinstance(hv, np.ndarray)
                        and hv.shape == v.shape and hv.dtype == v.dtype
                        and np.array_equal(hv, v)):
                    return dv
            dv = chunk(v)
            _dedup.append((v, dv))
            return dv

        data = {
            "y": chunk(y),
            "w": chunk(w),
            "inputs": [
                {k: chunk_dedup(v) for k, v in m.input_fn(x).items()}
                for m in self.members
            ],
            "S": S,
            "B": B,
            "P": P,
        }
        if mesh is not None:
            from ..parallel.mesh import shard_chunked, shard_chunked_inputs
            data["y"] = shard_chunked(data["y"], mesh)
            data["w"] = shard_chunked(data["w"], mesh)
            if model_labels and "model" in mesh.axis_names:
                sharded = []
                for mi, m in enumerate(self.members):
                    t = m.net.topology
                    labels = {t.nodes[ni].name: t.nodes[ni].labels
                              for ni in t.input_nodes}
                    sharded.append(shard_chunked_inputs(
                        data["inputs"][mi], mesh, labels, model_labels,
                        sample_dim=t.sample_dim))
                data["inputs"] = sharded
            else:
                # preserve the dedupe under the mesh: shard each distinct
                # array once (keyed by identity) and reuse across members
                _sharded: Dict[int, jax.Array] = {}

                def _shard_once(a):
                    if id(a) not in _sharded:
                        _sharded[id(a)] = shard_chunked(a, mesh)
                    return _sharded[id(a)]

                data["inputs"] = [{k: _shard_once(v) for k, v in d.items()}
                                  for d in data["inputs"]]
        return data

    def _prepare_cached(self, x, y, sample_weight, mesh, model_labels):
        """_prepare memoized on INPUT IDENTITY (the reference's set_input
        semantics — stacks invalidate only when the tensor identity changes,
        network.py:329-345): repeated run() calls on the same arrays skip
        re-chunking/re-sharding and keep the environment-history tokens
        valid across epochs. Mutating a passed numpy array in place between
        runs defeats the check — pass a new array instead (same contract as
        the reference)."""
        mesh_key = (None if mesh is None else
                    (tuple(sorted(dict(mesh.shape).items())),
                     tuple(d.id for d in mesh.devices.flat)))
        if self._data_cache is not None:
            (ox, oy, ow, omk, oml, ob), data = self._data_cache
            if (ox is x and oy is y and ow is sample_weight
                    and omk == mesh_key and oml == model_labels
                    and ob == self.cfg.batch_size):
                return data
        data = self._prepare(x, y, sample_weight, mesh,
                             model_labels=model_labels)
        self._data_cache = ((x, y, sample_weight, mesh_key, model_labels,
                             self.cfg.batch_size), data)
        return data

    # ------------------------------------------------------------- jit: envs
    # All env arrays are chunked (nchunks, B, ...): the per-batch env
    # computation runs under lax.scan over the chunk axis. scan (not vmap!)
    # keeps the per-chunk contraction intermediates transient — vmap would
    # batch them across the whole dataset and OOM at flagship scale.
    def _jit_far_envs(self, mid: int, direction: str):
        # _numeric_env_key: env_chain reads TNF_ENV_STAGED /
        # TNF_AUX_PRECISION at trace time — toggling them mid-process must
        # not reuse programs traced with the old lowering/precision
        key = ("far", mid, direction, _numeric_env_key())
        if key not in self._jits:
            net = self.members[mid].net

            def one(params, inputs):
                # terminal entry (full-network env) skipped: no consumer
                # reads it (engine.env_chain docstring)
                envs = net.env_chain(params, inputs, direction,
                                     skip_last=True)
                return tuple(None if e is None else e[1] for e in envs)

            def fn(params, inputs):
                def body(_, x_c):
                    return None, one(params, x_c)

                _, envs = jax.lax.scan(body, None, inputs)
                return envs

            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    def _jit_advance(self, mid: int, ci: int, direction: str, has_prev: bool):
        key = ("adv", mid, ci, direction, has_prev, _numeric_env_key())
        if key not in self._jits:
            net = self.members[mid].net
            ncols = len(net.topology.columns)
            if direction == "left":
                cols = tuple(range(0, ci + 1))
                prev_axes = net.env_keep(tuple(range(0, ci))) if has_prev else None
            else:
                cols = tuple(range(ci, ncols))
                prev_axes = net.env_keep(tuple(range(ci + 1, ncols))) if has_prev else None

            def one(params, prev, inputs):
                prev_op = (prev_axes, prev) if has_prev else None
                return net.env_step(prev_op, ci, params, inputs, cols)[1]

            def fn(params, prev, inputs):
                def body(_, piece):
                    p_c, x_c = piece
                    return None, one(params, p_c, x_c)

                # prev=None is an empty pytree -> p_c arrives as None
                _, envs = jax.lax.scan(body, None, (prev, inputs))
                return envs

            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    def _env_axes(self, mid: int, side: str, ci: int):
        net = self.members[mid].net
        ncols = len(net.topology.columns)
        if side == "left":
            return net.env_keep(tuple(range(0, ci + 1)))
        return net.env_keep(tuple(range(ci, ncols)))

    # ----------------------------------------------------------- jit: update
    def _jit_update_standalone(self, mid: int, ni: int, method: str,
                               use_rest: bool = False):
        """Full-batch update for networks with NO runtime inputs (e.g.
        CompressedTensorTrainLayer, whose design tensor is baked in as
        constant TT blocks with the sample axis as the last bond — reference
        layers.py:1420-1547). The jacobian contracts all nodes but ni
        directly; no chunking or environment carrying. Inside a type-I sum
        (use_rest) the other members' cached outputs are added to the
        prediction, exactly like the chunked path."""
        key = ("upds", mid, ni, method, use_rest,
               _net_mode_key(self.members[mid].net), _numeric_env_key())
        if key in self._jits:
            return self._jits[key]
        cfg = self.cfg
        net = self.members[mid].net
        t = net.topology
        name = t.nodes[ni].name
        spec = t.nodes[ni]
        loss_fn = self.loss_fn

        def fn(params, y, w, y_rest, eps):
            core = params[name]
            mask = None
            if spec.cpd_mask:
                mask = cpd_diag_mask(core.shape, spec.labels, spec.left,
                                     spec.right, core.dtype)
            y_f = y.reshape((-1,) + y.shape[2:])
            w_f = w.reshape(-1)
            ops = [net.operand(nj, params, {})
                   for nj in range(len(t.nodes)) if nj != ni]
            keep = net.jacobian_keep(ni, ops)
            from .contract import contract as _contract
            J = (keep, _contract(ops, keep, net.precision))
            pred = net.predict_from_jacobian(ni, J, core)
            # the member's baked-in sample bond has the TRUE sample count;
            # chunked y/w/rest may carry padding rows — drop them (they have
            # weight 0 anyway, but the row counts must match)
            n = pred.shape[0]
            y_f, w_f = y_f[:n], w_f[:n]
            if use_rest:
                pred = pred + y_rest.reshape((-1,) + y_rest.shape[2:])[:n]
            loss, g, H = loss_fn(pred, y_f)
            wl = w_f.astype(loss.dtype)
            loss = loss * wl
            g = g * w_f.astype(g.dtype).reshape((-1,) + (1,) * (g.ndim - 1))
            H = H * w_f.astype(H.dtype).reshape((-1,) + (1,) * (H.ndim - 1))
            A, b = net.gram_and_rhs(ni, J, g, H)
            step, ok = solve_block(A, b, core, method, eps, cfg.refine,
                                   cfg.solve_dtype)
            new_core = apply_update(core, step, cfg.lr, cfg.adaptive_step,
                                    cfg.max_norm, mask)
            # singular guard: keep the old core (the reference's
            # LinAlgError abort leaves the node unassigned) so the caller
            # can DEFER the ok fetch without poisoning later updates
            new_core = jnp.where(ok, new_core, core)
            return new_core, loss.sum(), ok

        self._jits[key] = jax.jit(fn)
        return self._jits[key]

    def _jit_member_forward_standalone(self, mid: int, B: int, P: int):
        """Forward of an input-less member, padded + chunked to (nc, B, *out)
        so it composes with the chunked members' cached outputs in a sum."""
        key = ("fwds", mid, B, P, _numeric_env_key())
        if key not in self._jits:
            net = self.members[mid].net

            def fn(params):
                y = net.forward(params, {})
                pad = P - y.shape[0]
                if pad:
                    y = jnp.concatenate(
                        [y, jnp.zeros((pad,) + y.shape[1:], y.dtype)], 0)
                return y.reshape((P // B, B) + y.shape[1:])

            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    def _jit_update(self, mid: int, ni: int, method: str, use_rest: bool,
                    return_pred: bool, B: int):
        key = ("upd", mid, ni, method, use_rest, return_pred, B,
               _net_mode_key(self.members[mid].net), _numeric_env_key())
        if key in self._jits:
            return self._jits[key]
        cfg = self.cfg
        net = self.members[mid].net
        t = net.topology
        ci = t.col_of[ni]
        ncols = len(t.columns)
        name = t.nodes[ni].name
        has_left, has_right = ci > 0, ci < ncols - 1
        L_axes = self._env_axes(mid, "left", ci - 1) if has_left else None
        R_axes = self._env_axes(mid, "right", ci + 1) if has_right else None
        spec = t.nodes[ni]
        gradient_mode = method == "gradient"
        loss_fn = self.loss_fn

        col_input_names = tuple(
            t.nodes[nj].name for nj in t.columns[ci] if t.nodes[nj].kind == INPUT
        )

        def weighted(loss, g, H, w):
            wl = w.astype(loss.dtype)
            gshape = (-1,) + (1,) * (g.ndim - 1)
            hshape = (-1,) + (1,) * (H.ndim - 1)
            return (loss * wl, g * w.astype(g.dtype).reshape(gshape),
                    H * w.astype(H.dtype).reshape(hshape))

        def fn(params, L, R, inputs, y, w, y_rest, eps, x0):
            core = params[name]
            mask = None
            if spec.cpd_mask:
                mask = cpd_diag_mask(core.shape, spec.labels, spec.left,
                                     spec.right, core.dtype)

            # everything already chunked (nchunks, B, ...) by _prepare
            pieces = {
                "x": {k: inputs[k] for k in col_input_names},
                "y": y,
                "w": w,
            }
            if has_left:
                pieces["L"] = L
            if has_right:
                pieces["R"] = R
            if use_rest:
                pieces["rest"] = y_rest

            # Full-batch merge for small-D nodes: the flagship's 26-chunk
            # lax.scan spends ~2 ms/iteration on launch + MXU-starved tiny
            # einsums while a conv-node's whole Gram is <100 GFLOP. Merging
            # all chunks into ONE scan step is a free reshape
            # ((nc, B, ...) -> (1, nc*B, ...): leading dims contiguous);
            # padding rows carry weight 0 so results match up to summation
            # order. Skipped under a mesh (dim 1 is device-sharded), in
            # gradient mode (sequential per-chunk update semantics), and
            # when the full-batch J would exceed TNF_FULLBATCH_MAX_BYTES
            # (default 512 MB; 0 disables the merge).
            nc0 = y.shape[0]
            merged = False
            if net.mesh is None and not gradient_mode and nc0 > 1:
                out_elems = 1
                for d in y.shape[2:]:
                    out_elems *= d
                from ..ops.pallas.gram import gram_dtype
                jbytes = (nc0 * y.shape[1] * out_elems * core.size
                          * (2 if gram_dtype() is not None else 4))
                cap_s = os.environ.get("TNF_FULLBATCH_MAX_BYTES", "")
                cap = int(cap_s) if cap_s else 512 * 1024 * 1024
                if 0 < jbytes <= cap:
                    s_ax = t.sample_axis

                    def _merge(a, spos):
                        """(nc, ...) with the sample axis at piece dim
                        `spos` -> (1, ...) with nc*B samples there. spos=0
                        (data/y/w/rest) is a free contiguous reshape; env
                        keeps are sample-LAST (layout discipline) and need
                        the chunk axis moved next to the sample axis first
                        (a small one-time copy, ~2*env bytes)."""
                        if spos == 0:
                            return a.reshape(
                                (1, a.shape[0] * a.shape[1]) + a.shape[2:])
                        perm = (list(range(1, spos + 1)) + [0, spos + 1]
                                + list(range(spos + 2, a.ndim)))
                        at = jnp.transpose(a, perm)
                        shape = (at.shape[:spos]
                                 + (at.shape[spos] * at.shape[spos + 1],)
                                 + at.shape[spos + 2:])
                        return at.reshape(shape)[None]

                    for k in ("x",):
                        pieces[k] = {n: _merge(v, 0)
                                     for n, v in pieces[k].items()}
                    for k in ("y", "w", "rest"):
                        if k in pieces:
                            pieces[k] = _merge(pieces[k], 0)
                    if has_left:
                        pieces["L"] = _merge(pieces["L"],
                                             L_axes.index(s_ax))
                    if has_right:
                        pieces["R"] = _merge(pieces["R"],
                                             R_axes.index(s_ax))
                    merged = True

            def jac_ops(piece, prms):
                Lop = (L_axes, piece["L"]) if has_left else None
                Rop = (R_axes, piece["R"]) if has_right else None
                return net.jacobian_operands(ni, prms, piece["x"], Lop, Rop)

            def jac(piece, prms):
                Lop = (L_axes, piece["L"]) if has_left else None
                Rop = (R_axes, piece["R"]) if has_right else None
                return net.jacobian(ni, prms, piece["x"], Lop, Rop)

            def jac_packed(piece, prms):
                """Layout-packed Jacobian, or None (static fallback): avoids
                the tile-padded multi-axis J materialisation that dominated
                flagship updates (engine.packed_jacobian)."""
                Lop = (L_axes, piece["L"]) if has_left else None
                Rop = (R_axes, piece["R"]) if has_right else None
                return net.packed_jacobian(ni, prms, piece["x"], Lop, Rop)

            if method in ITERATIVE_METHODS:
                # matrix-free tier (reference scipy_swipe / lanczos_swipe,
                # network.py:709-932): freeze the loss linearisation, then run
                # the whole Krylov solve on device with a fused J-apply matvec.
                from . import krylov

                def body_lin(carry, piece):
                    b_acc, loss_acc = carry
                    ops = jac_ops(piece, params)
                    pred = net.jacobian_apply(ni, ops, core)
                    if use_rest:
                        pred = pred + piece["rest"]
                    loss, g, H = loss_fn(pred, piece["y"])
                    loss, g, H = weighted(loss, g, H, piece["w"])
                    b = net.jacobian_transpose_apply(ni, ops, g)
                    return (b_acc + b, loss_acc + loss.sum()), H

                (b_rhs, loss_sum), H_all = jax.lax.scan(
                    body_lin, (jnp.zeros(core.shape, core.dtype), 0.0), pieces)

                def matvec_raw(v_flat):
                    v = v_flat.reshape(core.shape)

                    def body_mv(acc, piece_H):
                        piece, H = piece_H
                        ops = jac_ops(piece, params)
                        Jv = net.jacobian_apply(ni, ops, v)
                        coeff = net.hessian_apply(H, Jv)
                        return acc + net.jacobian_transpose_apply(ni, ops, coeff), None

                    Av, _ = jax.lax.scan(
                        body_mv, jnp.zeros(core.shape, core.dtype),
                        (pieces, H_all))
                    return Av.reshape(-1)

                # Ridge (extension over the reference's iterative tier, which
                # has none: network.py:834-932) + scale normalisation so f32
                # Krylov iterates can't overflow on ill-conditioned Grams: the
                # dense path's diag-mean rescale (solve.py) is unavailable
                # matrix-free, so estimate ||A|| along b with one probe.
                b_aug = b_rhs.reshape(-1) + 2.0 * eps * core.reshape(-1)
                bnorm = jnp.linalg.norm(b_aug)
                unit = b_aug / jnp.maximum(bnorm, 1e-30)
                scale = jnp.linalg.norm(matvec_raw(unit) + 2.0 * eps * unit)
                scale = jnp.where(scale <= 0, 1.0, scale)

                def matvec(v_flat):
                    return (matvec_raw(v_flat) + 2.0 * eps * v_flat) / scale

                b_flat = -b_aug / scale
                if method == "lanczos":
                    x_sol = krylov.lanczos_galerkin(matvec, b_flat, x0,
                                                    cfg.max_iter, cfg.tol)
                else:
                    solver = krylov.SOLVERS[method]
                    x_sol, _ = solver(matvec, b_flat, x0=x0,
                                      maxiter=cfg.max_iter, tol=cfg.tol)
                step = x_sol.reshape(core.shape)
                new_core = apply_update(core, step, cfg.lr, cfg.adaptive_step,
                                        cfg.max_norm, mask)
                ok = jnp.all(jnp.isfinite(new_core))
                # singular guard (deferred-ok contract: see _flush_ok)
                new_core = jnp.where(ok, new_core, core)
                x_sol = jnp.where(ok, x_sol, jnp.zeros_like(x_sol))
                pred_out = None
                if return_pred:
                    prms = dict(params, **{name: new_core})

                    def body2i(_, piece):
                        ops = jac_ops(piece, prms)
                        return None, net.jacobian_apply(ni, ops, new_core)

                    _, preds = jax.lax.scan(body2i, None, pieces)
                    if merged:  # restore the (nchunks, B, *out) layout
                        preds = preds.reshape((nc0, -1) + preds.shape[2:])
                    pred_out = preds  # chunked (nchunks, B, *out)
                return new_core, loss_sum, ok, pred_out, x_sol

            if gradient_mode:
                # per-chunk steepest-descent update (network.py:469-470)
                def body(carry, piece):
                    cur, loss_acc = carry
                    prms = dict(params, **{name: cur})
                    J = jac(piece, prms)
                    pred = net.predict_from_jacobian(ni, J, cur)
                    if use_rest:
                        pred = pred + piece["rest"]
                    loss, g, H = loss_fn(pred, piece["y"])
                    loss, g, H = weighted(loss, g, H, piece["w"])
                    _, b = net.gram_and_rhs(ni, J, g, H)
                    cur = apply_update(cur, -b, cfg.lr, cfg.adaptive_step,
                                       cfg.max_norm, mask)
                    return (cur, loss_acc + loss.sum()), None

                (new_core, loss_sum), _ = jax.lax.scan(body, (core, 0.0), pieces)
                ok = jnp.all(jnp.isfinite(new_core))
                # singular guard (deferred-ok contract: see _flush_ok)
                new_core = jnp.where(ok, new_core, core)
            else:
                # A is accumulated and solved FLAT (D, D): a 2-D carry tiles
                # at ~1x while the node-shaped carry pads up to 8x and its
                # per-chunk read+write dominated the flagship update
                # (engine.packed_gram_rhs docstring)
                D = core.size
                # Trace-time probe (values DCE'd — only the Python-level
                # availability and shapes are used): if the tiled Pallas
                # route will be taken, the scan carries the engine's PADDED
                # (Dp, Dp) raw accumulator and each chunk's Gram is added
                # INSIDE the kernel (upper-tiles-only read) instead of a
                # separate full-matrix A_acc + A pass per chunk.
                probe = jax.tree_util.tree_map(lambda x: x[0], pieces)
                pj0 = jac_packed(probe, params)
                A0 = net.packed_gram_acc_init(pj0) if pj0 is not None else None
                in_kernel_acc = A0 is not None
                # Padded-raw carry: the tiled kernel route returns the
                # PADDED (Dp, Dp) raw A per chunk; accumulate with the
                # upper-tiles-only Pallas add (engine.packed_gram_pad).
                pad = (net.packed_gram_pad(pj0)
                       if pj0 is not None and not in_kernel_acc else None)
                # Trace-time probe for the structured own-out deferral
                # (engine.gram_and_rhs defer_ownout): when the node takes
                # that path, the scan carries the RAW (P, DJ, DJ) upper
                # class-pair blocks — C(C+1)/2 instead of C² — and the full
                # node² A is expanded ONCE before the solve. Probe values
                # are DCE'd; only the carry shape and the static plan live.
                ownout = {"plan": None}
                # Cheap static pre-check (ADVICE r03): the structured
                # own-out deferral can only fire for a node that owns ALL
                # output axes with C > 1 (engine.gram_and_rhs's structured
                # path) — skip the trace-time jac+loss+gram probe for the
                # (majority of) nodes that can never take it.
                t_ = net.topology
                own_all_out = (bool(t_.output_axes)
                               and all(a in t_.node_axes[ni]
                                       for a in t_.output_axes))
                C_out = 1
                for a in t_.output_axes:
                    C_out *= t_.axis_size[a]
                if pj0 is None and own_all_out and C_out > 1:
                    J0 = jac(probe, params)
                    pred0 = net.predict_from_jacobian(ni, J0, core)
                    if use_rest:
                        pred0 = pred0 + probe["rest"]
                    l0, g0, H0 = loss_fn(pred0, probe["y"])
                    l0, g0, H0 = weighted(l0, g0, H0, probe["w"])
                    A_p, _ = net.gram_and_rhs(ni, J0, g0, H0,
                                              defer_ownout=ownout)
                    if ownout["plan"] is not None:
                        A0 = jnp.zeros(A_p.shape, core.dtype)
                if A0 is None:
                    if pad is not None:
                        A0 = jnp.zeros((pad[0], pad[0]), jnp.float32)
                    else:
                        A0 = jnp.zeros((D, D), core.dtype)
                b0 = jnp.zeros((D,), core.dtype)
                # Trace-time cell: packed_gram_rhs reports (static bool)
                # whether its A chunks come back mirror-deferred — raw syrk
                # output with exact upper triangle, undefined lower. lax.scan
                # traces `body` eagerly, so the flag is set by the time the
                # scan call returns and the one-time mirror below is traced
                # conditionally (no runtime branch).
                deferred = {"mirror": False}

                def body(carry, piece):
                    A_acc, b_acc, loss_acc = carry
                    pj = jac_packed(piece, params)
                    if pj is not None:
                        pred = net.packed_predict(pj, core)
                    else:
                        J = jac(piece, params)
                        pred = net.predict_from_jacobian(ni, J, core)
                    if use_rest:
                        pred = pred + piece["rest"]
                    loss, g, H = loss_fn(pred, piece["y"])
                    loss, g, H = weighted(loss, g, H, piece["w"])
                    if pj is not None and in_kernel_acc:
                        A_new, b, deferred["mirror"] = net.packed_gram_rhs(
                            pj, g, H, defer_mirror=True, acc=A_acc)
                        return (A_new, b_acc + b,
                                loss_acc + loss.sum()), None
                    if pj is not None:
                        A, b, deferred["mirror"] = net.packed_gram_rhs(
                            pj, g, H, defer_mirror=True)
                    else:
                        A, b = net.gram_and_rhs(
                            ni, J, g, H,
                            defer_ownout=(ownout if ownout["plan"]
                                          is not None else None))
                        if ownout["plan"] is None:
                            A = A.reshape(D, D)
                        b = b.reshape(D)
                    if pad is not None:
                        from ..ops.pallas.gram import (_on_tpu,
                                                       add_packed_upper)
                        A_new = add_packed_upper(A_acc, A, tile=pad[1],
                                                 interpret=not _on_tpu())
                        return (A_new, b_acc + b, loss_acc + loss.sum()), None
                    return (A_acc + A, b_acc + b, loss_acc + loss.sum()), None

                (A, b, loss_sum), _ = jax.lax.scan(body, (A0, b0, 0.0), pieces)
                if in_kernel_acc:
                    # in-kernel-accumulated carry: the engine knows the raw
                    # layout (band positions under TNF_PALLAS_BAND, padded
                    # raw-upper otherwise) and finishes accordingly
                    A = net.packed_gram_finisher(pj0)(A)
                else:
                    if pad is not None:
                        A = A[:D, :D]
                    if deferred["mirror"]:
                        from ..ops.pallas.gram import mirror_gram
                        A = mirror_gram(A)
                if ownout["plan"] is not None:
                    A = net.expand_ownout(A, ownout["plan"]).reshape(D, D)
                step, ok = solve_block(A, b, core, method, eps, cfg.refine,
                                       cfg.solve_dtype)
                new_core = apply_update(core, step.reshape(core.shape),
                                        cfg.lr, cfg.adaptive_step,
                                        cfg.max_norm, mask)
                # singular guard (deferred-ok contract: see _flush_ok)
                new_core = jnp.where(ok, new_core, core)

            pred_out = None
            if return_pred:
                prms = dict(params, **{name: new_core})

                def body2(_, piece):
                    pj = jac_packed(piece, prms)
                    if pj is not None:
                        return None, net.packed_predict(pj, new_core)
                    J = jac(piece, prms)
                    return None, net.predict_from_jacobian(ni, J, new_core)

                _, preds = jax.lax.scan(body2, None, pieces)
                if merged:  # restore the (nchunks, B, *out) layout
                    preds = preds.reshape((nc0, -1) + preds.shape[2:])
                pred_out = preds  # chunked (nchunks, B, *out)
            return new_core, loss_sum, ok, pred_out, None

        jf = jax.jit(fn)
        self._jits[key] = jf
        return jf

    def _member_forward_chunked(self, mi: int, params_list, data):
        """Chunked (nc, B, *out) forward of member `mi` — input-less members
        route through the standalone (baked-in data) forward."""
        if not self.members[mi].net.topology.input_nodes:
            return self._timed(
                "member_forward",
                self._jit_member_forward_standalone(mi, data["B"], data["P"]),
                params_list[mi])
        return self._timed("member_forward",
                           self._jit_member_forward(mi, data["B"]),
                           params_list[mi], data["inputs"][mi])

    def _jit_member_forward(self, mid: int, B: int):
        """Member forward over pre-chunked inputs -> chunked predictions."""
        key = ("fwd", mid, B)
        if key not in self._jits:
            net = self.members[mid].net

            def fn(params, inputs):
                def body(_, x_c):
                    return None, net.forward(params, x_c)

                _, preds = jax.lax.scan(body, None, inputs)
                return preds  # (nchunks, B, *out)

            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    # ------------------------------------------------------------ precompile
    def precompile(self, params_list, x, y, *, sample_weight=None, mesh=None,
                   max_workers: Optional[int] = None, node_order=None,
                   model_axis_labels: Sequence[str] = ()):
        """Compiles every program a run() will need, concurrently.

        XLA compilation is the dominant first-run cost (one program per node
        update plus env programs); dispatching the warm-up calls from a
        thread pool compiles them in parallel. Safe to skip — run() compiles
        lazily — but cuts cold-start wall-clock severalfold. Pass the same
        mesh AND model_axis_labels a later run() will use, or the sharded
        programs retrace there."""
        import os
        from concurrent.futures import ThreadPoolExecutor

        if max_workers is None:
            # remote compile services can wedge under high concurrency;
            # keep this modest (TNF_COMPILE_WORKERS=1 forces serial)
            max_workers = int(os.environ.get("TNF_COMPILE_WORKERS", "4"))
        if isinstance(params_list, dict):
            params_list = [params_list]
        saved_pallas = self._set_mesh_mode(mesh, tuple(model_axis_labels))
        try:
            return self._precompile_inner(
                params_list, x, y, sample_weight, mesh, max_workers,
                node_order, tuple(model_axis_labels))
        finally:
            self._restore_mesh_mode(saved_pallas)

    def _precompile_inner(self, params_list, x, y, sample_weight, mesh,
                          max_workers, node_order, model_axis_labels):
        from concurrent.futures import ThreadPoolExecutor

        data = self._prepare_cached(x, y, sample_weight, mesh,
                                    model_axis_labels)
        B = data["B"]
        nc = data["P"] // B
        use_rest = len(self.members) > 1
        seq = node_order or [(mi, ni) for mi, m in enumerate(self.members)
                             for ni in m.train_nodes]
        member_last_i = {}
        for i, (mi, ni) in enumerate(seq):
            member_last_i[mi] = i

        def env_zeros(mi, side, ci):
            t = self.members[mi].net.topology
            axes = self._env_axes(mi, side, ci)
            shape = tuple(B if a == t.sample_axis else t.axis_size[a]
                          for a in axes)
            dtype = next(iter(params_list[mi].values())).dtype
            return jnp.zeros((nc,) + shape, dtype)

        jobs = []
        rest0 = None
        if use_rest:
            # rest carries the MODEL output shape (may differ from y, e.g.
            # C-1 logits vs one-hot targets)
            t0 = self.members[0].net.topology
            out_sizes = tuple(t0.axis_size[a] for a in t0.output_axes)
            rest0 = jnp.zeros((nc, B) + out_sizes, jnp.float32)
        for mi, m in enumerate(self.members):
            t = m.net.topology
            ncols = len(t.columns)
            if not t.input_nodes:
                for ni in m.train_nodes:
                    fn = self._jit_update_standalone(mi, ni, self.cfg.method,
                                                     use_rest)
                    jobs.append((fn, (params_list[mi], data["y"], data["w"],
                                      rest0, jnp.float32(0.1))))
                if use_rest:
                    jobs.append((self._jit_member_forward_standalone(
                        mi, B, data["P"]), (params_list[mi],)))
                continue
            for d in ("left", "right"):
                jobs.append((self._jit_far_envs(mi, d),
                             (params_list[mi], data["inputs"][mi])))
            for ci in range(ncols):
                for side, has_prev in (("left", ci > 0),
                                       ("right", ci < ncols - 1)):
                    prev_ci = ci - 1 if side == "left" else ci + 1
                    prev = (env_zeros(mi, side, prev_ci) if has_prev else None)
                    jobs.append((self._jit_advance(mi, ci, side, has_prev),
                                 (params_list[mi], prev, data["inputs"][mi])))
            if use_rest:
                jobs.append((self._jit_member_forward(mi, B),
                             (params_list[mi], data["inputs"][mi])))
        for i, (mi, ni) in enumerate(seq):
            t = self.members[mi].net.topology
            if not t.input_nodes:
                continue
            ci = t.col_of[ni]
            ncols = len(t.columns)
            L = env_zeros(mi, "left", ci - 1) if ci > 0 else None
            R = env_zeros(mi, "right", ci + 1) if ci < ncols - 1 else None
            method = self.cfg.method
            return_pred = use_rest and i == member_last_i[mi]
            fn = self._jit_update(mi, ni, method, use_rest, return_pred, B)
            x0 = None
            if method in ITERATIVE_METHODS:
                x0 = jnp.zeros((params_list[mi][t.nodes[ni].name].size,),
                               jnp.float32)
            jobs.append((fn, (params_list[mi], L, R, data["inputs"][mi],
                              data["y"], data["w"], rest0,
                              jnp.float32(0.1), x0)))

        def do(job):
            fn, args = job
            try:
                out = fn(*args)
            except Exception as e:
                msg = str(e)
                # warm-up EXECUTIONS run concurrently: at big-bond configs
                # (CIFAR r=100) several multi-GB working sets can overlap and
                # exhaust HBM even though each program runs fine alone. By
                # that point the executable is already built and cached, so
                # the warm-up value is disposable — swallow and move on.
                if "RESOURCE_EXHAUSTED" in msg:
                    return None
                # the remote compile service intermittently 500s under
                # concurrent load (CLAUDE.md); back off and retry once —
                # but only for that transient error class, not deterministic
                # trace/shape errors (broad tokens like 'INTERNAL' also match
                # deterministic compile failures and would slow reporting)
                if not ("remote_compile" in msg or "HTTP 500" in msg):
                    raise
                time.sleep(15)
                out = fn(*args)
            # force a real device->host transfer: block_until_ready does not
            # reliably block on remote-tunnel platforms (CLAUDE.md)
            try:
                leaves = jax.tree_util.tree_leaves(out)
                if leaves:  # 1-column far chain is all-None (terminal skipped)
                    np.asarray(leaves[0].reshape(-1)[:1])
            except Exception as e:
                # concurrent warm-up executions can exhaust HBM here too
                # (the async dispatch surfaced the error at the fetch) —
                # the executable is cached, the warm-up value disposable
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
            return None

        # Concurrent warm-up EXECUTIONS overlap their HBM working sets: at
        # big-bond configs (CIFAR r=100: ~1.5 GB of env/input args per job,
        # several-GB program temps) four in flight exhaust device memory —
        # and the failed allocations can destabilise the rest of the run.
        # Serialize when any single job's argument bytes exceed the budget
        # (temps scale with the args); the flagship (~0.5 GB/job) keeps its
        # concurrent warm-up. TNF_PRECOMPILE_SERIAL_BYTES overrides.
        budget_s = os.environ.get("TNF_PRECOMPILE_SERIAL_BYTES", "")
        budget = int(budget_s) if budget_s else 1 << 30

        def job_bytes(job):
            return sum(a.size * a.dtype.itemsize
                       for a in jax.tree_util.tree_leaves(job[1])
                       if hasattr(a, "size") and hasattr(a, "dtype"))

        if jobs and budget > 0:
            # the jobs list pins EVERY member's env chains on device at
            # once (they are warm-up args); a multi-member big-bond config
            # (type-I CIFAR r=100) holds >6 GB in args alone and the
            # warm-up executions then can't allocate — skip the warm-up
            # entirely and let run() compile lazily (correct, just colder)
            seen, total = set(), 0
            for j in jobs:
                for a in jax.tree_util.tree_leaves(j[1]):
                    if hasattr(a, "size") and id(a) not in seen:
                        seen.add(id(a))
                        total += a.size * a.dtype.itemsize
            total_cap_s = os.environ.get("TNF_PRECOMPILE_MAX_TOTAL_BYTES", "")
            total_cap = int(total_cap_s) if total_cap_s else 6 * (1 << 30)
            if total > total_cap:
                return 0
            if max_workers > 1 and max(job_bytes(j) for j in jobs) > budget:
                max_workers = 1
        pool = ThreadPoolExecutor(max_workers=max_workers)
        try:
            list(pool.map(do, jobs))
        finally:
            # don't wait for stuck workers if interrupted (e.g. a caller's
            # wall-clock watchdog) — abandoned RPCs would block exit
            pool.shutdown(wait=False, cancel_futures=True)
        return len(jobs)

    # ------------------------------------------------------------------- run
    def run(self, params_list, x, y, *, sample_weight=None,
            convergence_criterion=None, block_callback=None, loss_callback=None,
            node_order: Optional[Sequence] = None, mesh=None,
            model_axis_labels: Sequence[str] = ()):
        """Runs num_swipes * (first pass, second pass). Returns
        (params_list, success) — success False on timeout or singular solve,
        matching the reference's return-False contract (network.py:434-445,
        481-484).

        mesh: optional jax Mesh. 1-D ('data',) shards the sample axis (exact
        DP). A 2-D ('data', 'model') mesh plus `model_axis_labels` (topology
        labels, e.g. ('patches',)) additionally shards those input axes over
        'model': the Gram accumulation runs tensor-parallel with XLA inserting
        the reduction collectives; params stay replicated."""
        cfg = self.cfg
        if isinstance(params_list, dict):
            params_list = [params_list]
        params_list = list(params_list)
        saved_pallas = self._set_mesh_mode(mesh, model_axis_labels)
        try:
            # live view for callbacks: convergence_criterion closures read
            # current params through sweeper.params_list (the reference reads
            # the mutable node graph, models/tensor_train.py:258-262)
            self.params_list = params_list
            data = self._prepare_cached(x, y, sample_weight, mesh,
                                        tuple(model_axis_labels))
            if mesh is not None:
                from ..parallel.mesh import replicate
                for mi in range(len(params_list)):
                    params_list[mi] = replicate(params_list[mi], mesh)
            start = time.time()

            # train sequence: (member, node) pairs in member order
            seq = [(mi, ni) for mi, m in enumerate(self.members)
                   for ni in m.train_nodes]
            if node_order is not None:
                seq = list(node_order)

            use_rest = len(self.members) > 1
            y_members = None
            if use_rest:
                y_members = [self._member_forward_chunked(mi, params_list,
                                                          data)
                             for mi in range(len(self.members))]

            NS = 0
            last_other: Optional[Tuple[int, int]] = None  # (member, col) last
            for _swipe in range(cfg.num_swipes):
                for pass_idx in (0, 1):
                    if pass_idx == 1 and cfg.skip_second:
                        continue
                    if pass_idx == 0:
                        reversed_pass = cfg.direction != "l2r"
                    else:
                        reversed_pass = cfg.direction == "l2r"
                    order = list(reversed(seq)) if reversed_pass else list(seq)
                    ok, stop, last_other = self._half_pass(
                        params_list, data, order, NS, last_other, use_rest,
                        y_members, start, convergence_criterion, block_callback,
                        loss_callback, reversed_pass=reversed_pass)
                    NS += 1
                    if not ok:
                        return params_list, False
                    if stop:
                        return params_list, True
            return params_list, True
        finally:
            self._restore_mesh_mode(saved_pallas)

    def _set_mesh_mode(self, mesh, model_axis_labels=()):
        """Configure the members' Pallas tier for a mesh run; returns the
        saved state for _restore_mesh_mode (restored in a finally so failures
        during data prep can't leak the flip).

        Pallas grams are custom calls GSPMD cannot partition. Under a mesh
        the engine wraps them in shard_map over the row (sample) axis with
        a psum on the partial Gram (engine._kernel_gram / the mesh_tiled
        pipeline) — the kernels stay ON. Rows shard over ALL mesh axes
        (engine._mesh_row_axes): sample sums are exact under any row
        partition, so a 2-D data × model mesh reshards J to row shards for
        the Gram stage and every chip contributes — tensor parallelism no
        longer loses the kernel ladder (VERDICT r03 weak #6). use_pallas
        and the mesh participate in the update-jit cache key, so mixed
        mesh/single-chip use of one Sweeper stays consistent."""
        if mesh is None:
            return None
        saved = [(m.net.use_pallas, m.net.mesh) for m in self.members]
        for m in self.members:
            if m.net.topology.input_nodes:
                m.net.mesh = mesh
            else:
                # input-less members keep mesh=None: their baked-in row
                # count is not padded to a device multiple and their consts
                # are replicated anyway — the XLA paths partition fine
                m.net.mesh = None
        return saved

    def _restore_mesh_mode(self, saved):
        if saved is not None:
            for m, (p, mesh) in zip(self.members, saved):
                m.net.use_pallas = p
                m.net.mesh = mesh

    # ------------------------------------------------------------- half pass
    def _eps_for(self, NS: int, node_i: int, n_nodes: int, reverse: bool):
        """eps for the node at position `node_i` of the current pass order.

        With eps_per_node, the eps list indexes the CANONICAL train order in
        both directions (reference network.py:427-431 and the second-pass
        mirror at :528-533): on a reversed pass the index is flipped so node
        k of the canonical order always receives eps[k]."""
        cfg = self.cfg
        if cfg.eps_per_node:
            if isinstance(cfg.eps, (list, tuple)):
                idx = node_i if not reverse else n_nodes - 1 - node_i
                return float(cfg.eps[idx])
            return float(cfg.eps)
        e = cfg.eps[NS] if isinstance(cfg.eps, (list, tuple)) else cfg.eps
        if cfg.eps_decay is not None:
            e = e * cfg.eps_decay ** NS
        return float(e)

    def _half_pass(self, params_list, data, order, NS, last_other, use_rest,
                   y_members, start, convergence_criterion, block_callback,
                   loss_callback, reversed_pass: bool = False):
        cfg = self.cfg
        # a previous pass that exited abnormally (exception in a callback,
        # SIGALRM trial wall, KeyboardInterrupt) can strand deferred flags;
        # they must not fail THIS pass's flush
        self._pending_ok.clear()
        S, B = data["S"], data["B"]
        n_nodes = len(order)

        # Segment the node sequence into maximal column-monotone runs per
        # member. Within a run, the near-side env advances incrementally and
        # the far side is precomputed once; at a run boundary (e.g. the conv
        # layer's cores-then-conv-blocks train order, layers.py:890) the far
        # envs are rebuilt against the freshly updated params.
        # A fresh run starts direction-neutral (trend 0): the boundary-
        # crossing step itself (e.g. A4 -> C1 in the conv train order,
        # column 3 -> 0) doesn't commit the new run to a direction — the
        # step WITHIN the new run does. Otherwise the first node after a
        # flip would sit alone in a one-node "run", costing an extra far-env
        # chain per half-pass (measured: 5 -> 4 far_envs/epoch on the
        # flagship).
        run_of = [0] * n_nodes
        run_trend: Dict[int, int] = {}
        cur_run = -1
        prev = None  # (member, col, trend)
        for i, (mi, ni) in enumerate(order):
            ci = self.members[mi].net.topology.col_of[ni]
            if prev is None or prev[0] != mi:
                cur_run += 1
                trend = 0
            else:
                _, pci, trend = prev
                if ci > pci:
                    if trend < 0:
                        cur_run += 1
                        trend = 0
                    else:
                        trend = 1
                elif ci < pci:
                    if trend > 0:
                        cur_run += 1
                        trend = 0
                    else:
                        trend = -1
            run_of[i] = cur_run
            run_trend[cur_run] = trend
            prev = (mi, ci, trend)

        far_envs: Dict[int, List] = {}
        near_env: Dict[int, Optional[jax.Array]] = {}
        near_col: Dict[int, int] = {}
        cur_dir: Dict[int, str] = {}
        active_run: Dict[int, int] = {}
        # entry validity stamp: same prepared data AND same aux-precision
        # mode (env values depend on the contraction precision)
        data_token = (id(data), os.environ.get("TNF_AUX_PRECISION", ""))

        def env_ids(mi, c, side):
            """Identity stamp of every param array an env of `side` at
            column c contracted — if these ids still match the live params,
            the recorded env is a valid snapshot (jax arrays are
            immutable)."""
            t = self.members[mi].net.topology
            ncols = len(t.columns)
            cols = range(0, c + 1) if side == "left" else range(c, ncols)
            from .topology import PARAM
            return tuple(
                id(params_list[mi][t.nodes[n].name])
                for cc in cols for n in t.columns[cc]
                if t.nodes[n].kind == PARAM)

        def _env_bytes(env):
            return sum(a.size * a.dtype.itemsize
                       for a in jax.tree_util.tree_leaves(env)
                       if hasattr(a, "size"))

        def record_env(mi, c, side, env):
            hist = self._near_hist.setdefault((mi, side), {})
            old = hist.pop(c, None)  # stale either way: params changed
            if old is not None:
                self._near_hist_bytes -= _env_bytes(old[0])
            b = _env_bytes(env)
            if self._near_hist_bytes + b > self._near_hist_cap:
                return  # over budget: recompute later instead of retaining
            self._near_hist_bytes += b
            hist[c] = (env, env_ids(mi, c, side), data_token)

        def reuse_chain(mi, far_dir, ncols):
            """Far chain from recorded history, or None if any needed entry
            is missing/stale. Needed entries: every column except the
            terminal one (which no node reads)."""
            hist = self._near_hist.get((mi, far_dir))
            if not hist:
                return None
            needed = (range(1, ncols) if far_dir == "right"
                      else range(0, ncols - 1))
            chain = [None] * ncols
            for c in needed:
                ent = hist.get(c)
                if (ent is None or ent[2] != data_token
                        or ent[1] != env_ids(mi, c, far_dir)):
                    return None
                chain[c] = ent[0]
            return chain

        def ensure_run(i, mi):
            rid = run_of[i]
            if active_run.get(mi) == rid:
                return
            net = self.members[mi].net
            ncols = len(net.topology.columns)
            d = "l2r" if run_trend[rid] >= 0 else "r2l"
            cur_dir[mi] = d
            far_dir = "right" if d == "l2r" else "left"
            chain = reuse_chain(mi, far_dir, ncols)
            if chain is None:
                chain = list(self._timed(
                    "far_envs", self._jit_far_envs(mi, far_dir),
                    params_list[mi], data["inputs"][mi]))
                for c, env in enumerate(chain):
                    if env is not None:
                        record_env(mi, c, far_dir, env)
            far_envs[mi] = chain
            near_env[mi] = None
            near_col[mi] = -1 if d == "l2r" else ncols
            active_run[mi] = rid

        def advance_near(mi, upto_col):
            """Bring the near-side env up to (and including) upto_col."""
            d = cur_dir[mi]
            step = 1 if d == "l2r" else -1
            side = "left" if d == "l2r" else "right"
            while (near_col[mi] + step <= upto_col if d == "l2r"
                   else near_col[mi] + step >= upto_col):
                c = near_col[mi] + step
                fn = self._jit_advance(mi, c, side, near_env[mi] is not None)
                near_env[mi] = self._timed(
                    "advance", fn, params_list[mi], near_env[mi],
                    data["inputs"][mi])
                near_col[mi] = c
                record_env(mi, c, side, near_env[mi])

        rest_cache: Dict[int, jax.Array] = {}

        def rest_for(mi):
            if not use_rest:
                return None
            if mi not in rest_cache:
                tot = None
                for mj in range(len(self.members)):
                    if mj == mi:
                        continue
                    tot = y_members[mj] if tot is None else tot + y_members[mj]
                rest_cache[mi] = tot
            return rest_cache[mi]

        member_last_i = {}
        for i, (mi, ni) in enumerate(order):
            member_last_i[mi] = i

        # Junction rule (reference network.py:432-433, 534-535): skip nodes in
        # the same column as the LAST node of the opposite-direction pass.
        # The comparison value is frozen for this pass; we separately track
        # the last node processed here to hand to the next pass.
        frozen_other = last_other
        for i, (mi, ni) in enumerate(order):
            member = self.members[mi]
            net = member.net
            t = net.topology
            ci = t.col_of[ni]
            if frozen_other is not None and frozen_other == (mi, ci):
                continue
            if cfg.timeout is not None and (time.time() - start) > cfg.timeout:
                if cfg.verbose > 0:
                    print(f"Timeout reached ({cfg.timeout} s). Stopping sweep.")
                self._pending_ok.clear()
                return False, False, last_other

            if not t.input_nodes:
                # input-less network (baked-in data): standalone full-batch
                # path; inside a sum the other members' cached outputs are
                # the rest term (reference SumOfNetworks routes these through
                # its generic member delegation, network.py:1009-1060)
                eps = self._eps_for(NS, i, n_nodes, reverse=reversed_pass)
                method = cfg.method
                if eps == 0 and method == "ridge_exact":
                    method = "exact"
                upd = self._jit_update_standalone(mi, ni, method, use_rest)
                new_core, loss_sum, ok = self._timed(
                    f"update:{t.nodes[ni].name}", upd, params_list[mi],
                    data["y"], data["w"], rest_for(mi),
                    jnp.asarray(eps, jnp.float32))
                name = t.nodes[ni].name
                self._defer_ok(ok, name)
                params_list[mi] = dict(params_list[mi], **{name: new_core})
                last_other = (mi, ci)
                if use_rest and i == member_last_i[mi]:
                    y_members[mi] = self._member_forward_chunked(
                        mi, params_list, data)
                    rest_cache.clear()
                avg_loss = float(loss_sum) / S if loss_callback or cfg.verbose > 1 else None
                if cfg.verbose > 1:
                    print(f"NS: {NS}, loss ({name}): {avg_loss} (eps: {eps})")
                if loss_callback is not None:
                    loss_callback(NS, name, avg_loss)
                if convergence_criterion is not None and convergence_criterion():
                    if block_callback is not None:
                        block_callback(NS, name)
                    return self._flush_ok(), True, last_other
                if block_callback is not None:
                    block_callback(NS, name)
                continue

            ensure_run(i, mi)
            d = cur_dir[mi]
            # near env must cover everything strictly before ci
            if d == "l2r" and ci - 1 >= 0:
                advance_near(mi, ci - 1)
            elif d == "r2l" and ci + 1 <= len(t.columns) - 1:
                advance_near(mi, ci + 1)

            ncols = len(t.columns)
            if d == "l2r":
                L = near_env[mi]
                R = far_envs[mi][ci + 1] if ci < ncols - 1 else None
            else:
                L = far_envs[mi][ci - 1] if ci > 0 else None
                R = near_env[mi]

            eps = self._eps_for(NS, i, n_nodes, reverse=reversed_pass)
            method = cfg.method
            if eps == 0 and method == "ridge_exact":
                method = "exact"  # reference network.py:478-479

            return_pred = use_rest and i == member_last_i[mi]
            upd = self._jit_update(mi, ni, method, use_rest, return_pred, B)
            x0 = None
            if method in ITERATIVE_METHODS:
                # warm-start from the previous solution for this node
                # (reference node_sols, network.py:861,924-925)
                x0 = self._node_sols.get((mi, ni))
                if x0 is None:
                    x0 = jnp.zeros((params_list[mi][
                        t.nodes[ni].name].size,), jnp.float32)
            new_core, loss_sum, ok, pred, x_sol = self._timed(
                f"update:{t.nodes[ni].name}", upd,
                params_list[mi], L, R, data["inputs"][mi], data["y"],
                data["w"], rest_for(mi), jnp.asarray(eps, jnp.float32), x0)
            if x_sol is not None:
                self._node_sols[(mi, ni)] = x_sol
            name = t.nodes[ni].name
            self._defer_ok(ok, name)
            params_list[mi] = dict(params_list[mi], **{name: new_core})
            last_other = (mi, ci)

            if cfg.orthonormalize:
                from . import gauges
                k = t.main_nodes.index(ni) if ni in t.main_nodes else None
                if k is not None:
                    if d == "l2r" and k < len(t.main_nodes) - 1:
                        params_list[mi] = gauges.orthonormalize_left(net, params_list[mi], k)
                        # far env at the modified neighbour is stale: refresh
                        self._refresh_far(mi, ci + 1, far_envs, params_list, data)
                    elif d == "r2l" and k > 0:
                        params_list[mi] = gauges.orthonormalize_right(net, params_list[mi], k)
                        self._refresh_far(mi, ci - 1, far_envs, params_list, data,
                                          side="left")

            if use_rest and pred is not None:
                y_members[mi] = pred
                rest_cache.clear()

            avg_loss = float(loss_sum) / S if loss_callback or cfg.verbose > 1 else None
            if cfg.verbose > 1:
                print(f"NS: {NS}, loss ({name}): {avg_loss} (eps: {eps})")
            if loss_callback is not None:
                loss_callback(NS, name, avg_loss)
            if convergence_criterion is not None and convergence_criterion():
                if cfg.verbose > 0:
                    print("Converged")
                if block_callback is not None:
                    block_callback(NS, name)
                return self._flush_ok(), True, last_other
            if block_callback is not None:
                block_callback(NS, name)

        return self._flush_ok(), False, last_other

    def _refresh_far(self, mi, ci, far_envs, params_list, data, side="right"):
        net = self.members[mi].net
        ncols = len(net.topology.columns)
        if not (0 <= ci < ncols):
            return
        if side == "right":
            prev = far_envs[mi][ci + 1] if ci < ncols - 1 else None
            fn = self._jit_advance(mi, ci, "right", prev is not None)
        else:
            prev = far_envs[mi][ci - 1] if ci > 0 else None
            fn = self._jit_advance(mi, ci, "left", prev is not None)
        far_envs[mi][ci] = fn(params_list[mi], prev, data["inputs"][mi])


def accumulating_sweep(net: Network, params, x, y, loss_fn,
                       cfg: Optional[SweepConfig] = None, **run_kw):
    """Single-network convenience wrapper. Returns (params, success)."""
    sw = Sweeper(net, loss_fn, cfg or SweepConfig())
    out, ok = sw.run([params], x, y, **run_kw)
    return out[0], ok
