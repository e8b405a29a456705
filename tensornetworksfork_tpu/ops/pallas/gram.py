"""Pallas TPU kernel: weighted Gram (syrk) accumulation.

The hottest contraction of the sweep's regression path is the Gram build
A = Jᵀ diag(h) J over a sample chunk (engine.gram_and_rhs with a diagonal
Hessian — e.g. SquareBregFunction, h = 2w_s). This kernel tiles A over a
(D/T, D/T) grid and computes each (T, T) tile as one MXU dot over the full
chunk, fusing the per-sample Hessian weighting into the load — the weighted
copy of J is never written to HBM (XLA materialises it as a separate
elementwise kernel).

Used by the engine when `TNF_PALLAS=1` (or use_pallas=True on the Network)
and the node qualifies (diagonal Hessian, single output channel, J free of
output axes). Falls back to interpret mode off-TPU so tests run on CPU.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable only with a TPU-capable jaxlib
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

TILE = 128

# trace-time call counters: each jitted trace that routes through a kernel
# increments these, so sweep-level tests can assert the Pallas branch is
# actually taken for a given topology/shape (not just that kernels are
# correct in isolation).
CALLS = {"weighted_gram": 0, "gram_pair": 0, "add_packed_upper": 0,
         "gram_pair_q": 0, "quant_merge": 0}


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def default_tile() -> int:
    """Gram kernel D-tile. Bigger tiles cut the revisit DMA traffic
    (HBM bytes scale as ntiles = D/tile), which is what bounds the syrk
    kernel once symmetry halves the MXU work. Measured best at flagship
    shapes via benchmarks/gram_bench.py."""
    return int(os.environ.get("TNF_PALLAS_TILE", "512"))


def default_block() -> int:
    """Sample-block rows per grid step. Measured on the packed-TILED grid at
    the flagship shape (slope-timed to exclude the ~31 ms axon dispatch RTT):
    BS 1024 -> 32.8 ms, 1536 -> 31.3, 2048 -> 30.5 (bf16, tile 512); 3072
    VMEM-overflows the Mosaic compile (HTTP 500) — _clamp_packed guards
    (f32 clamps to 1024). The visit-all fallback grid clamps harder via
    _clamp_grid."""
    return int(os.environ.get("TNF_PALLAS_BLOCK", "2048"))


def gram_dtype():
    """Operand dtype for the Gram dot only (TNF_GRAM_DTYPE=f32|bf16|int8).

    bf16 runs the MXU in native single-pass mode (~2.7x the f32-HIGHEST
    Gram at flagship shapes) while everything around it — Jacobian build,
    Hessian weighting, rhs, Cholesky solve — stays f32: accumulation is
    f32 in the kernel, so only the operand rounding (8-bit mantissa) is
    lost, averaged down over the sample dimension. Default f32.

    int8 behaves exactly like bf16 everywhere EXCEPT the tiled packed-syrk
    Gram kernel, whose operands are additionally absmax-quantized to int8
    (see gram_quant / quantize_tiled) — so this returns bf16 for both: J
    storage, K build, rhs and predictions run the bf16 tier either way."""
    return (jnp.bfloat16
            if os.environ.get("TNF_GRAM_DTYPE", "f32").lower() in
            ("bf16", "int8") else None)


def gram_quant() -> bool:
    """int8-quantized Gram kernel operands (TNF_GRAM_DTYPE=int8).

    The packed Gram kernel is DMA-bound at bf16 (each (rows, tile) slab is
    re-read ~n+1 times by the pair grid), so halving operand bytes is worth
    more than the MXU's 1.45x int8 rate (benchmarks/int8_probe.py: 219 vs
    151 TFLOP/s tile-dot). Both Gram operands are quantized per (D-slab,
    sample-block, column) with absmax/127 scales; the int8x int8 -> int32
    MXU dot is exact and each block's partial is rescaled to f32 in-kernel
    before accumulation, so the only loss is the operand rounding (~2x the
    bf16 rounding error, averaged down over the sample dimension).
    Accuracy is workload-dependent: gate with a replication run before
    adopting on a new workload. int8 is the bench default (gated by the
    10-seed digits replication — mean unchanged vs f32); TNF_GRAM_DTYPE=bf16
    or f32 revert.

    Diagonal-Hessian caveat (ADVICE r03): the diag route quantizes
    K = h·J, so the per-(block, column) absmax scale is shared by every
    sample in the (up to 2048-row) block — samples whose Hessian weight h
    is far below the block max lose relative precision, a loss mode the
    bf16/f32 fused-weighting path doesn't have (h there rides the kernel at
    full precision). h can't be folded into the scales instead: it weights
    the rows INSIDE the s-reduction, while scales must be per-column to
    factor out of the int32 block dot. Workloads with extreme per-sample
    Hessian spreads (heteroscedastic regression, focal-style losses) should
    prefer TNF_GRAM_DTYPE=bf16; tests/test_int8_gram.py bounds the error at
    adversarial h spreads."""
    return os.environ.get("TNF_GRAM_DTYPE", "f32").lower() == "int8"


VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the 16 MB core limit


# --------------------------------------------------------------- packed syrk
# The round-2 syrk kernels skipped the lower-triangle COMPUTE with pl.when,
# but the grid still *visited* every (i, j, b) point — so Pallas's pipeline
# still DMA'd the input blocks for skipped tiles, and at bf16 (DMA-bound)
# symmetry bought nothing (measured, RESULTS.md round-2 ladder). The packed
# grid instead enumerates ONLY the upper-triangle tile pairs via the
# round-robin map (k, i) -> {i, (i+k) mod n}: every unordered pair at
# circular distance k appears exactly once for k < n/2 (k=0 is the
# diagonal); for even n the distance-n/2 pairs appear twice — the duplicate
# grid point recomputes the SAME tile and overwrites it with the same
# value (b==0 resets the accumulator), so it costs ~3% redundant work and
# needs no masking. Both MXU work and HBM traffic drop ~2x; there is no
# conditional in the kernel body at all.


def _packed_nk(n: int) -> int:
    """Number of k rounds: diagonal (k=0) + circular distances 1..floor(n/2)."""
    return n // 2 + 1


def _pq(k, i, n: int):
    """Upper-triangle tile coordinates for round k, row i (traced scalars)."""
    j = jax.lax.rem(i + k, n)
    return jnp.minimum(i, j), jnp.maximum(i, j)


def _packed_enabled() -> bool:
    return os.environ.get("TNF_PALLAS_PACKED", "1") == "1"


def band_enabled() -> bool:
    """Resident-band int8 schedule (TNF_PALLAS_BAND, default ON): j1 slabs
    stay in VMEM across the pair round (the packed grid re-fetches BOTH
    slabs per pair) and the chunk carry chains through the kernels (no
    separate add pass). int8-only: a 3-block resident window is 3.1 MB at
    int8; the 2-byte bf16 slab would force 1-block parts whose per-part
    carry chaining costs more than the add it replaces.

    Measured (v5e 2026-08-20, RESULTS.md round-5 ladder): kernel-only
    slope 18.0 ms INCLUDING the fused carry add vs 18.2 + 2.7 packed
    kernel + add; flagship A2 update 53 -> 49 ms/chunk (bit-identical
    checksum); flagship epoch 5.041 -> 4.736 s. Accuracy-gated: the
    10-seed digits replication with the band route forced onto every
    packed node is PER-SEED IDENTICAL to the packed int8 tier
    (96.55 +/- 1.11, results/reproduce_digits.csv 2026-08-20 block).
    TNF_PALLAS_BAND=0 reverts to the packed grid + add_packed_upper."""
    return os.environ.get("TNF_PALLAS_BAND", "1") == "1" and gram_quant()


def _group() -> int:
    """Pair-group size G for the packed-tiled grids (TNF_PALLAS_GROUP).

    The (k, i, b) grid re-DMAs BOTH operand slabs for every tile pair, so
    the bf16/int8 kernels pay pairs x rows x tile x 2 operand bytes. With
    G > 1 the grid enumerates GxG pair-BLOCKS: one (G, bs, tile) load per
    operand serves G^2 tile dots, cutting operand DMA by ~G on a DMA-bound
    kernel. G=1 reproduces the round-3 schedule exactly.

    Default 1: the round-5 hardware A/B at the flagship shape (slope-timed,
    benchmarks/gram_bench.py kernelonly/qkernelonly, v5e 2026-08-20) has
    the grouped schedule LOSING on both quantized dtypes — bf16 37.0 vs
    30.6 ms, int8 19.9 vs 18.0 — the G-row operand windows halve the
    per-step DMA streams' length and the round-robin pair map already
    near-perfectly reuses slabs across adjacent grid steps. The grouped
    grids stay available (TNF_PALLAS_GROUP=2) for shapes where slab DMA
    dominates harder."""
    try:
        g = int(os.environ.get("TNF_PALLAS_GROUP", "1"))
    except ValueError:
        g = 1
    return max(g, 1)


def _effective_group(n: int, itemsize: int, acc=None) -> int:
    """G actually usable: needs n % G == 0 slab rows, no in-kernel chunk
    accumulator (the acc input spec is tile-grained), and a <=2-byte dtype
    (the f32 kernel is 6-pass-compute-bound — grouping buys nothing and
    its (G*tile)^2 f32 out tile blows the tighter f32 VMEM budget)."""
    if acc is not None or itemsize > 2:
        return 1
    g = _group()
    while g > 1 and n % g:
        g -= 1
    return g


def _clamp_group_bs(G: int, tile: int, BS: int,
                    itemsize: int) -> Optional[int]:
    """Sample sub-block for the grouped grid: largest power-of-2 divisor of
    BS (so int8 quantization blocks are never straddled) whose footprint —
    triple-buffered (G, bs, tile) operands x2 + the resident (G*tile)^2 f32
    out tile — fits the calibrated VMEM budget. Returns None when NO
    fitting sub-block exists (e.g. at tile 1024 the (G*tile)^2 out tile
    alone is 16.8 MB — over the core's 16 MB VMEM — or BS runs out of
    power-of-2 divisors above the 256 floor): callers must then disable
    grouping rather than submit a Mosaic-VMEM-doomed compile.
    TNF_PALLAS_GROUP_BS forces a value (probe/test hook)."""
    forced = os.environ.get("TNF_PALLAS_GROUP_BS", "")
    if forced:
        return min(int(forced), BS)
    budget = VMEM_BUDGET if itemsize == 2 else 11 * 1024 * 1024
    bs = BS

    def fits(b):
        return (3 * 2 * G * b * tile * itemsize
                + (G * tile) ** 2 * 4) <= budget

    while not fits(bs) and bs % 2 == 0 and bs > 256:
        bs //= 2
    return bs if fits(bs) else None


def _retile(x: jax.Array, n: int, tile: int) -> jax.Array:
    """(rows, n*tile) -> (n, rows, tile): one contiguous slab per D-tile.

    The packed grid's (BS, tile) blocks of a row-major (rows, D) operand are
    strided reads (1 KB per row at tile 512/bf16) that realize only ~480 GB/s;
    pre-tiling makes each block a contiguous read and takes the flagship
    packed kernel 42.6 -> 30.5 ms (slope-timed). The transpose costs ~3.5 ms
    standalone and XLA can often fuse it into the operand's producer."""
    rows = x.shape[0]
    return jnp.transpose(x.reshape(rows, n, tile), (1, 0, 2))


def _clamp_packed(tile: int, block: int, itemsize: int, acc: bool = False):
    """VMEM clamp for the packed-tiled grid: triple-buffered (block, tile)
    operand slabs + ONE resident f32 (tile, tile) accumulator (the out tile
    is revisited across the innermost axis, not multi-buffered). Calibrated
    on hardware at tile 512: bf16 block 2048 compiles, 3072 overflows;
    f32 block 768 compiles, 1024 overflows at 18.75M scoped (the f32
    in-kernel transpose+6-pass dot needs more scratch, hence the tighter
    budget) — so the clamp steps block down by 3/4 then halves."""
    budget = VMEM_BUDGET if itemsize == 2 else 11 * 1024 * 1024
    acc_bytes = (3 * 4) if acc else 0  # buffered f32 acc tile input

    def fits(t, b):
        return (3 * 2 * b * t * itemsize + t * t * (4 + acc_bytes)) <= budget

    while not fits(tile, block) and block > 256:
        block -= 256  # fine steps: f32 lands on 768, not a halved 512
    while not fits(tile, block) and tile > 128:
        tile //= 2
    return tile, block


def _clamp_grid(tile: int, block: int, itemsize: int):
    """Shrink (tile, block) until the kernel's VMEM footprint fits.

    Footprint model calibrated against Mosaic's observed accounting at
    D=16200 (triple buffering of the two (block, tile) inputs and the f32
    (tile, tile) output tile): tile 512 fits at every dtype; 768 fits bf16
    but not f32; 1024 fits neither. Oversized env settings degrade instead
    of crashing the remote compile service."""
    def fits(t, b):
        return (3 * 2 * b * t * itemsize + 3 * t * t * 4) <= VMEM_BUDGET

    while not fits(tile, block) and block > 128:
        block //= 2
    while not fits(tile, block) and tile > 128:
        tile //= 2
    return tile, block


def pallas_enabled() -> bool:
    """Pallas Gram kernels default ON on TPU hardware (off elsewhere — the
    interpret-mode fallback is for tests, not speed). TNF_PALLAS=0/1
    overrides."""
    if not _HAVE_PLTPU:
        return False
    env = os.environ.get("TNF_PALLAS")
    if env is not None:
        return env == "1"
    return _on_tpu()


def _kernel(h_ref, j1_ref, j2_ref, out_ref):
    w = h_ref[:]  # (BS, 1)
    jw = (j1_ref[:] * w).astype(j1_ref.dtype)
    tile = _gram_dot(jw, j2_ref[:])

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = tile

    @pl.when(pl.program_id(2) != 0)
    def _():
        out_ref[:] = out_ref[:] + tile


def _syrk_weighted_kernel(h_ref, j1_ref, j2_ref, out_ref):
    """weighted_gram with only on/above-diagonal tiles computed (the
    weighted Gram is symmetric); mirrored outside the kernel."""
    i, j, b = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(i <= j)
    def _():
        w = h_ref[:]
        jw = (j1_ref[:] * w).astype(j1_ref.dtype)
        tile = _gram_dot(jw, j2_ref[:])

        @pl.when(b == 0)
        def _():
            out_ref[:] = tile

        @pl.when(b != 0)
        def _():
            out_ref[:] = out_ref[:] + tile

    @pl.when(jnp.logical_and(i > j, b == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "block", "symmetric",
                                    "mirror"))
def _weighted_gram_jit(J: jax.Array, h: jax.Array, interpret: bool = False,
                  tile: Optional[int] = None, block: Optional[int] = None,
                  symmetric: bool = True, mirror: bool = True) -> jax.Array:
    """A[d, e] = sum_s h[s] J[s, d] J[s, e].  J: (B, D), h: (B,).

    The diagonal-Hessian Gram with the per-sample weighting FUSED into the
    kernel load — the weighted copy of J never exists in HBM (gram_pair by
    contrast needs a materialised K operand). Grid (D/T, D/T, B/BS): the
    sample-block axis is innermost so each output tile stays resident in
    VMEM across the reduction (revisit pattern)."""
    # (counter bumped in the public wrapper: a global jit-cache hit
    # skips this body, so a trace-time counter here under-counts)
    if tile is None:
        tile = default_tile()
    if block is None:
        block = default_block()
    packed = _packed_enabled()
    clamp = _clamp_packed if (symmetric and packed) else _clamp_grid
    tile, block = clamp(tile, block, jnp.dtype(J.dtype).itemsize)
    if symmetric and not packed and J.dtype == jnp.bfloat16 and os.environ.get(
            "TNF_PALLAS_SYM", "auto") == "auto":
        symmetric = False  # the visit-all syrk saves no DMA (round-2 policy)
    B, D = J.shape
    BS = min(B, block)
    Bp = ((B + BS - 1) // BS) * BS
    Dp = ((D + tile - 1) // tile) * tile
    if Dp != D or Bp != B:
        J = jnp.pad(J, ((0, Bp - B), (0, Dp - D)))
    h2 = jnp.pad(h, (0, Bp - B)).reshape(Bp, 1).astype(jnp.float32)
    n = Dp // tile
    if symmetric and packed:
        Jt = _retile(J, n, tile)
        operands = (h2, Jt, Jt)
        grid = (_packed_nk(n), n, Bp // BS)
        in_specs = [
            pl.BlockSpec((BS, 1), lambda k, i, b: (b, 0)),
            pl.BlockSpec((1, BS, tile), lambda k, i, b: (_pq(k, i, n)[0], b, 0)),
            pl.BlockSpec((1, BS, tile), lambda k, i, b: (_pq(k, i, n)[1], b, 0)),
        ]
        out_spec = pl.BlockSpec((tile, tile), lambda k, i, b: _pq(k, i, n))
        kernel = _weighted_kernel_tiled
    else:
        operands = (h2, J, J)
        grid = (n, n, Bp // BS)
        in_specs = [
            pl.BlockSpec((BS, 1), lambda i, j, b: (b, 0)),
            pl.BlockSpec((BS, tile), lambda i, j, b: (b, i)),
            pl.BlockSpec((BS, tile), lambda i, j, b: (b, j)),
        ]
        out_spec = pl.BlockSpec((tile, tile), lambda i, j, b: (i, j))
        kernel = _syrk_weighted_kernel if symmetric else _kernel

    A = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(*operands)
    if symmetric and mirror:
        A = jnp.triu(A) + jnp.triu(A, 1).T
    # mirror=False returns the RAW syrk output: exact upper triangle,
    # UNDEFINED strictly-lower content (packed grid never visits those
    # tiles). Callers accumulate raw chunks and apply mirror_gram() once —
    # the transpose-heavy mirror costs ~15 ms at D=16200 (slope-timed), so per
    # chunk it dominated the kernel itself.
    return A[:D, :D]


def weighted_gram_auto(J: jax.Array, h: jax.Array) -> jax.Array:
    """weighted_gram with interpret-mode fallback off-TPU."""
    return weighted_gram(J, h, interpret=not _on_tpu())


def _dot_precision(ref):
    # the package-global jax_default_matmul_precision=highest maps to
    # contract_precision<fp32>, which Mosaic rejects for bf16 operands;
    # bf16 inputs want the native single-pass MXU mode anyway.
    return (jax.lax.Precision.DEFAULT if ref.dtype == jnp.bfloat16 else None)


def _gram_dot(j1, j2):
    """tileᵀ-Gram dot: A_tile = j1ᵀ j2 for (BS, T) VMEM blocks.

    Mosaic lowers a dim0×dim0 contraction ~1.65x slower than the natural
    (1,)×(0,) form (measured 62 vs 102 TFLOP/s bf16 at BS=2048, T=512);
    an explicit in-VMEM transpose of the lhs then a natural dot is the
    fast lowering."""
    return jax.lax.dot_general(
        j1.T, j2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(j1))


def _pair_kernel(j1_ref, j2_ref, out_ref):
    tile = _gram_dot(j1_ref[:], j2_ref[:])

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = tile

    @pl.when(pl.program_id(2) != 0)
    def _():
        out_ref[:] = out_ref[:] + tile


def _pair_kernel_tiled(j1_ref, j2_ref, out_ref):
    """_pair_kernel over pre-tiled (1, BS, tile) operand slabs."""
    tile = _gram_dot(j1_ref[0], j2_ref[0])

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = tile

    @pl.when(pl.program_id(2) != 0)
    def _():
        out_ref[:] = out_ref[:] + tile


def _acc_first_visit(n: int):
    """Accumulate-mode bookkeeping for the packed grid's duplicate round.

    For even n the distance-n/2 round visits each of its tiles TWICE
    (i and i + n/2 map to the same unordered pair). With a chunk
    accumulator input a_ref this is no longer idempotent: exactly ONE
    visit may add a_ref. Grid order is i-ascending and the SECOND visit's
    flush wins, so the first visit (i < n/2) writes t alone and the second
    (i >= n/2) writes a + t — the final flushed value is a + t. a_ref is a
    separate (non-aliased) input, so both visits read the ORIGINAL
    accumulator, never a twin's flush."""
    k, i = pl.program_id(0), pl.program_id(1)
    is_dup_round = jnp.logical_and(n % 2 == 0, 2 * k == n)
    return jnp.logical_not(jnp.logical_and(is_dup_round, i < n // 2))


def _make_pair_kernel_tiled_acc(n: int):
    def kernel(a_ref, j1_ref, j2_ref, out_ref):
        t = _gram_dot(j1_ref[0], j2_ref[0])
        add_acc = _acc_first_visit(n)

        @pl.when(pl.program_id(2) == 0)
        def _():
            out_ref[:] = t + jnp.where(add_acc, a_ref[:],
                                       jnp.zeros_like(a_ref))

        @pl.when(pl.program_id(2) != 0)
        def _():
            out_ref[:] = out_ref[:] + t
    return kernel


def _make_weighted_kernel_tiled_acc(n: int):
    def kernel(a_ref, h_ref, j1_ref, j2_ref, out_ref):
        w = h_ref[:]
        jw = (j1_ref[0] * w).astype(j1_ref.dtype)
        t = _gram_dot(jw, j2_ref[0])
        add_acc = _acc_first_visit(n)

        @pl.when(pl.program_id(2) == 0)
        def _():
            out_ref[:] = t + jnp.where(add_acc, a_ref[:],
                                       jnp.zeros_like(a_ref))

        @pl.when(pl.program_id(2) != 0)
        def _():
            out_ref[:] = out_ref[:] + t
    return kernel


def _weighted_kernel_tiled(h_ref, j1_ref, j2_ref, out_ref):
    """_kernel (fused weighting) over pre-tiled (1, BS, tile) slabs."""
    w = h_ref[:]  # (BS, 1)
    jw = (j1_ref[0] * w).astype(j1_ref.dtype)
    tile = _gram_dot(jw, j2_ref[0])

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = tile

    @pl.when(pl.program_id(2) != 0)
    def _():
        out_ref[:] = out_ref[:] + tile


def _syrk_kernel(j1_ref, j2_ref, out_ref):
    """Symmetric Gram: compute only tiles on/above the diagonal (i <= j);
    the strictly-lower tiles are filled by mirroring outside the kernel.
    Halves MXU work vs the rectangular kernel — a symmetry XLA's dot lowering
    does not exploit."""
    i, j, b = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(i <= j)
    def _():
        tile = _gram_dot(j1_ref[:], j2_ref[:])

        @pl.when(b == 0)
        def _():
            out_ref[:] = tile

        @pl.when(b != 0)
        def _():
            out_ref[:] = out_ref[:] + tile

    # skipped lower tiles: write zeros once so the output buffer is fully
    # defined (the mirror only reads the upper triangle, but leaving HBM
    # uninitialised would trip all-finite checks on the raw buffer)
    @pl.when(jnp.logical_and(i > j, b == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "block", "symmetric",
                                    "mirror"))
def _gram_pair_jit(J1: jax.Array, J2: jax.Array, interpret: bool = False,
                   tile: Optional[int] = None, block: Optional[int] = None,
                   symmetric: bool = False, mirror: bool = True) -> jax.Array:
    """A[d, e] = sum_s J1[s, d] J2[s, e] — the full-Hessian Gram form: with
    J1 = J reshaped (B*C, D) and J2 = (H-weighted coeff) reshaped, this is
    the XE-path Gram accumulation (engine.gram_and_rhs full branch).

    Accumulates in f32 regardless of input dtype (pass bf16 inputs for the
    single-pass MXU mode). Grid (D/tile, D/tile, B/block) with the sample
    blocks innermost so each output tile stays VMEM-resident across the
    reduction; `tile` > 128 (MXU native) raises arithmetic intensity —
    HBM traffic scales as 1/tile, which is what makes the flagship
    D=16200 Gram compute-bound instead of load-bound.

    symmetric=True (valid when A is symmetric, i.e. J2 = W J1 with W
    symmetric — every Gauss-Newton Gram) computes only the upper-triangular
    tiles and mirrors them, halving MXU work."""
    # (counter bumped in the public wrapper: a global jit-cache hit
    # skips this body, so a trace-time counter here under-counts)
    if tile is None:
        tile = default_tile()
    if block is None:
        block = default_block()
    packed = _packed_enabled()
    clamp = _clamp_packed if (symmetric and packed) else _clamp_grid
    tile, block = clamp(tile, block, jnp.dtype(J1.dtype).itemsize)
    if symmetric and not packed and J1.dtype == jnp.bfloat16 and os.environ.get(
            "TNF_PALLAS_SYM", "auto") == "auto":
        # round-2 policy for the visit-all syrk: bf16 ran DMA-bound, skipping
        # only the lower-triangle DOTS saved nothing. The packed grid (which
        # also halves the DMA) supersedes this — kept for TNF_PALLAS_PACKED=0.
        symmetric = False
    B, D = J1.shape
    BS = min(B, block)
    Bp = ((B + BS - 1) // BS) * BS
    Dp = ((D + tile - 1) // tile) * tile
    if Dp != D or Bp != B:
        J1 = jnp.pad(J1, ((0, Bp - B), (0, Dp - D)))
        J2 = jnp.pad(J2, ((0, Bp - B), (0, Dp - D)))
    n = Dp // tile
    if symmetric and packed:
        J1 = _retile(J1, n, tile)
        J2 = _retile(J2, n, tile)
        grid = (_packed_nk(n), n, Bp // BS)
        in_specs = [
            pl.BlockSpec((1, BS, tile),
                         lambda k, i, b: (_pq(k, i, n)[0], b, 0)),
            pl.BlockSpec((1, BS, tile),
                         lambda k, i, b: (_pq(k, i, n)[1], b, 0)),
        ]
        out_spec = pl.BlockSpec((tile, tile), lambda k, i, b: _pq(k, i, n))
        kernel = _pair_kernel_tiled
    else:
        grid = (n, n, Bp // BS)
        in_specs = [
            pl.BlockSpec((BS, tile), lambda i, j, b: (b, i)),
            pl.BlockSpec((BS, tile), lambda i, j, b: (b, j)),
        ]
        out_spec = pl.BlockSpec((tile, tile), lambda i, j, b: (i, j))
        kernel = _syrk_kernel if symmetric else _pair_kernel
    A = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(J1, J2)
    if symmetric and mirror:
        # mirror the strictly-upper triangle into the lower half; diagonal
        # tiles were computed fully, so an elementwise triu-mirror
        # reconstructs the exact symmetric A.
        A = jnp.triu(A) + jnp.triu(A, 1).T
    # mirror=False: raw upper-valid / lower-undefined output — see
    # weighted_gram. Use mirror_gram() after accumulating raw chunks.
    return A[:D, :D]


def mirror_gram(A: jax.Array) -> jax.Array:
    """Reconstruct the full symmetric A from a raw (upper-valid) syrk output.

    Exact no-op on an already-symmetric A, so callers that accumulated
    mirror=False chunks can apply it unconditionally."""
    return jnp.triu(A) + jnp.triu(A, 1).T


# ------------------------------------------------------------ pretiled entry
def plan_tiles(D: int, itemsize: int, acc: bool = False):
    """Plan the packed-tiled grid for a caller that pre-tiles its operands.

    Returns (tile, block, n, Dp): callers reshape a (rows, D) operand to
    (n, rows, tile) — padding D to Dp = n*tile first — and pass it to
    gram_pair_tiled / weighted_gram_tiled with the same (tile, block).
    Producing the operands in tiled layout lets one retile feed the K build,
    the rhs AND the Gram kernel, instead of each kernel call paying its own
    strided reads (engine.packed_gram_rhs). acc=True budgets the extra
    buffered (tile, tile) f32 accumulator input of the acc kernels."""
    tile, block = _clamp_packed(default_tile(), default_block(), itemsize,
                                acc=acc)
    n = (D + tile - 1) // tile
    return tile, block, n, n * tile


def _retile_copy_kernel(in_ref, out_ref):
    out_ref[0] = in_ref[:]


def retile_rows(Jf: jax.Array, n: int, tile: int) -> jax.Array:
    """(rows, D) -> (n, rows, tile) with D padded to n*tile.

    On TPU the relayout runs as a Pallas copy kernel over the tile-aligned
    columns (XLA lowers the pad+reshape+transpose at ~110 GB/s — 11 ms for
    the flagship J; the copy kernel does it in 7.5), with the ragged tail
    tile (D % tile columns) padded by XLA and spliced in with one
    dynamic_update_slice."""
    rows, D = Jf.shape
    Dp = n * tile
    nfull = D // tile
    if _on_tpu() and nfull > 0 and rows % 512 == 0:
        BS = 2048 if rows % 2048 == 0 else 512
        main = pl.pallas_call(
            _retile_copy_kernel,
            out_shape=jax.ShapeDtypeStruct((n, rows, tile), Jf.dtype),
            grid=(nfull, rows // BS),
            in_specs=[pl.BlockSpec((BS, tile), lambda i, b: (b, i))],
            out_specs=pl.BlockSpec((1, BS, tile), lambda i, b: (i, b, 0)),
        )(Jf)
        if nfull == n:
            return main
        tail = jnp.pad(Jf[:, nfull * tile:], ((0, 0), (0, Dp - D)))[None]
        return jax.lax.dynamic_update_slice(main, tail, (nfull, 0, 0))
    if Dp != D:
        Jf = jnp.pad(Jf, ((0, 0), (0, Dp - D)))
    return _retile(Jf, n, tile)


def _kmix_block(S: int, C: int, tile: int, itemsize: int) -> int:
    """Sample-block rows for the fused retile+hmix kernel: the largest
    power-of-two divisor of S whose three (BS, C, tile) blocks (input J,
    output Jt, output Kt — multi-buffered) plus the kernel's hoisted f32
    class slices fit the VMEM budget. The 16*itemsize bytes/element
    coefficient is EMPIRICAL: at (BS=128, C=9, tile=512, bf16) Mosaic's
    scoped allocation measured 18.62 MB = ~31.6 B per BS*C*tile element
    (the 3*3*itemsize model undercounted 1.76x and OOM'd the 16 MB core
    limit on hardware at the flagship shape)."""
    ov = int(os.environ.get("TNF_KMIX_BLOCK", "0"))
    if ov and S % ov == 0:
        return ov
    BS = 512
    while BS > 8 and (S % BS or 16 * BS * C * tile * itemsize
                      > VMEM_BUDGET):
        BS //= 2
    return BS


def _make_retile_hmix_kernel(C: int):
    def kernel(h_ref, j_ref, jt_ref, kt_ref):
        j = j_ref[...]      # (BS, C, tile) — C on sublanes
        h = h_ref[...]      # (C, C, BS, 1) f32 — (BS, 1) rows lane-broadcast
        # hoist the per-class slices once in f32: each is a sublane
        # relayout (BS, C, tile) -> (BS, tile), reused C times by the mix;
        # jt takes the exact bf16->f32->bf16 round-trip of the same slice
        # (one hoisted list, not two — the bf16 js list cost VMEM stack;
        # a no-hoist variant compiled to the IDENTICAL 18.62M scoped
        # allocation at BS=128 — Mosaic CSEs the slices — so BS=64 is a
        # hard clamp at the flagship shape, not a kernel-body artifact)
        jf = [j[:, d, :].astype(jnp.float32) for d in range(C)]
        for c in range(C):
            jt_ref[0, c] = jf[c].astype(jt_ref.dtype)
            acc = h[c, 0] * jf[0]
            for d in range(1, C):
                acc += h[c, d] * jf[d]
            kt_ref[0, c] = acc.astype(kt_ref.dtype)
    return kernel


def retile_hmix(J3: jax.Array, H: jax.Array, n: int, tile: int,
                interpret: bool = False):
    """Fused class-major retile + Hessian class mixing.

    J3: (S, C, D) packed Jacobian; H: (S, C, C) per-sample Hessian (f32).
    Returns (Jt, Kt), both (n, C, S, tile) in J3's dtype with
    K[s,c] = sum_d H[s,c,d] J[s,d] and D padded to n*tile.

    Replaces retile_rows + the slab-wise K einsum on the engine's tiled
    Gram path: XLA lowers the (S,C,C)x(S,C,D) class mixing as an MXU
    batched matmul with C (~9) padded to 128 — ~14x wasted MXU work,
    measured 8.8 ms/chunk at the flagship — while this kernel does the
    C^2 mixing as unrolled VPU FMAs DURING the retile's single read of J
    (mix in f32, one rounding on store). Rows come back CLASS-major
    ((c, s) instead of (s, c)): the Gram and rhs contract over rows, so
    any order is valid as long as J, K and g agree — engine.packed_gram_rhs
    reorders g to match. The tail tile (D % tile columns) is built by XLA
    and spliced in, like retile_rows."""
    S, C, D = J3.shape
    Dp = n * tile
    nfull = D // tile
    BS = _kmix_block(S, C, tile, jnp.dtype(J3.dtype).itemsize)
    Hc = jnp.transpose(H.astype(jnp.float32), (1, 2, 0))  # (C, C, S)
    use_kernel = (_on_tpu() or interpret) and nfull > 0 and S % BS == 0
    if use_kernel:
        Jt, Kt = pl.pallas_call(
            _make_retile_hmix_kernel(C),
            out_shape=(jax.ShapeDtypeStruct((n, C, S, tile), J3.dtype),
                       jax.ShapeDtypeStruct((n, C, S, tile), J3.dtype)),
            grid=(nfull, S // BS),
            in_specs=[
                # trailing size-1 lane dim: (BS, 1) H rows lane-broadcast
                # against (BS, tile) with no in-kernel transpose (the
                # own_out_gram H layout trick)
                pl.BlockSpec((C, C, BS, 1), lambda i, b: (0, 0, b, 0)),
                pl.BlockSpec((BS, C, tile), lambda i, b: (b, 0, i)),
            ],
            out_specs=(pl.BlockSpec((1, C, BS, tile),
                                    lambda i, b: (i, 0, b, 0)),
                       pl.BlockSpec((1, C, BS, tile),
                                    lambda i, b: (i, 0, b, 0))),
            interpret=interpret,
        )(Hc[..., None], J3)
        if nfull == n:
            return Jt, Kt
        tail = J3[:, :, nfull * tile:]
    else:
        tail = J3 if nfull == 0 else None
    # XLA path: the ragged tail tile (or, off-TPU/odd-S, everything)
    def _cm(block, off, JT, KT):
        pad = tile - block.shape[2] % tile if block.shape[2] % tile else 0
        nb = (block.shape[2] + pad) // tile
        jb = jnp.pad(block, ((0, 0), (0, 0), (0, pad)))
        kb = jnp.einsum("cds,sdt->cst", Hc, jb).astype(J3.dtype)
        jcm = jnp.transpose(jb, (1, 0, 2))
        jt = jnp.transpose(jcm.reshape(C, S, nb, tile), (2, 0, 1, 3))
        kt = jnp.transpose(kb.reshape(C, S, nb, tile), (2, 0, 1, 3))
        if JT is None:
            return jt, kt
        return (jax.lax.dynamic_update_slice(JT, jt, (off, 0, 0, 0)),
                jax.lax.dynamic_update_slice(KT, kt, (off, 0, 0, 0)))
    if use_kernel:
        return _cm(tail, nfull, Jt, Kt)
    Jt = jnp.zeros((n, C, S, tile), J3.dtype)
    Kt = jnp.zeros((n, C, S, tile), J3.dtype)
    if nfull > 0:
        Jt, Kt = _cm(J3[:, :, :nfull * tile], 0, Jt, Kt)
        if nfull < n:
            Jt, Kt = _cm(J3[:, :, nfull * tile:], nfull, Jt, Kt)
        return Jt, Kt
    return _cm(J3, 0, Jt, Kt)


def _group_accum(out_ref, tf, g1, g2, T):
    """Write/accumulate one (T, T) sub-tile of the grouped out block."""
    r0, c0 = g1 * T, g2 * T
    first = pl.program_id(2) == 0

    @pl.when(first)
    def _():
        out_ref[r0:r0 + T, c0:c0 + T] = tf

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[r0:r0 + T, c0:c0 + T] = out_ref[r0:r0 + T, c0:c0 + T] + tf


def _make_pair_kernel_tiled_g(G: int, T: int):
    """_pair_kernel_tiled over (G, bs, tile) operand superblocks: each DMA'd
    slab pair serves G^2 tile dots (the DMA-halving grouped schedule)."""
    def kernel(j1_ref, j2_ref, out_ref):
        for g1 in range(G):
            j1t = j1_ref[g1].T
            for g2 in range(G):
                tf = jax.lax.dot_general(
                    j1t, j2_ref[g2], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_dot_precision(j1_ref))
                _group_accum(out_ref, tf, g1, g2, T)
    return kernel


def _make_weighted_kernel_tiled_g(G: int, T: int):
    def kernel(h_ref, j1_ref, j2_ref, out_ref):
        w = h_ref[:]  # (bs, 1)
        for g1 in range(G):
            jw = (j1_ref[g1] * w).astype(j1_ref.dtype).T
            for g2 in range(G):
                tf = jax.lax.dot_general(
                    jw, j2_ref[g2], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_dot_precision(j1_ref))
                _group_accum(out_ref, tf, g1, g2, T)
    return kernel


def _make_pair_kernel_tiled_q_g(G: int, T: int):
    """Grouped _pair_kernel_tiled_q: exact int32 sub-block dots, each
    rescaled by its quantization block's per-column scales before the f32
    accumulation (a quantization block is never straddled — bs divides the
    quantizer's BS — so sub-block splitting only reorders exact-int32
    partial sums into f32 adds)."""
    def kernel(s1_ref, s2_ref, j1_ref, j2_ref, out_ref):
        for g1 in range(G):
            j1t = j1_ref[g1].T
            s1 = s1_ref[g1, 0]  # (tile, 1)
            for g2 in range(G):
                t = jax.lax.dot_general(
                    j1t, j2_ref[g2], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT)
                tf = t.astype(jnp.float32) * (s1 * s2_ref[g2, 0])
                _group_accum(out_ref, tf, g1, g2, T)
    return kernel


def _pad_rows3(x: jax.Array, BS: int):
    B = x.shape[1]
    Bp = ((B + BS - 1) // BS) * BS
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, Bp - B), (0, 0)))
    return x, Bp


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "block", "mirror",
                                    "group"))
def _gram_pair_tiled_jit(J1t: jax.Array, J2t: jax.Array,
                         interpret: bool = False,
                         tile: int = 512, block: int = 2048,
                         mirror: bool = False, acc=None,
                         group: int = 1) -> jax.Array:
    """gram_pair(symmetric=True) over PRE-TILED (n, rows, tile) operands.

    Returns the full (n*tile, n*tile) A — callers slice [:D, :D]. mirror
    semantics as gram_pair; the packed grid is always used.

    acc (optional, (Dp, Dp) f32, raw upper-valid): chunk accumulator added
    INSIDE the kernel — replaces the caller's separate full-matrix
    `A_acc + A` pass (~3 GB of HBM traffic per chunk at D=16200) with an
    upper-tiles-only read folded into the kernel pipeline. Incompatible
    with mirror=True (the result stays raw)."""
    # (counter bumped in the public wrapper: a global jit-cache hit
    # skips this body, so a trace-time counter here under-counts)
    n = J1t.shape[0]
    BS = min(J1t.shape[1], block)
    J1t, Bp = _pad_rows3(J1t, BS)
    J2t, _ = _pad_rows3(J2t, BS)
    Dp = n * tile
    operands = [J1t, J2t]
    in_specs = [
        pl.BlockSpec((1, BS, tile), lambda k, i, b: (_pq(k, i, n)[0], b, 0)),
        pl.BlockSpec((1, BS, tile), lambda k, i, b: (_pq(k, i, n)[1], b, 0)),
    ]
    kernel = _pair_kernel_tiled
    grid = (_packed_nk(n), n, Bp // BS)
    out_spec = pl.BlockSpec((tile, tile), lambda k, i, b: _pq(k, i, n))
    if acc is not None:
        assert not mirror, "acc accumulates raw; mirror once after the scan"
        operands = [acc] + operands
        in_specs = [pl.BlockSpec((tile, tile),
                                 lambda k, i, b: _pq(k, i, n))] + in_specs
        kernel = _make_pair_kernel_tiled_acc(n)
    elif group > 1:
        G = group
        ng = n // G
        bs = _clamp_group_bs(G, tile, BS, J1t.dtype.itemsize)
        if bs is not None:  # None: no fitting sub-block — stay ungrouped
            if Bp % bs:
                J1t = _pad_rows3(J1t, bs)[0]
                J2t, Bp = _pad_rows3(J2t, bs)
            operands = [J1t, J2t]
            in_specs = [
                pl.BlockSpec((G, bs, tile),
                             lambda k, i, b, ng=ng: (_pq(k, i, ng)[0], b, 0)),
                pl.BlockSpec((G, bs, tile),
                             lambda k, i, b, ng=ng: (_pq(k, i, ng)[1], b, 0)),
            ]
            kernel = _make_pair_kernel_tiled_g(G, tile)
            grid = (_packed_nk(ng), ng, Bp // bs)
            out_spec = pl.BlockSpec((G * tile, G * tile),
                                    lambda k, i, b, ng=ng: _pq(k, i, ng))
    A = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(*operands)
    if mirror:
        A = jnp.triu(A) + jnp.triu(A, 1).T
    return A


# ------------------------------------------------------------ int8 tier
def _quant_kernel(j_ref, q_ref, s_ref):
    """Single-pass block quantizer: per-column absmax over the (BS, tile)
    block, scale = max/127 (1 for zero columns), round-and-store int8.
    One read of the bf16 slab instead of XLA's two (max pass + scale pass,
    measured 157 GB/s / 9.6 ms per flagship operand — this kernel ~1.5 ms)."""
    j = j_ref[0].astype(jnp.float32)
    m = jnp.max(jnp.abs(j), axis=0, keepdims=True)  # (1, tile)
    s = jnp.where(m > 0.0, m / 127.0, 1.0)
    q_ref[0] = jnp.round(j * (1.0 / s)).astype(jnp.int8)
    s_ref[0, 0] = s


def _make_quant_merge_kernel(merge: int, tile: int):
    """_quant_kernel over a (merge, BS, tile) input block, emitting ONE
    (BS, merge*tile) int8 block: adjacent D-slabs fuse into a wider output
    tile inside the quantizer itself (per-column scales are tile-width
    independent, so the values are bit-identical to merge=1). Each source
    slab writes its own static lane range — no in-kernel concatenate."""
    def kernel(j_ref, q_ref, s_ref):
        for i in range(merge):
            j = j_ref[i].astype(jnp.float32)
            m = jnp.max(jnp.abs(j), axis=0, keepdims=True)  # (1, tile)
            s = jnp.where(m > 0.0, m / 127.0, 1.0)
            q_ref[0, :, i * tile:(i + 1) * tile] = (
                jnp.round(j * (1.0 / s)).astype(jnp.int8))
            s_ref[0, 0, :, i * tile:(i + 1) * tile] = s
    return kernel


def quantize_tiled(Jt: jax.Array, block: int, interpret: bool = False,
                   merge: int = 1):
    """Absmax int8 quantization of a PRE-TILED (n, rows, tile) operand.

    Returns (Q, s): Q (n/merge, Bp, merge*tile) int8 with rows zero-padded
    up to a multiple of the quantization block, s (n/merge, nb, merge*tile)
    f32 per-column scales with nb = Bp / qblock. The quantization block is
    the Gram kernel's sample block (so the kernel can rescale each block's
    exact int32 partial with its own scales before accumulating — scales
    stay factorable out of the in-block reduction) or, for short chunks,
    rows rounded up to the int8 sublane granularity (32).

    merge > 1 fuses that many ADJACENT D-slabs into one wider output tile
    at zero extra cost (the quantizer reads the same bytes either way;
    requires n % merge == 0). The int8 Gram kernel's slab traffic scales
    as D/tile, so feeding it merge=2 tiles (1024-wide at the default plan)
    cuts its DMA ~2x while the shared bf16 layout (kmix / rhs / retile
    consumers) stays at the narrow tile — the wiring the tile-1024 probe
    (benchmarks/int8_tile1024_probe.py) left as follow-up. Scales are
    per-column, so merged quantization is bit-identical to merge=1.

    Scale granularity per (slab, block, column): finer than per-chunk
    columns at zero extra cost — the max is a per-block reduction either
    way — and it bounds the worst case to the block's own dynamic range.
    Zero columns quantize to q=0 with scale 1 (no 0/0).

    On TPU (or interpret=True) this runs as a single-pass Pallas kernel;
    the XLA fallback lowers the same math as two passes over Jt. The
    consumer (gram_pair_tiled_q) derives the block size from the shapes,
    so a quantizer block different from the Gram kernel's sample block
    still composes correctly."""
    n, rows, tile = Jt.shape
    if n % merge != 0:
        raise ValueError(f"merge {merge} must divide the slab count {n}")
    if merge > 1:
        CALLS["quant_merge"] += 1
    nm, tw = n // merge, merge * tile
    BS = block if rows >= block else ((rows + 31) // 32) * 32
    # VMEM clamp: triple-buffered input + int8 out + the kernel's f32
    # temp of the block (f32 inputs — the diag route's h*J — would
    # overflow the core at the bf16-planned 2048-row block); sized on the
    # merged output width (the input block carries the same bytes)
    isz = jnp.dtype(Jt.dtype).itemsize
    while BS > 256 and (3 * BS * tw * (isz + 1) + 4 * BS * tile
                        > VMEM_BUDGET):
        # round down to the int8 sublane granularity (32): for rows < block
        # BS starts at ceil32(rows) (e.g. 2016), and a plain halving would
        # yield a non-multiple of 32 that Mosaic can reject on hardware
        # (reachable only via the public API with f32 operands — the engine
        # always feeds bf16) — ADVICE r03.
        BS = max(256, (BS // 2) // 32 * 32)
    Bp = ((rows + BS - 1) // BS) * BS
    if Bp != rows:
        Jt = jnp.pad(Jt, ((0, 0), (0, Bp - rows), (0, 0)))
    nb = Bp // BS
    if _on_tpu() or interpret:
        # scales carry a trailing singleton so the (1, tile) block obeys
        # Mosaic's minor-dims rule ((1, 1, tile) blocks of an (n, nb, tile)
        # array do not: second-minor 1 != nb)
        kernel = (_quant_kernel if merge == 1
                  else _make_quant_merge_kernel(merge, tile))
        q, s = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((nm, Bp, tw), jnp.int8),
                       jax.ShapeDtypeStruct((nm, nb, 1, tw), jnp.float32)),
            grid=(nm, nb),
            in_specs=[pl.BlockSpec((merge, BS, tile),
                                   lambda i, b: (i, b, 0))],
            out_specs=(pl.BlockSpec((1, BS, tw), lambda i, b: (i, b, 0)),
                       pl.BlockSpec((1, 1, 1, tw),
                                    lambda i, b: (i, b, 0, 0))),
            interpret=interpret,
        )(Jt)
        return q, s.reshape(nm, nb, tw)
    if merge > 1:  # (n, Bp, tile) -> (nm, Bp, tw), adjacent slabs adjacent
        Jt = jnp.transpose(Jt.reshape(nm, merge, Bp, tile),
                           (0, 2, 1, 3)).reshape(nm, Bp, tw)
    J4 = Jt.reshape(nm, nb, BS, tw).astype(jnp.float32)
    m = jnp.max(jnp.abs(J4), axis=2)  # (nm, nb, tw)
    s = jnp.where(m > 0, m / 127.0, 1.0)
    q = jnp.round(J4 * (1.0 / s)[:, :, None, :]).astype(jnp.int8)
    return q.reshape(nm, Bp, tw), s


def _pair_kernel_tiled_q(s1_ref, s2_ref, j1_ref, j2_ref, out_ref):
    """_pair_kernel_tiled on int8 slabs: exact int32 MXU dot, then the
    block's f32 rescale (outer product of the two operands' per-column
    scales) fused before the f32 accumulation. The transpose+natural dot
    is the fast int8 lowering too (benchmarks/int8_probe.py)."""
    t = jax.lax.dot_general(
        j1_ref[0].T, j2_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        # explicit DEFAULT: Mosaic rejects the package-global HIGHEST
        # (contract_precision<fp32>) for non-f32 operands ("Bad lhs type")
        precision=jax.lax.Precision.DEFAULT)
    tf = t.astype(jnp.float32) * (s1_ref[0, 0] * s2_ref[0, 0])

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = tf

    @pl.when(pl.program_id(2) != 0)
    def _():
        out_ref[:] = out_ref[:] + tf


def _make_pair_kernel_tiled_q_acc(n: int):
    """_pair_kernel_tiled_q with an in-kernel chunk accumulator (see
    _make_pair_kernel_tiled_acc for the duplicate-round bookkeeping)."""
    def kernel(a_ref, s1_ref, s2_ref, j1_ref, j2_ref, out_ref):
        t = jax.lax.dot_general(
            j1_ref[0].T, j2_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT)
        tf = t.astype(jnp.float32) * (s1_ref[0, 0] * s2_ref[0, 0])
        add_acc = _acc_first_visit(n)

        @pl.when(pl.program_id(2) == 0)
        def _():
            out_ref[:] = tf + jnp.where(add_acc, a_ref[:],
                                        jnp.zeros_like(a_ref))

        @pl.when(pl.program_id(2) != 0)
        def _():
            out_ref[:] = out_ref[:] + tf
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "mirror", "group"))
def _gram_pair_tiled_q_jit(Q1: jax.Array, s1: jax.Array, Q2: jax.Array,
                           s2: jax.Array, acc=None, interpret: bool = False,
                           tile: int = 512, mirror: bool = False,
                           group: int = 1):
    """gram_pair_tiled over int8-quantized operands from quantize_tiled.

    A[d, e] = sum_b s1[b, d] s2[b, e] (Q1_bᵀ Q2_b) — each sample block's
    int8 dot is EXACT in int32 (max |q|=127: 127² · 2048 rows ≈ 3.3e7,
    far under 2³¹), so the only approximation is the operand rounding.
    The per-block rescale costs tile² VPU FMAs per visit (~0.1% of the
    dot). Output is f32, raw-upper like the other packed kernels."""
    n, Bp = Q1.shape[0], Q1.shape[1]
    nb = s1.shape[1]
    BS = Bp // nb
    Dp = n * tile
    s1c = s1[..., None]       # (n, nb, tile, 1): (tile, 1) column factor
    s2r = s2[:, :, None, :]   # (n, nb, 1, tile): (1, tile) row factor
    kernel = _pair_kernel_tiled_q
    grid = (_packed_nk(n), n, nb)
    out_spec = pl.BlockSpec((tile, tile), lambda k, i, b: _pq(k, i, n))
    in_specs = [
        pl.BlockSpec((1, 1, tile, 1),
                     lambda k, i, b: (_pq(k, i, n)[0], b, 0, 0)),
        pl.BlockSpec((1, 1, 1, tile),
                     lambda k, i, b: (_pq(k, i, n)[1], b, 0, 0)),
        pl.BlockSpec((1, BS, tile), lambda k, i, b: (_pq(k, i, n)[0], b, 0)),
        pl.BlockSpec((1, BS, tile), lambda k, i, b: (_pq(k, i, n)[1], b, 0)),
    ]
    if acc is not None:
        # in-kernel chunk accumulation (the int8 counterpart of the bf16
        # acc kernels): the (Dp, Dp) f32 carry streams in per (k, i) upper
        # tile and is added on the first sample-block visit — replaces the
        # caller's separate add_packed_upper pass over the raw carry.
        # Ungrouped only (callers route through _effective_group).
        A = pl.pallas_call(
            _make_pair_kernel_tiled_q_acc(n),
            out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
            grid=grid,
            in_specs=[pl.BlockSpec((tile, tile),
                                   lambda k, i, b: _pq(k, i, n))] + in_specs,
            out_specs=out_spec,
            interpret=interpret,
        )(acc, s1c, s2r, Q1, Q2)
        if mirror:
            A = jnp.triu(A) + jnp.triu(A, 1).T
        return A
    if group > 1:
        G = group
        ng = n // G
        bs = _clamp_group_bs(G, tile, BS, 1)
        if bs is not None:  # None: no fitting sub-block — stay ungrouped
            if BS % bs:
                raise ValueError(
                    f"grouped int8 sub-block {bs} must divide the "
                    f"quantization block {BS} (TNF_PALLAS_GROUP_BS "
                    f"misconfigured)")
            sub = BS // bs  # sub-blocks per quantization block
            in_specs = [
                pl.BlockSpec((G, 1, tile, 1),
                             lambda k, i, b, ng=ng, sub=sub:
                             (_pq(k, i, ng)[0], b // sub, 0, 0)),
                pl.BlockSpec((G, 1, 1, tile),
                             lambda k, i, b, ng=ng, sub=sub:
                             (_pq(k, i, ng)[1], b // sub, 0, 0)),
                pl.BlockSpec((G, bs, tile),
                             lambda k, i, b, ng=ng: (_pq(k, i, ng)[0], b, 0)),
                pl.BlockSpec((G, bs, tile),
                             lambda k, i, b, ng=ng: (_pq(k, i, ng)[1], b, 0)),
            ]
            kernel = _make_pair_kernel_tiled_q_g(G, tile)
            grid = (_packed_nk(ng), ng, Bp // bs)
            out_spec = pl.BlockSpec((G * tile, G * tile),
                                    lambda k, i, b, ng=ng: _pq(k, i, ng))
    A = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(s1c, s2r, Q1, Q2)
    if mirror:
        A = jnp.triu(A) + jnp.triu(A, 1).T
    return A


def _make_band_kernel_q(n: int):
    """Resident-band int8 pair kernel body (see gram_pair_band_q).

    Grid (i, k, blk): j1 is slab i's WHOLE row range for this call
    (constant across k and blk — Mosaic keeps it resident instead of
    re-fetching per pair, which is where the packed grid spends 2/3 of its
    HBM traffic); the kernel slices the current sample block out of it with
    pl.ds. Each (i, k) computes tile (i, (i+k) mod n) — for wrapped pairs
    that position is in the LOWER triangle; mirror_band reconstructs the
    symmetric A from the scattered-but-unique pair map. The even-n
    duplicate round (2k == n, i >= n/2) writes a zero tile so its position
    stays defined without double-counting. The chunk/rows-part carry
    streams in as a_ref (once per (i, k)) — chained calls replace the
    separate add_packed_upper pass entirely."""
    def kernel(a_ref, s1_ref, s2_ref, j1_ref, j2_ref, out_ref):
        i, k, blk = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        BS = j2_ref.shape[1]
        j1w = j1_ref[0, pl.ds(blk * BS, BS), :]
        t = jax.lax.dot_general(
            j1w.T, j2_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT)
        tf = t.astype(jnp.float32) * (s1_ref[0, 0] * s2_ref[0, 0])
        dup = jnp.logical_and(n % 2 == 0,
                              jnp.logical_and(2 * k == n, i >= n // 2))
        tf = jnp.where(dup, jnp.zeros_like(tf), tf)

        @pl.when(blk == 0)
        def _():
            out_ref[:] = tf + a_ref[:]

        @pl.when(blk != 0)
        def _():
            out_ref[:] = out_ref[:] + tf
    return kernel


def _band_pos(k, i, n: int):
    """Band pair-map position: (i, (i+k) mod n) — j1's tile is always the
    ROW side (no in-kernel transpose), so wrapped pairs land in the lower
    triangle. Each unordered pair appears exactly once (plus the defined
    zero tiles of the even-n duplicate round)."""
    return i, jax.lax.rem(i + k, n)


def band_parts(nb: int, HB_max_blocks: int = None):
    """Split nb quantization blocks into row parts of <= HB_max_blocks
    blocks each (the resident j1 slab is part_blocks * qblock rows —
    3 x 2048 x 512 int8 = 3.1 MB next to the streamed operand and the
    out/acc tiles; TNF_PALLAS_BAND_HB shrinks it if Mosaic's VMEM
    accounting rejects the compile). Every part must start on a multiple
    of its own size (the (1, HR, tile) BlockSpec indexes in HR units), so
    a ragged tail falls back to 1-block parts when misaligned."""
    if HB_max_blocks is None:
        HB_max_blocks = int(os.environ.get("TNF_PALLAS_BAND_HB", "3"))
    parts = []
    start = 0
    while start < nb:
        size = min(HB_max_blocks, nb - start)
        while size > 1 and start % size:
            size -= 1
        parts.append((start, size))
        start += size
    return parts


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _gram_pair_band_q_jit(Q1, s1, Q2, s2, acc, interpret=False, tile=512):
    """Chained resident-band calls over row parts; returns the UPDATED
    band-layout carry (acc + this chunk, positions per _band_pos)."""
    n, Bp = Q1.shape[0], Q1.shape[1]
    nb = s1.shape[1]
    BS = Bp // nb
    Dp = n * tile
    s1c = s1[..., None]
    s2r = s2[:, :, None, :]
    out = acc
    for (b0, nblk) in band_parts(nb):
        HR = nblk * BS
        part = b0 // nblk  # aligned by band_parts' construction
        # the carry is ALIASED into the output: tiles outside the band map
        # keep their prior content — zeros from the caller's A0 — so
        # mirror_band needs no written-position mask, and the chain never
        # copies the (Dp, Dp) buffer. Aliasing + this grid is safe: every
        # out position is owned by exactly ONE (i, k) (the even-n
        # duplicate round's second visit writes its OWN position, with tf
        # zeroed — it reads only its own prior value, never a twin's
        # in-flight write; contrast the packed grid, whose duplicate
        # visits share a position and double-add under aliasing).
        out = pl.pallas_call(
            _make_band_kernel_q(n),
            out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
            grid=(n, _packed_nk(n), nblk),
            in_specs=[
                pl.BlockSpec((tile, tile),
                             lambda i, k, b: _band_pos(k, i, n)),
                pl.BlockSpec((1, 1, tile, 1),
                             lambda i, k, b, b0=b0: (i, b0 + b, 0, 0)),
                pl.BlockSpec((1, 1, 1, tile),
                             lambda i, k, b, b0=b0:
                             (jax.lax.rem(i + k, n), b0 + b, 0, 0)),
                pl.BlockSpec((1, HR, tile),
                             lambda i, k, b, part=part: (i, part, 0)),
                pl.BlockSpec((1, BS, tile),
                             lambda i, k, b, b0=b0:
                             (jax.lax.rem(i + k, n), b0 + b, 0)),
            ],
            out_specs=pl.BlockSpec((tile, tile),
                                   lambda i, k, b: _band_pos(k, i, n)),
            input_output_aliases={0: 0},
            interpret=interpret,
        )(out, s1c, s2r, Q1, Q2)
    return out


def gram_pair_band_q(Q1, s1, Q2, s2, acc, interpret=False, tile=512):
    """Band-scheduled int8 packed Gram with fused chunk accumulation.

    Same contract as gram_pair_tiled_q(acc=...) except the RESULT LAYOUT:
    pair tiles live at (i, (i+k) mod n) (_band_pos) instead of the upper
    triangle — reconstruct with mirror_band(A, n, tile) once per update.
    The resident j1 slab cuts the pair grid's operand traffic ~2x (the
    packed grid re-fetches BOTH slabs for every pair; here j1 loads once
    per row part) and the chained acc absorbs the add pass."""
    if Q1.shape != Q2.shape or s1.shape != s2.shape:
        raise ValueError(
            f"int8 Gram operands must share one quantization layout: "
            f"Q {Q1.shape} vs {Q2.shape}, scales {s1.shape} vs {s2.shape}")
    CALLS["gram_pair_q"] += 1
    return _gram_pair_band_q_jit(Q1, s1, Q2, s2, acc, interpret=interpret,
                                 tile=tile)


def mirror_band(A: jax.Array, n: int, tile: int) -> jax.Array:
    """Reconstruct the full symmetric A from a band-layout raw buffer.

    Each unordered pair {x, y} is stored exactly once at some position
    (x, y) or (y, x); every OTHER position holds an exact zero — the
    chained band calls alias the carry into the output, so tiles the grid
    never visits keep the caller's A0 zeros, and the even-n duplicate
    round writes explicit zero tiles. Hence
        A_sym = A + Aᵀ  everywhere except the diagonal tiles
    (k=0 tiles are the pair's single copy and would double), where A_sym
    = A. The diagonal-tile predicate is computed from iotas — no (Dp, Dp)
    mask constants."""
    Dp = A.shape[0]
    rt = jax.lax.broadcasted_iota(jnp.int32, (Dp, Dp), 0) // tile
    ct = jax.lax.broadcasted_iota(jnp.int32, (Dp, Dp), 1) // tile
    return jnp.where(rt == ct, A, A + A.T)


def gram_pair_tiled_q(Q1, s1, Q2, s2, interpret=False, tile=512,
                      mirror=False, acc=None):
    if Q1.shape != Q2.shape or s1.shape != s2.shape:
        # the kernel derives ONE sample-block size from s1 and indexes both
        # scale arrays with it — operands quantized with different blocks
        # (e.g. quantize_tiled's itemsize-dependent VMEM clamp on a bf16 /
        # f32 pair) would silently rescale with the wrong absmax
        raise ValueError(
            f"int8 Gram operands must share one quantization layout: "
            f"Q {Q1.shape} vs {Q2.shape}, scales {s1.shape} vs {s2.shape}")
    CALLS["gram_pair_q"] += 1
    return _gram_pair_tiled_q_jit(Q1, s1, Q2, s2, acc=acc,
                                  interpret=interpret,
                                  tile=tile, mirror=mirror,
                                  group=_effective_group(Q1.shape[0], 1, acc))


def _make_own_out_kernel():
    def kernel(h_ref, j1_ref, j2_ref, out_ref):
        w = h_ref[0]  # (BS, 1) — H[s, p, q] for this grid point's class pair
        jw = (j1_ref[0] * w).astype(j1_ref.dtype)
        t = _gram_dot(jw, j2_ref[0])

        @pl.when(pl.program_id(4) == 0)
        def _():
            out_ref[0, 0] = t

        @pl.when(pl.program_id(4) != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + t
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("C", "interpret", "tile", "block"))
def _own_out_gram_jit(Jt: jax.Array, H: jax.Array, C: int,
                      interpret: bool = False, tile: int = 512,
                      block: int = 2048) -> jax.Array:
    """Output-owning-node Gram: A[c,d,c',d'] = Σ_s H[s,c,c'] J[s,d] J[s,d'].

    Jt: PRE-TILED (nd, S, tile) Jacobian slabs (no output axes — the node
    owns them all); H: (S, C, C) per-sample Hessian, symmetric per sample
    (Bregman/Gauss-Newton contract). Returns RAW (C, C, Dp, Dp) f32 with
    class-pair blocks c <= c' valid and the strictly-lower pairs UNDEFINED
    — A[c',.,c,.] = A[c,.,c',.]ᵀ(d↔d'), so the caller mirrors with one
    transpose(1,0,3,2) + where.

    vs the structured K=H*J + dot path (engine.gram_and_rhs): the H
    weighting is fused into the kernel load (no (S, C², DJ) K4 ever hits
    HBM) and only C(C+1)/2 of the C² class blocks are computed — the
    round-robin class-pair map is the same trick as the packed syrk grid.
    Even C: the duplicate distance-C/2 visits recompute the same block
    (b==0 resets), costing ~1/C redundancy, no masking."""
    # (counter bumped in the public wrapper: a global jit-cache hit
    # skips this body, so a trace-time counter here under-counts)
    nd, S = Jt.shape[0], Jt.shape[1]
    BS = min(S, block)
    Jt, Sp = _pad_rows3(Jt, BS)
    # H as (C*C, Sp, 1): the class-pair index leads so the (1, BS, 1)
    # block obeys Mosaic's minor-dims tiling rule ((BS, 1) blocks of an
    # (S, C*C) layout do not)
    H2 = jnp.transpose(H.reshape(S, C * C)).astype(jnp.float32)
    if Sp != S:
        H2 = jnp.pad(H2, ((0, 0), (0, Sp - S)))
    H2 = H2[:, :, None]
    Dp = nd * tile
    kk = C // 2 + 1

    def _hidx(k, c, i, j, b):
        p, q = _pq(k, c, C)
        return (p * C + q, b, 0)

    A = pl.pallas_call(
        _make_own_out_kernel(),
        out_shape=jax.ShapeDtypeStruct((C, C, Dp, Dp), jnp.float32),
        grid=(kk, C, nd, nd, Sp // BS),
        in_specs=[
            pl.BlockSpec((1, BS, 1), _hidx),
            pl.BlockSpec((1, BS, tile), lambda k, c, i, j, b: (i, b, 0)),
            pl.BlockSpec((1, BS, tile), lambda k, c, i, j, b: (j, b, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile, tile),
            lambda k, c, i, j, b: (*_pq(k, c, C), i, j)),
        interpret=interpret,
    )(H2, Jt, Jt)
    return A


def mirror_own_out(A4: jax.Array) -> jax.Array:
    """Fill the strictly-lower class-pair blocks of a raw own_out_gram
    output: A[c',.,c,.] = A[c,.,c',.] with the d axes swapped."""
    C = A4.shape[0]
    iu = (jnp.arange(C)[:, None] <= jnp.arange(C)[None, :])
    return jnp.where(iu[:, :, None, None], A4,
                     jnp.transpose(A4, (1, 0, 3, 2)))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "block", "mirror",
                                    "group"))
def _weighted_gram_tiled_jit(Jt: jax.Array, h: jax.Array,
                             interpret: bool = False,
                             tile: int = 512, block: int = 2048,
                             mirror: bool = False, acc=None,
                             group: int = 1) -> jax.Array:
    """weighted_gram over a PRE-TILED (n, rows, tile) operand. h: (rows,).

    acc: optional in-kernel chunk accumulator — see gram_pair_tiled."""
    # (counter bumped in the public wrapper: a global jit-cache hit
    # skips this body, so a trace-time counter here under-counts)
    n = Jt.shape[0]
    B = Jt.shape[1]
    BS = min(B, block)
    Jt, Bp = _pad_rows3(Jt, BS)
    h2 = jnp.pad(h, (0, Bp - B)).reshape(Bp, 1).astype(jnp.float32)
    Dp = n * tile
    operands = [h2, Jt, Jt]
    in_specs = [
        pl.BlockSpec((BS, 1), lambda k, i, b: (b, 0)),
        pl.BlockSpec((1, BS, tile), lambda k, i, b: (_pq(k, i, n)[0], b, 0)),
        pl.BlockSpec((1, BS, tile), lambda k, i, b: (_pq(k, i, n)[1], b, 0)),
    ]
    kernel = _weighted_kernel_tiled
    grid = (_packed_nk(n), n, Bp // BS)
    out_spec = pl.BlockSpec((tile, tile), lambda k, i, b: _pq(k, i, n))
    if acc is not None:
        assert not mirror, "acc accumulates raw; mirror once after the scan"
        operands = [acc] + operands
        in_specs = [pl.BlockSpec((tile, tile),
                                 lambda k, i, b: _pq(k, i, n))] + in_specs
        kernel = _make_weighted_kernel_tiled_acc(n)
    elif group > 1:
        G = group
        ng = n // G
        bs = _clamp_group_bs(G, tile, BS, Jt.dtype.itemsize)
        if bs is not None:  # None: no fitting sub-block — stay ungrouped
            if Bp % bs:
                Jt, Bp = _pad_rows3(Jt, bs)
                h2 = jnp.pad(h, (0, Bp - h.shape[0])).reshape(
                    Bp, 1).astype(jnp.float32)
            operands = [h2, Jt, Jt]
            in_specs = [
                pl.BlockSpec((bs, 1), lambda k, i, b: (b, 0)),
                pl.BlockSpec((G, bs, tile),
                             lambda k, i, b, ng=ng: (_pq(k, i, ng)[0], b, 0)),
                pl.BlockSpec((G, bs, tile),
                             lambda k, i, b, ng=ng: (_pq(k, i, ng)[1], b, 0)),
            ]
            kernel = _make_weighted_kernel_tiled_g(G, tile)
            grid = (_packed_nk(ng), ng, Bp // bs)
            out_spec = pl.BlockSpec((G * tile, G * tile),
                                    lambda k, i, b, ng=ng: _pq(k, i, ng))
    A = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(*operands)
    if mirror:
        A = jnp.triu(A) + jnp.triu(A, 1).T
    return A


def _add_kernel(tab_ref, a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] + b_ref[...]


@functools.lru_cache(maxsize=None)
def _pair_table(n: int):
    """Exact upper-triangle tile-pair list — the (k, i) round-robin map
    with even-n's duplicate distance-n/2 visits REMOVED (n(n+1)/2 rows)."""
    pairs = []
    for k in range(n // 2 + 1):
        for i in range(n):
            if n % 2 == 0 and k == n // 2 and i >= n // 2:
                continue  # duplicate of pair (i - n//2, i)
            j = (i + k) % n
            pairs.append((min(i, j), max(i, j)))
    assert len(pairs) == n * (n + 1) // 2
    return np.asarray(pairs, np.int32)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _add_packed_upper_jit(Aacc: jax.Array, Anew: jax.Array,
                          tile: int = 512,
                          interpret: bool = False) -> jax.Array:
    """Aacc + Anew touching ONLY the packed grid's visited upper tiles.

    Both operands are raw packed-syrk outputs — (Dp, Dp) f32 with the
    upper-triangle tiles valid and the never-visited lower tiles undefined.
    XLA's full-matrix add spends half its ~5 ms/chunk (D=16,200, measured
    643 GB/s) on that undefined lower triangle; this kernel visits each
    upper tile pair exactly once, so the chunk-scan accumulation costs
    ~half the HBM traffic. The result stays raw — the caller's
    once-per-update mirror_gram only reads the upper triangle (the
    never-visited lower tiles keep Aacc's values via the aliasing).

    input_output_aliases folds the add into Aacc's buffer — without it,
    XLA copies the fresh output back into the scan carry slot every chunk
    (a full (Dp, Dp) pass, ~3.3 ms at the flagship — measured 7.37 vs
    7.70 s/epoch). Aliasing is only legal because the grid enumerates each
    pair EXACTLY once: the (k, i) round-robin grid visits even-n's
    distance-n/2 pairs twice, and under aliasing the second visit re-reads
    the tile the first already wrote back — a silent double-add on
    hardware that interpret mode (which copies buffers) cannot reproduce.
    That bug shipped briefly and was caught by the 10-seed digits
    replication (96.55 -> 91.98 % with spurious singulars); the exact
    pair table (scalar-prefetch index map) is the fix, verified on the
    v5e by a chained-add probe at even n."""
    Dp = Aacc.shape[0]
    n = Dp // tile
    if not _HAVE_PLTPU:  # pltpu-less jaxlib: duplicate-visiting grid,
        # NO aliasing (both visits then read the original Aacc — correct)
        spec2 = pl.BlockSpec((tile, tile), lambda k, i: _pq(k, i, n))
        return pl.pallas_call(
            lambda a_ref, b_ref, o_ref: _add_kernel(None, a_ref, b_ref,
                                                    o_ref),
            out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
            grid=(_packed_nk(n), n),
            in_specs=[spec2, spec2],
            out_specs=spec2,
            interpret=interpret,
        )(Aacc, Anew)
    tab = jnp.asarray(_pair_table(n))
    spec = pl.BlockSpec((tile, tile), lambda p, t: (t[p, 0], t[p, 1]))
    return pl.pallas_call(
        _add_kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(tab.shape[0],),
            in_specs=[spec, spec],
            out_specs=spec),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(tab, Aacc, Anew)


# Public entry points: thin non-jitted wrappers so the trace-time CALLS
# counters fire on EVERY enclosing trace — the jitted bodies above are
# skipped on a global jit-cache hit (same avals traced anywhere else in
# the process), which made counter-based routing tests order-dependent.
def weighted_gram(J, h, interpret=False, tile=None, block=None,
                  symmetric=True, mirror=True):
    CALLS["weighted_gram"] += 1
    return _weighted_gram_jit(J, h, interpret=interpret, tile=tile,
                              block=block, symmetric=symmetric,
                              mirror=mirror)


def gram_pair(J1, J2, interpret=False, tile=None, block=None,
              symmetric=False, mirror=True):
    CALLS["gram_pair"] += 1
    return _gram_pair_jit(J1, J2, interpret=interpret, tile=tile,
                          block=block, symmetric=symmetric, mirror=mirror)


def gram_pair_tiled(J1t, J2t, interpret=False, tile=512, block=2048,
                    mirror=False, acc=None):
    CALLS["gram_pair"] += 1
    return _gram_pair_tiled_jit(
        J1t, J2t, interpret=interpret, tile=tile, block=block, mirror=mirror,
        acc=acc,
        group=_effective_group(J1t.shape[0], J1t.dtype.itemsize, acc))


def own_out_gram(Jt, H, C, interpret=False, tile=512, block=2048):
    CALLS["weighted_gram"] += 1
    return _own_out_gram_jit(Jt, H, C, interpret=interpret, tile=tile,
                             block=block)


def weighted_gram_tiled(Jt, h, interpret=False, tile=512, block=2048,
                        mirror=False, acc=None):
    CALLS["weighted_gram"] += 1
    return _weighted_gram_tiled_jit(
        Jt, h, interpret=interpret, tile=tile, block=block, mirror=mirror,
        acc=acc,
        group=_effective_group(Jt.shape[0], Jt.dtype.itemsize, acc))


def add_packed_upper(Aacc, Anew, tile=512, interpret=False):
    CALLS["add_packed_upper"] += 1
    return _add_packed_upper_jit(Aacc, Anew, tile=tile, interpret=interpret)
