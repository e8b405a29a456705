"""tensornetworksfork_tpu — a TPU-native tensor-network learning framework.

A from-scratch JAX/XLA rebuild of the capabilities of
niccogc/TensorNetworksFork (tensor-train / CPD supervised learning via
DMRG-style Gauss-Newton sweeps), designed TPU-first: static topologies
compiled to einsum programs, on-device sweep updates, data-parallel sharding
over sample axes, and Pallas kernels for the matrix-free solver tier.
"""

__version__ = "0.1.0"

import jax as _jax

# The reference runs float64 (torch.set_default_dtype in nearly every script);
# TPUs have no fast f64, so this framework runs f32 end-to-end and relies on
# full-precision f32 matmuls (3-pass bf16 on the MXU) to keep the Gauss-Newton
# systems well resolved. Hot-path einsums request HIGHEST explicitly; this
# global default protects every auxiliary matmul (QR pushes, losses, ...).
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: a sweep compiles one program per
# (node, direction) and TPU compiles are expensive; cache unless disabled.
import os as _os

if _os.environ.get("TNF_NO_COMPILE_CACHE", "0") != "1":
    _cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "tnf_jax"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .core.topology import Topology, TopologyBuilder, NodeSpec, PARAM, INPUT, CONST
from .core.engine import Network
from .core.sweep import SweepConfig, Sweeper, Member, accumulating_sweep
from .core import gauges, solve
from .ops import bregman
