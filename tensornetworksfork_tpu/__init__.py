"""tensornetworksfork_tpu — a TPU-native tensor-network learning framework.

A from-scratch JAX/XLA rebuild of the capabilities of
niccogc/TensorNetworksFork (tensor-train / CPD supervised learning via
DMRG-style Gauss-Newton sweeps), designed TPU-first: static topologies
compiled to einsum programs, on-device sweep updates, data-parallel sharding
over sample axes, and Pallas kernels for the matrix-free solver tier.
"""

__version__ = "0.1.0"

from .core.topology import Topology, TopologyBuilder, NodeSpec, PARAM, INPUT, CONST
from .core.engine import Network
from .core.sweep import SweepConfig, Sweeper, Member, accumulating_sweep
from .core import gauges, solve
from .ops import bregman
