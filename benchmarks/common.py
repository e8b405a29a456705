"""Shared benchmark-script setup: repo-root import path + the persistent
XLA compile cache (absolute — a relative path would silently recompile
every flagship program through the slow TPU tunnel when run from another
cwd)."""
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Benchmark configurations — the single source of truth shared by bench.py
# and the attribution tools. "full" is the reference headline MNIST config
# at full data scale (54k train split, BASELINE.md).
CONFIGS = {
    "full": dict(N=4, r=18, CB=8, P=50, pp=17, C=9, S=53248, batch=2048),
    "quick": dict(N=3, r=8, CB=4, P=50, pp=17, C=9, S=8192, batch=2048),
    "smoke": dict(N=2, r=4, CB=2, P=50, pp=17, C=9, S=2048, batch=512),
}


def setup(jax_cache: bool = True):
    if REPO_ROOT not in sys.path:
        sys.path.insert(0, REPO_ROOT)
    if jax_cache:
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              os.path.join(REPO_ROOT, ".jax_cache"))
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
