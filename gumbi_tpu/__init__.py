"""Gumbi-TPU: TPU-native Gaussian Process Model Building Interface.

A from-scratch JAX/XLA/Pallas rebuild of the Gumbi GP interface: tabular data
in, fitted Gaussian-Process surfaces out, with unit-aware uncertain arrays for
prediction and plotting. The regression core is a pure-JAX GP engine (kernels,
marginal likelihood, vmapped multi-restart L-BFGS, batched posteriors) that
jits to TPU and shards over device meshes.
"""

import os

import jax as _jax

# GP hyperparameter optimization and N×N Cholesky factorizations want float64
# on host / parity paths. Opt out with GUMBI_TPU_X64=0 (e.g. for pure-bf16
# TPU serving); the engine controls per-array dtypes explicitly either way.
if os.environ.get("GUMBI_TPU_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the engine's jitted programs (multi-restart
# L-BFGS, Kronecker MLL, posterior caches) take minutes to compile cold on
# TPU; caching them makes every process after the first start warm. The
# JAX_COMPILATION_CACHE_DIR *env var* is not read by this toolchain — only
# the config API enables the cache — so wire it here. Defers to any cache
# dir an embedding application configured before import; opt out entirely
# with GUMBI_TPU_CACHE_DIR="".
_cache_dir = os.environ.get("GUMBI_TPU_CACHE_DIR")
if _cache_dir is None and getattr(_jax.config, "jax_compilation_cache_dir", None) is None:
    _cache_dir = os.path.expanduser("~/.cache/jax")
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)

# TPU matmuls default to bf16 passes, which makes N×N RBF Grams indefinite
# (squared-distance errors ~1e-2 → Cholesky failure). GP linear algebra needs
# true f32: default every matmul to HIGHEST precision. Hot kernels that can
# tolerate less opt in explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import data, style, utils  # noqa: E402
from .aggregation import *  # noqa: F401,F403,E402
from .arrays import *  # noqa: F401,F403,E402
from .array_utils import *  # noqa: F401,F403,E402
from .plotting import *  # noqa: F401,F403,E402
from .models import *  # noqa: F401,F403,E402
from .versions import __version__  # noqa: F401,E402

# Aliases
parray = ParameterArray  # noqa: F405
uarray = UncertainArray  # noqa: F405
uparray = UncertainParameterArray  # noqa: F405
mvuparray = MVUncertainParameterArray  # noqa: F405

del os  # keep the config-time import out of the public namespace
