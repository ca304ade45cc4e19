"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware, and enables float64 before JAX initializes.
"""

import os

# Hard override: the ambient environment may point JAX at a TPU tunnel
# (JAX_PLATFORMS=axon) and the axon plugin ignores the env var; unit tests
# always run on the virtual CPU mesh (see jax.config update below).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    # Raise the CPU collective rendezvous limits alongside: with 8 virtual
    # devices timesharing one host core, a slow participant can be >40 s
    # late to an all-reduce, and XLA's default hard-kills the process.
    os.environ["XLA_FLAGS"] = (
        _flags
        + " --xla_force_host_platform_device_count=8"
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
# Persistent compilation cache: the vmapped L-BFGS fit program is expensive to
# compile; cache it across test runs. The tests get their OWN cache directory:
# sharing /root/.cache/jax with TPU benchmark processes corrupted entries when
# both wrote concurrently (observed: segfault inside
# compilation_cache.get_executable_and_time deserializing a clobbered entry).
# The directory is further namespaced by a CPU-signature hash: the cache
# stores AOT-compiled host executables, and entries written by a DIFFERENT
# host CPU (these machines rotate between rounds) load fine but then execute
# illegal instructions — observed as sporadic mid-suite SIGSEGV/SIGILL with
# jax's own "compiled on a different machine" warning in the log.


def _cpu_cache_tag():
    import hashlib

    try:
        with open("/proc/cpuinfo") as fh:
            info = fh.read()
        sig = "|".join(
            sorted({ln for ln in info.splitlines() if ln.startswith(("model name", "flags"))})
        )
    except OSError:
        import platform

        sig = platform.processor() or platform.machine()
    return hashlib.sha256(sig.encode()).hexdigest()[:12]


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", f"/root/.cache/jax-tests-{_cpu_cache_tag()}")
os.environ.setdefault("GUMBI_TPU_CACHE_DIR", os.environ["JAX_COMPILATION_CACHE_DIR"])
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import matplotlib  # noqa: E402

matplotlib.use("Agg")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--run-slow", action="store_true", default=False, help="run slow tests")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: mark test as slow to run")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="need --run-slow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
