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
    # --xla_cpu_max_isa pins the CPU codegen target to a lowest-common-
    # denominator ISA: the (timeshared, live-migrating) hosts rotate between
    # machines with differing AVX512/AMX feature sets, and cached AOT
    # executables compiled on one host sporadically SIGILL/SIGSEGV when a
    # long suite run migrates to another mid-run (observed r5: three full-
    # suite runs died in compilation_cache read/write/execute with jax's
    # "compiled on a different machine" warning; short runs passed).
    os.environ["XLA_FLAGS"] = (
        _flags
        + " --xla_force_host_platform_device_count=8"
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        + " --xla_cpu_max_isa=AVX2"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
# Persistent compilation cache for tests, in a dedicated directory (sharing
# /root/.cache/jax with TPU benchmark processes clobbered entries — r4) with
# the AVX2 ISA pin above making entries valid across VM migrations. Opt out
# with GUMBI_TPU_TEST_CACHE=0.
#
# KNOWN HOST HAZARD (r5, diagnosed): XLA:CPU sporadically SIGSEGVs/aborts
# while COMPILING or SERIALIZING the suite's largest programs (the vmapped /
# shard_map multi-restart fit executables) — but only deep into a
# long-running process; every per-file run passes (four consecutive full-
# suite runs died at ~90% inside backend_compile_and_load / the cache-write
# path, with cache on, off, and ISA-pinned alike, so the cache is not the
# cause). `python tools/run_tests.py` runs one short-lived pytest process
# per file — compiles stay reliable, the cache accumulates safely, crashed
# files retry once — and is the recommended entry point on this host;
# plain `pytest tests/` remains supported and is green whenever the
# environment cooperates.


if os.environ.get("GUMBI_TPU_TEST_CACHE", "1") != "0":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-tests-avx2")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("GUMBI_TPU_CACHE_DIR", os.environ.get("JAX_COMPILATION_CACHE_DIR", ""))

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
    # Front-load the files whose programs are the largest XLA:CPU compiles
    # (the vmapped / shard_map multi-restart fits). The sporadic host
    # compiler crash (see the cache comment above) only ever strikes those
    # programs DEEP into a long-running process — every fresh-process run
    # compiles them fine — so building them first, while the process is
    # young, keeps plain `pytest tests/` reliable. Tests are independent
    # (fixed seeds everywhere), so order carries no semantics.
    heavy = ("test_parity", "test_parallel", "test_extras", "test_regression_extra")

    def rank(item):
        for i, h in enumerate(heavy):
            if f"/{h}.py::" in item.nodeid or item.nodeid.startswith(f"{h}.py::"):
                return i
        return len(heavy)

    items.sort(key=rank)

    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="need --run-slow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
