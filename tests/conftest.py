"""Pin the default test run to deterministic host paths.

A bare `python -m pytest tests/` must never touch the TPU: the shared chip's
session claim can stall a fresh process for minutes (see CLAUDE.md), and the
suite crosses device-dispatch thresholds (e.g. the Poseidon circuit's NTTs).
Unless the caller explicitly opts into device tests with ZKSNAKE_DEVICE_TESTS=1,
we force the host bigint paths and point any direct jax usage at the CPU
backend before anything imports jax or zksnake_tpu.backend.config.
"""

import os

# IMPORTANT: on this machine a sitecustomize (PYTHONPATH=/root/.axon_site)
# imports jax at interpreter start — BEFORE this conftest — so jax's
# env-var-backed config options (JAX_PLATFORMS, JAX_COMPILATION_CACHE_DIR)
# are already snapshotted and os.environ edits here are ignored. We must go
# through jax.config.update(), which still works any time before backend
# initialization.

# 8 virtual CPU devices for the mesh/sharding tests (XLA_FLAGS is read
# directly by XLA at backend creation, so the env route works for it).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# CPU compile flags (AVX2 ISA cap so persistent-cache entries actually
# replay + legacy emitters so the big u64-montmul modules compile in
# minutes, not hours — config.CPU_XLA_FLAGS has the full story). config
# does not import jax at module level, so this is safe pre-jax.
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from zksnake_tpu.backend.config import ensure_cpu_xla_flags as _ecf

_ecf()

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

try:
    import jax

    # Persistent compile cache: montmul-bearing graphs take minutes to
    # compile on this 2-CPU box, seconds to replay.
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if os.environ.get("ZKSNAKE_DEVICE_TESTS", "0") != "1":
        # HARD pin to CPU: the ambient environment presets JAX_PLATFORMS=axon
        # (the TPU relay), and a default suite that touches jax would
        # otherwise claim the shared TPU and stall for minutes (round-1
        # review: "default pytest run hangs on the device").
        jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - jax genuinely unavailable
    pass

if os.environ.get("ZKSNAKE_DEVICE_TESTS", "0") != "1":
    os.environ.setdefault("ZKSNAKE_TPU_DISABLE", "1")
    os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses spawned by tests

# Purge a stale-FORMAT persistent cache BEFORE any compile reads it
# (entries written before the AVX2 ISA cap load + warn + recompile; see
# backend/config.py::check_cache_fingerprint).
try:
    from zksnake_tpu.backend.config import check_cache_fingerprint

    check_cache_fingerprint(os.path.join(_repo, ".jax_cache"))
except Exception:  # pragma: no cover
    pass
