"""Pin the default test run to deterministic host paths.

A bare `python -m pytest tests/` must never touch the TPU: the shared chip's
session claim can stall a fresh process for minutes (see CLAUDE.md), and the
suite crosses device-dispatch thresholds (e.g. the Poseidon circuit's NTTs).
Unless the caller explicitly opts into device tests with ZKSNAKE_DEVICE_TESTS=1,
we force the host bigint paths and point any direct jax usage at the CPU
backend before anything imports jax or zksnake_tpu.backend.config.
"""

import os

if os.environ.get("ZKSNAKE_DEVICE_TESTS", "0") != "1":
    os.environ.setdefault("ZKSNAKE_TPU_DISABLE", "1")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
