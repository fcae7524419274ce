"""Benchmark entry point (driver contract: prints ONE JSON line).

Metric: BN254 G1 MSM throughput per chip (BASELINE.json north-star metric),
measured on device-resident points/scalars (the steady-state shape of the
Groth16 prover hot loop, where proving-key points live on device).

vs_baseline: ratio against the host pure-Python bigint MSM measured on the
same machine (subsampled and extrapolated linearly) — the reference publishes
no numbers (BASELINE.md), so the self-measured host path is the anchor.
"""

import json
import os
import random
import sys
import time

N = 1 << int(os.environ.get("ZKSNAKE_BENCH_LOG2N", "20"))
HOST_SAMPLE = 1 << 10


def main():
    from zksnake_tpu.backend import config as _cfg

    _cfg.jax_available()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from zksnake_tpu.backend.field import FieldSpec
    from zksnake_tpu.backend.curve_ops import get_group_spec
    from zksnake_tpu.backend.msm import (
        _scalar_limbs,
        msm_device_raw,
        _Kernels,
    )
    from zksnake_tpu.curves import ec_bn254

    curve = ec_bn254._curve
    gs = get_group_spec(curve, 1)
    fr = FieldSpec.get(curve.r)
    rng = random.Random(0xBEEF)

    # --- build N device-resident points: G * k for small random k, via the
    # batched device kernel itself (avoids host bigint conversion of 2^N pts)
    base = [ec_bn254.g1() * (i + 1) for i in range(64)]
    P64 = gs.points_to_device(base)
    reps = N // 64
    P = jax.tree_util.tree_map(lambda t: jnp.tile(t, (1, reps)), P64)

    scalars = [rng.randrange(curve.r) for _ in range(N)]
    slimbs = jnp.asarray(_scalar_limbs(scalars, curve.r, fr.nl))

    # warm up / compile (first compile of the pallas-fused MSM is slow but
    # lands in the persistent cache; fall back to the jnp kernels if the
    # pallas path fails to build)
    try:
        res = msm_device_raw(gs, P, slimbs)
        jax.tree_util.tree_map(lambda t: t.block_until_ready(), res)
    except Exception:
        from zksnake_tpu.backend import pallas_field

        pallas_field._STATE["checked"] = True
        pallas_field._STATE["on_tpu"] = False
        from zksnake_tpu.backend.msm import _Kernels

        _Kernels._pip.clear()
        res = msm_device_raw(gs, P, slimbs)
        jax.tree_util.tree_map(lambda t: t.block_until_ready(), res)

    t0 = time.time()
    res = msm_device_raw(gs, P, slimbs)
    jax.tree_util.tree_map(lambda t: t.block_until_ready(), res)
    dt = time.time() - t0
    pts_per_s = N / dt

    # correctness spot-check against the host oracle on a subsample shape
    # (full result checked in tests; here we only sanity-check non-degeneracy)
    ok = not bool(gs.is_identity(res))

    # --- host bigint baseline (subsampled, linear extrapolation) ---
    from zksnake_tpu.backend.dispatch import _host_msm

    hpts = base * (HOST_SAMPLE // 64)
    hss = scalars[:HOST_SAMPLE]
    t0 = time.time()
    _host_msm(ec_bn254, hpts, hss)
    host_dt = time.time() - t0
    host_pts_per_s = HOST_SAMPLE / host_dt

    result = {
        "metric": f"BN254 G1 MSM points/s/chip (2^{N.bit_length()-1}, device-resident)",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / host_pts_per_s, 2),
        "detail": {
            "msm_seconds": round(dt, 4),
            "host_python_points_per_s": round(host_pts_per_s, 1),
            "nondegenerate": ok,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
