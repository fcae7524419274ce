"""Benchmark entry point (driver contract: prints ONE JSON line).

Metric: BN254 G1 MSM throughput per chip (BASELINE.json north-star metric),
measured on device-resident points/scalars (the steady-state shape of the
Groth16 prover hot loop, where proving-key points live on device).

vs_baseline: ratio against the host pure-Python bigint MSM measured on the
same machine (subsampled and extrapolated linearly) — the reference publishes
no numbers (BASELINE.md), so the self-measured host path is the anchor.

Each measurement attempt runs in its OWN subprocess: a TPU kernel/compile
failure poisons the device session for the rest of that process, so degraded
retries must start clean. Attempts degrade (pallas, 2^20) -> (no-pallas,
2^20) -> smaller sizes; a host-only line is the last resort.
"""

import json
import os
import random
import subprocess
import sys
import time

LOG2N = int(os.environ.get("ZKSNAKE_BENCH_LOG2N", "20"))
HOST_SAMPLE = 1 << 10


def _measure_msm(logn):
    import jax
    import jax.numpy as jnp
    from zksnake_tpu.backend import config as _cfg

    _cfg.jax_available()
    from zksnake_tpu.backend.field import FieldSpec
    from zksnake_tpu.backend.curve_ops import get_group_spec
    from zksnake_tpu.backend.msm import _scalar_limbs, msm_device_raw
    from zksnake_tpu.curves import ec_bn254

    curve = ec_bn254._curve
    gs = get_group_spec(curve, 1)
    fr = FieldSpec.get(curve.r)
    rng = random.Random(0xBEEF)

    N = 1 << logn
    base = [ec_bn254.g1() * (i + 1) for i in range(64)]
    P64 = gs.points_to_device(base)
    P = jax.tree_util.tree_map(lambda t: jnp.tile(t, (1, N // 64)), P64)
    scalars = [rng.randrange(curve.r) for _ in range(N)]
    slimbs = jnp.asarray(_scalar_limbs(scalars, curve.r, fr.nl))

    res = msm_device_raw(gs, P, slimbs)  # compile + warm
    jax.tree_util.tree_map(lambda t: t.block_until_ready(), res)

    t0 = time.time()
    res = msm_device_raw(gs, P, slimbs)
    jax.tree_util.tree_map(lambda t: t.block_until_ready(), res)
    dt = time.time() - t0
    nondegenerate = not bool(gs.is_identity(res))
    return N / dt, dt, nondegenerate


def _attempt_main(logn):
    pts_per_s, dt, ok = _measure_msm(logn)
    print(
        "@@RESULT@@"
        + json.dumps({"pts_per_s": pts_per_s, "dt": dt, "nondegenerate": ok})
    )


def main():
    # host bigint anchor (always available; no jax involvement)
    from zksnake_tpu.curves import ec_bn254
    from zksnake_tpu.backend.dispatch import _host_msm

    rng = random.Random(0xBEEF)
    base = [ec_bn254.g1() * (i + 1) for i in range(64)]
    hpts = base * (HOST_SAMPLE // 64)
    hss = [rng.randrange(ec_bn254._curve.r) for _ in range(HOST_SAMPLE)]
    t0 = time.time()
    _host_msm(ec_bn254, hpts, hss)
    host_pts_per_s = HOST_SAMPLE / (time.time() - t0)

    attempts = [
        (LOG2N, False),
        (LOG2N, True),
        (LOG2N - 2, True),
        (LOG2N - 4, True),
    ]
    value = None
    last_err = ""
    for logn, no_pallas in attempts:
        env = dict(os.environ)
        if no_pallas:
            env["ZKSNAKE_NO_PALLAS"] = "1"
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__), "--attempt", str(logn)],
                capture_output=True,
                text=True,
                timeout=3000,
                env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            out = [l for l in proc.stdout.splitlines() if l.startswith("@@RESULT@@")]
            if proc.returncode != 0 or not out:
                last_err = (proc.stderr or proc.stdout)[-300:]
                continue
            r = json.loads(out[-1][len("@@RESULT@@") :])
            value = {
                "metric": f"BN254 G1 MSM points/s/chip (2^{logn}, device-resident)",
                "value": round(r["pts_per_s"], 1),
                "unit": "points/s",
                "vs_baseline": round(r["pts_per_s"] / host_pts_per_s, 2),
                "detail": {
                    "msm_seconds": round(r["dt"], 4),
                    "pallas": not no_pallas,
                    "host_python_points_per_s": round(host_pts_per_s, 1),
                    "nondegenerate": r["nondegenerate"],
                },
            }
            break
        except Exception as e:
            last_err = repr(e)[:300]
            continue

    if value is None:
        value = {
            "metric": "BN254 G1 MSM points/s/chip (host fallback)",
            "value": round(host_pts_per_s, 1),
            "unit": "points/s",
            "vs_baseline": 1.0,
            "detail": {"error": last_err},
        }
    print(json.dumps(value))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--attempt":
        _attempt_main(int(sys.argv[2]))
    else:
        main()
