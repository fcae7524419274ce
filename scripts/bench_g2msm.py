"""BN254 G2 MSM profile (the one PERF.md lever still unmeasured).

G2 rides the exact same Pippenger/bucket machinery as G1 (reference treats
them identically: /root/reference/src/bn254/curve.rs:375-392) but with Fq2
limbs — double the VMEM per lane, so the bucket kernel's lane cap halves and
msm_pippenger clamps the window size c to fit (backend/msm.py::_lane_cap).
This script measures wall-clock at a given size with the same device->host
pull fence and host oracle as bench.py's G1 headline.

Usage: python scripts/bench_g2msm.py [log2n]         # orchestrates (subprocess)
       python scripts/bench_g2msm.py --child <log2n>
"""

import json
import os
import random
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(logn):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from zksnake_tpu.backend import config as _cfg

    _cfg.jax_available()
    from zksnake_tpu.backend.field import FieldSpec
    from zksnake_tpu.backend.curve_ops import get_group_spec
    from zksnake_tpu.backend.msm import _scalar_limbs, msm_device_raw
    from zksnake_tpu.curves import ec_bn254

    curve = ec_bn254._curve
    gs = get_group_spec(curve, 2)
    fr = FieldSpec.get(curve.r)
    rng = random.Random(0x62)

    N = 1 << logn
    base = [ec_bn254.g2() * (i + 1) for i in range(64)]
    P64 = gs.points_to_device(base)
    P = jax.tree_util.tree_map(lambda t: jnp.tile(t, (1, N // 64)), P64)
    scalars = [rng.randrange(curve.r) for _ in range(N)]
    slimbs = jnp.asarray(_scalar_limbs(scalars, curve.r, fr.nl))

    def run_sync():
        r = msm_device_raw(gs, P, slimbs)
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])
        return r

    t0 = time.time()
    run_sync()  # compile + warm
    compile_s = time.time() - t0
    t0 = time.time()
    res = run_sync()
    dt = time.time() - t0

    total = 0
    for i, s in enumerate(scalars):
        total += s * (i % 64 + 1)
    want = ec_bn254.g2() * (total % curve.r)
    got = gs.points_from_device(
        jax.tree_util.tree_map(lambda t: t[..., None], res), ec_bn254.PointG2
    )[0]
    if got != want:
        raise AssertionError("device G2 MSM result does not match host oracle")
    print(
        json.dumps(
            {
                "group": "G2",
                "log2n": logn,
                "dt_s": round(dt, 4),
                "pts_per_s": round(N / dt, 1),
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]))
        return
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    # own subprocess: a TPU kernel/compile failure poisons the device session
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    rc = subprocess.call(
        [sys.executable, os.path.abspath(__file__), "--child", str(logn)],
        cwd=REPO,
        env=env,
        timeout=float(os.environ.get("ZKSNAKE_G2_BENCH_TIMEOUT_S", "3000")),
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
