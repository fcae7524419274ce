"""Montgomery-multiply microbenchmark: jnp (XLA) vs Pallas-CIOS (VPU) vs
Pallas-MXU (SOS with matmul reduction) at a large flat batch.

Each variant runs in its own subprocess (a TPU kernel/compile failure poisons
the process's device session — see CLAUDE.md), and timing uses a device->host
pull as the fence (block_until_ready does not block through the axon relay).

Usage:  python scripts/bench_montmul.py [log2n]      # orchestrates all
        python scripts/bench_montmul.py --variant jnp|pallas|mxu <log2n>
"""

import json
import os
import random
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
P_BN254_FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def _measure(variant, logn):
    import numpy as np
    import jax.numpy as jnp
    from zksnake_tpu.backend import config as _cfg

    _cfg.jax_available()
    from zksnake_tpu.backend.field import FieldSpec, mont_mul
    from zksnake_tpu.backend import pallas_field

    fs = FieldSpec.get(P_BN254_FQ)
    rng = random.Random(11)
    n = 1 << logn
    base = [rng.randrange(fs.p) for _ in range(1 << 12)]
    xs = jnp.asarray(fs.to_mont_host(base))
    a = jnp.tile(xs, (1, n >> 12))
    b = jnp.roll(a, 1, axis=1)

    if variant == "jnp":
        os.environ["ZKSNAKE_NO_PALLAS"] = "1"
        fn = lambda: mont_mul(fs, a, b)
    elif variant == "pallas":
        fn = lambda: pallas_field.mont_mul_pallas(fs, a, b, variant="cios")
    elif variant == "mxu":
        fn = lambda: pallas_field.mont_mul_pallas(fs, a, b, variant="mxu")
    else:
        raise ValueError(variant)

    out = fn()
    np.asarray(out[:, :1])  # compile + warm; device->host fence
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(out[:, :1])
    dt = (time.time() - t0) / reps

    # oracle on a subsample
    got = fs.from_mont_host(np.asarray(out[:, : 1 << 8]))
    av = fs.from_mont_host(np.asarray(a[:, : 1 << 8]))
    bv = fs.from_mont_host(np.asarray(b[:, : 1 << 8]))
    assert got == [x * y % fs.p for x, y in zip(av, bv)], "oracle mismatch"
    return {"variant": variant, "log2n": logn, "s": dt, "mulps": n / dt}


def main(logn):
    results = {}
    for variant in ("jnp", "pallas", "mxu"):
        env = dict(os.environ)
        # repo on the path, axon plugin site KEPT (required for the TPU)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [
                sys.executable,
                "-u",
                os.path.abspath(__file__),
                "--variant",
                variant,
                str(logn),
            ],
            capture_output=True,
            text=True,
            timeout=3300,
            cwd=REPO,
            env=env,
        )
        out = [l for l in proc.stdout.splitlines() if l.startswith("@@R@@")]
        if proc.returncode == 0 and out:
            results[variant] = json.loads(out[-1][5:])
        else:
            results[variant] = {"error": (proc.stderr or proc.stdout)[-400:]}
        print(variant, "->", json.dumps(results[variant]))
    print(json.dumps(results))


if __name__ == "__main__":
    if sys.argv[1] == "--variant":
        print("@@R@@" + json.dumps(_measure(sys.argv[2], int(sys.argv[3]))))
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
