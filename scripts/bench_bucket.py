"""Decompose the Pippenger MSM wall-clock: bucket-accumulate kernel alone
(synthetic pre-gathered tables), gather production alone, and the jnp
weighted reduction alone — to find where the device time actually goes.

Usage: python scripts/bench_bucket.py [--stage kernel|gather|reduce|msmjnp] [B] [R]
Each stage in its own process (TPU failure poisoning); the orchestrator runs
all of them.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup(B):
    import random
    import numpy as np
    import jax
    import jax.numpy as jnp
    from zksnake_tpu.backend import config as _cfg

    _cfg.jax_available()
    from zksnake_tpu.backend.curve_ops import get_group_spec
    from zksnake_tpu.curves import ec_bn254

    gs = get_group_spec(ec_bn254._curve, 1)
    rng = random.Random(5)
    base = [ec_bn254.g1() * (i + 1) for i in range(64)]
    P64 = gs.points_to_device(base)
    reps = B // 64
    X = jnp.tile(P64[0], (1, reps))
    Y = jnp.tile(P64[1], (1, reps))
    return gs, X, Y


def _pull(x):
    """Timing fence: device->host pull of a few bytes. Slice on DEVICE before
    np.asarray — converting a whole leaf ships the entire buffer through the
    axon relay at ~36 MB/s and dominated every round-1 'slow op' number."""
    import numpy as np
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    idx = tuple(slice(0, 1) for _ in leaf.shape)
    np.asarray(leaf[idx])


def stage_kernel(B, R):
    """R rounds of masked mixed adds on B lanes — the pallas launch alone."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from zksnake_tpu.backend import pallas_field

    gs, X, Y = _setup(B)
    nl = gs.fs.nl
    # packed round-major synthetic table: same point replicated per round
    # (values don't matter for timing; validity exercises the select path)
    packed = [
        t[0::2] | (t[1::2] << 16)
        for t in jax.tree_util.tree_leaves((X, Y))
    ]
    table = jnp.broadcast_to(
        jnp.concatenate(packed, axis=0)[None],
        (R, len(packed) * (nl // 2), B),
    )
    valid = jnp.ones((R, B), jnp.int32)

    @jax.jit
    def run(table, valid):
        return pallas_field.bucket_accumulate_pallas(gs, table, valid, R, B)

    out = run(table, valid)
    _pull(out)
    t0 = time.time()
    out = run(table, valid)
    _pull(out)
    dt = time.time() - t0
    nmul = 13 * B * R
    return {"stage": "kernel", "B": B, "R": R, "s": dt, "montmul_per_s": nmul / dt}


def stage_gather(B, R):
    """The round-table gather production (jnp take_along_axis) alone."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    gs, X, Y = _setup(B)
    nl = gs.fs.nl
    n = 1 << 20
    Xn = jnp.tile(X, (1, n // B))
    Yn = jnp.tile(Y, (1, n // B))
    import random

    rng = random.Random(1)
    starts = jnp.asarray(
        np.sort(np.random.default_rng(0).integers(0, n - R, size=B)).astype(
            np.int32
        )
    )

    @jax.jit
    def run(Xn, Yn, starts):
        kcol = jnp.arange(R, dtype=jnp.int32)[:, None]
        pos = jnp.clip(starts[None, :] + kcol, 0, n - 1)  # (R, B)
        pos_flat = pos.reshape(-1)

        def gather(leaf):  # (nl, n) -> (R, nl, B)
            src = jnp.take(leaf, pos_flat, axis=1).reshape(nl, R, B)
            return jnp.transpose(src, (1, 0, 2))

        return [gather(Xn), gather(Yn)]

    out = run(Xn, Yn, starts)
    _pull(out)
    t0 = time.time()
    out = run(Xn, Yn, starts)
    _pull(out)
    dt = time.time() - t0
    nbytes = 2 * R * B * nl * 4
    return {
        "stage": "gather",
        "B": B,
        "R": R,
        "s": dt,
        "gb_per_s": nbytes / dt / 1e9,
    }


def stage_gather_rows(B, R):
    """Row-major gather: points as contiguous (2nl)-limb rows (128B for G1),
    gathered by point index, then one transpose to round-major limbs-first.
    Candidate replacement for the element-wise take_along_axis (53 MB/s)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    gs, X, Y = _setup(B)
    nl = gs.fs.nl
    n = 1 << 20
    Xn = jnp.tile(X, (1, n // B))
    Yn = jnp.tile(Y, (1, n // B))
    starts = jnp.asarray(
        np.sort(np.random.default_rng(0).integers(0, n - R, size=B)).astype(
            np.int32
        )
    )

    @jax.jit
    def run(Xn, Yn, starts):
        rows = jnp.concatenate([Xn, Yn], axis=0).T  # (n, 2nl) 128B rows
        kcol = jnp.arange(R, dtype=jnp.int32)[:, None]
        pos = jnp.clip(starts[None, :] + kcol, 0, n - 1).reshape(-1)
        g = jnp.take(rows, pos, axis=0)  # (R*B, 2nl) row gather
        g = g.reshape(R, B, 2 * nl)
        g = jnp.transpose(g, (0, 2, 1))  # (R, 2nl, B)
        return [g[:, :nl, :], g[:, nl:, :]]

    out = run(Xn, Yn, starts)
    _pull(out)
    t0 = time.time()
    out = run(Xn, Yn, starts)
    _pull(out)
    dt = time.time() - t0
    nbytes = 2 * R * B * nl * 4
    return {
        "stage": "gather_rows",
        "B": B,
        "R": R,
        "s": dt,
        "gb_per_s": nbytes / dt / 1e9,
    }


def stage_reduce(B, R):
    """The jnp weighted bucket reduction alone (suffix scan + tree)."""
    import jax
    import jax.numpy as jnp
    from zksnake_tpu.backend.msm import _tree_reduce

    gs, X, Y = _setup(B)

    @jax.jit
    def run(X, Y):
        import jax.numpy as jnp

        buckets = (X, Y, gs.fs.one_mont_dev((B,)))
        iota_b = jnp.arange(B, dtype=jnp.int32)
        c = 13

        def suffix_body(i, T):
            sh = 1 << i
            Q = jax.tree_util.tree_map(lambda t: jnp.roll(t, -sh, axis=-1), T)
            cand = gs.add(T, Q)
            return gs.select(iota_b < B - sh, cand, T)

        T = jax.lax.fori_loop(0, c - 1, suffix_body, buckets)
        return _tree_reduce(gs, T, B)

    out = run(X, Y)
    _pull(out)
    t0 = time.time()
    out = run(X, Y)
    _pull(out)
    return {"stage": "reduce", "B": B, "s": time.time() - t0}


def main():
    results = []
    B = int(os.environ.get("ZKSNAKE_BENCH_B", "4096"))
    R = int(os.environ.get("ZKSNAKE_BENCH_R", "385"))
    stages = os.environ.get(
        "ZKSNAKE_BENCH_STAGES", "kernel,gather,gather_rows,reduce"
    ).split(",")
    for stage in stages:
        b, r = B, (0 if stage == "reduce" else R)
        env = dict(os.environ)
        # repo on the path, axon plugin site KEPT (required for the TPU)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [
                sys.executable,
                "-u",
                os.path.abspath(__file__),
                "--stage",
                stage,
                str(b),
                str(r),
            ],
            capture_output=True,
            text=True,
            timeout=3300,
            cwd=REPO,
            env=env,
        )
        out = [l for l in proc.stdout.splitlines() if l.startswith("@@R@@")]
        if proc.returncode == 0 and out:
            results.append(json.loads(out[-1][5:]))
        else:
            results.append(
                {"stage": stage, "error": (proc.stderr or proc.stdout)[-400:]}
            )
        print(json.dumps(results[-1]))
    print(json.dumps(results))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--stage":
        fn = {"kernel": stage_kernel, "gather": stage_gather, "gather_rows": stage_gather_rows, "reduce": stage_reduce}[
            sys.argv[2]
        ]
        print("@@R@@" + json.dumps(fn(int(sys.argv[3]), int(sys.argv[4]))))
    else:
        main()
