"""Primitive benchmarks for the gather-free MSM pipeline:

  sort       lax.sort(key + 2nl u32 payload planes) at n — the permute step
  transpose  (B2, R, 2nl) -> (R, 2nl, B2) relayout — table to round-major
  dma        pallas expansion kernel: per-bucket contiguous dynamic-slice
             copies (grid B2, scalar-prefetched starts) — the ragged
             round-table materialization

Each stage in its own subprocess (TPU failure poisoning).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NL = 16


def _pull(x):
    import numpy as np
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[0])[..., :1]


def stage_sort(n, _):
    import numpy as np
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    keys = jnp.asarray(rng.integers(0, 1 << 13, size=n).astype(np.int32))
    planes = [
        jnp.asarray(rng.integers(0, 1 << 16, size=n).astype(np.uint32))
        for _ in range(2 * NL)
    ]

    @jax.jit
    def run(keys, *planes):
        out = jax.lax.sort((keys,) + planes, dimension=0, num_keys=1)
        return out[0], out[1]

    out = run(keys, *planes)
    _pull(out)
    t0 = time.time()
    out = run(keys, *planes)
    _pull(out)
    dt = time.time() - t0
    return {"stage": "sort", "n": n, "payload_planes": 2 * NL, "s": dt}


def stage_transpose(n, _):
    import numpy as np
    import jax
    import jax.numpy as jnp

    B2, R = 4096, 385
    rng = np.random.default_rng(4)
    x = jnp.asarray(
        rng.integers(0, 1 << 16, size=(B2, R, 2 * NL)).astype(np.uint32)
    )

    @jax.jit
    def run(x):
        return jnp.transpose(x, (1, 2, 0))  # (R, 2nl, B2)

    out = run(x)
    _pull(out)
    t0 = time.time()
    out = run(x)
    _pull(out)
    dt = time.time() - t0
    nbytes = B2 * R * 2 * NL * 4
    return {"stage": "transpose", "s": dt, "gb_per_s": nbytes / dt / 1e9}


def stage_dma(n, _):
    """Expansion kernel: dst[b] = src[start_b : start_b + R] for B2 buckets."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B2, R = 4096, 385
    rng = np.random.default_rng(5)
    src = jnp.asarray(
        rng.integers(0, 1 << 16, size=(n + R, 2 * NL)).astype(np.uint32)
    )
    starts = jnp.asarray(
        np.sort(rng.integers(0, n, size=B2)).astype(np.int32)
    )

    def kernel(starts_ref, src_ref, out_ref):
        b = pl.program_id(0)
        s = starts_ref[b]
        out_ref[...] = src_ref[pl.ds(s, R), :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, R, 2 * NL), lambda b, starts: (b, 0, 0)),
    )

    @jax.jit
    def run(starts, src):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B2, R, 2 * NL), jnp.uint32),
        )(starts, src)

    out = run(starts, src)
    _pull(out)
    t0 = time.time()
    out = run(starts, src)
    _pull(out)
    dt = time.time() - t0
    nbytes = B2 * R * 2 * NL * 4
    # correctness spot check
    o = np.asarray(out)
    s = np.asarray(src)
    st = np.asarray(starts)
    for b in (0, 17, B2 - 1):
        assert (o[b] == s[st[b] : st[b] + R]).all(), f"dma mismatch bucket {b}"
    return {"stage": "dma", "s": dt, "gb_per_s": nbytes / dt / 1e9}


STAGES = {"sort": stage_sort, "transpose": stage_transpose, "dma": stage_dma}


def main():
    results = []
    n = 1 << int(os.environ.get("ZKSNAKE_BENCH_LOG2N", "20"))
    for stage in os.environ.get("ZKSNAKE_BENCH_STAGES", "sort,transpose,dma").split(","):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), "--stage", stage, str(n)],
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
                {"stage": stage, "error": (proc.stderr or proc.stdout)[-600:]}
            )
        print(json.dumps(results[-1]))
    print(json.dumps(results))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--stage":
        print(
            "@@R@@"
            + json.dumps(STAGES[sys.argv[2]](int(sys.argv[3]), None))
        )
    else:
        main()
