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
    """Timing fence: device->host pull of a few bytes. The slice MUST run on
    device (jax op) before np.asarray — np.asarray(whole)[..., :1] transfers
    the entire buffer through the axon relay at ~36 MB/s and was the
    dominant term in every round-1 'slow op' measurement."""
    import numpy as np
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    idx = tuple(slice(0, 1) for _ in leaf.shape)
    np.asarray(leaf[idx])


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


def stage_tkernel(n, _):
    """Pallas tile transpose: (B2, nl*R) u32 -> (nl*R, B2) via (128, 128)
    blocks with in-kernel .T — the relayout XLA runs at 25MB/s."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B2, M = 4096, NL * 392  # 6272 = 49 * 128
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(0, 1 << 30, size=(B2, M)).astype(np.uint32))

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(B2 // 128, M // 128),
            in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, j))],
            out_specs=pl.BlockSpec((128, 128), lambda i, j: (j, i)),
            out_shape=jax.ShapeDtypeStruct((M, B2), jnp.uint32),
        )(x)

    out = run(x)
    _pull(out)
    t0 = time.time()
    out = run(x)
    _pull(out)
    dt = time.time() - t0
    o = np.asarray(out[:256, :256])
    xi = np.asarray(x[:256, :256])
    assert (o == xi.T).all(), "tkernel mismatch"
    nbytes = B2 * M * 4
    return {"stage": "tkernel", "s": dt, "gb_per_s": nbytes / dt / 1e9}


def stage_expand_dma(n, _):
    """Pallas expansion: out[b] = X[:, start_b : start_b + R] — per-bucket
    strided-slab DMA from an ANY-space (nl, n) source."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B2, R = 4096, 392
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.integers(0, 1 << 30, size=(NL, n + R)).astype(np.uint32)
    )
    starts = jnp.asarray(np.sort(rng.integers(0, n, size=B2)).astype(np.int32))

    def kernel(starts_ref, x_ref, o_ref, sem):
        b = pl.program_id(0)
        s = starts_ref[b]
        dma = pltpu.make_async_copy(
            x_ref.at[:, pl.ds(s, R)], o_ref.at[0], sem
        )
        dma.start()
        dma.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, NL, R), lambda b, starts: (b, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )

    @jax.jit
    def run(starts, x):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B2, NL, R), jnp.uint32),
        )(starts, x)

    out = run(starts, x)
    _pull(out)
    t0 = time.time()
    out = run(starts, x)
    _pull(out)
    dt = time.time() - t0
    o = np.asarray(out)
    xs = np.asarray(x)
    st = np.asarray(starts)
    for b in (0, 33, B2 - 1):
        assert (o[b] == xs[:, st[b] : st[b] + R]).all(), f"expand mismatch {b}"
    nbytes = B2 * NL * R * 4
    return {"stage": "expand_dma", "s": dt, "gb_per_s": nbytes / dt / 1e9}


def stage_expand_scan(n, _):
    """XLA-only expansion: lax.scan of dynamic_slice over bucket starts."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    B2, R = 4096, 392
    rng = np.random.default_rng(8)
    x = jnp.asarray(
        rng.integers(0, 1 << 30, size=(NL, n + R)).astype(np.uint32)
    )
    starts = jnp.asarray(np.sort(rng.integers(0, n, size=B2)).astype(np.int32))

    @jax.jit
    def run(starts, x):
        def body(_, s):
            return None, jax.lax.dynamic_slice(x, (0, s), (NL, R))

        _, out = jax.lax.scan(body, None, starts)
        return out

    out = run(starts, x)
    _pull(out)
    t0 = time.time()
    out = run(starts, x)
    _pull(out)
    dt = time.time() - t0
    nbytes = B2 * NL * R * 4
    return {"stage": "expand_scan", "s": dt, "gb_per_s": nbytes / dt / 1e9}


def _time_tkernel(run, x, check=None):
    import numpy as np
    import time as _t

    out = run(x)
    _pull(out)
    t0 = _t.time()
    out = run(x)
    _pull(out)
    dt = _t.time() - t0
    if check is not None:
        check(np.asarray(out), np.asarray(x))
    return dt


def stage_tk_copy(n, _):
    """Identity copy at the tile-transpose grid — isolates per-grid-step
    overhead from the in-kernel transpose op itself."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B2, M = 4096, NL * 392
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(0, 1 << 30, size=(B2, M)).astype(np.uint32))

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(B2 // 128, M // 128),
            in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, j))],
            out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((B2, M), jnp.uint32),
        )(x)

    dt = _time_tkernel(run, x)
    nbytes = B2 * M * 4
    return {"stage": "tk_copy", "s": dt, "gb_per_s": nbytes / dt / 1e9}


def stage_tk_fat(n, _):
    """Fat-block transpose: 8 grid steps of (512, M) -> (M, 512)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B2, M = 4096, NL * 392
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(0, 1 << 30, size=(B2, M)).astype(np.uint32))

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(B2 // 512,),
            in_specs=[pl.BlockSpec((512, M), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((M, 512), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((M, B2), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x)

    def check(o, xi):
        assert (o[:256, :256] == xi[:256, :256].T).all()

    dt = _time_tkernel(run, x, check)
    nbytes = B2 * M * 4
    return {"stage": "tk_fat", "s": dt, "gb_per_s": nbytes / dt / 1e9}


def stage_tk_mxu(n, _):
    """Transpose via MXU: u32 -> 2 f32 halves, einsum('ra,rb->ab', x, I)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B2, M = 4096, NL * 392
    TB = 512  # row-tile
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(0, 1 << 30, size=(B2, M)).astype(np.uint32))

    def kernel(x_ref, o_ref):
        xb = x_ref[...]  # (TB, M)
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 1)
        ).astype(jnp.float32)
        lo = (xb & 0xFFFF).astype(jnp.int32).astype(jnp.float32)
        hi = (xb >> 16).astype(jnp.int32).astype(jnp.float32)
        dn = (((0,), (0,)), ((), ()))
        tlo = jax.lax.dot_general(
            lo, eye, dn, preferred_element_type=jnp.float32
        )  # (M, TB)
        thi = jax.lax.dot_general(
            hi, eye, dn, preferred_element_type=jnp.float32
        )
        o_ref[...] = tlo.astype(jnp.int32).astype(jnp.uint32) | (
            thi.astype(jnp.int32).astype(jnp.uint32) << 16
        )

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(B2 // TB,),
            in_specs=[pl.BlockSpec((TB, M), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((M, TB), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((M, B2), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x)

    def check(o, xi):
        assert (o[:256, :256] == xi[:256, :256].T).all()

    dt = _time_tkernel(run, x, check)
    nbytes = B2 * M * 4
    return {"stage": "tk_mxu", "s": dt, "gb_per_s": nbytes / dt / 1e9}


def stage_expand_dma_pm(n, _):
    """Point-major expansion via make_async_copy with SUBLANE-dynamic source
    offsets (lane-dynamic HBM slicing doesn't compile in Mosaic):
    out[b] = src[start_b : start_b + R, :] for (n + R, 2nl) source."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B2, R = 4096, 392
    rng = np.random.default_rng(7)
    src = jnp.asarray(
        rng.integers(0, 1 << 30, size=(n + R, 2 * NL)).astype(np.uint32)
    )
    starts = jnp.asarray(np.sort(rng.integers(0, n, size=B2)).astype(np.int32))

    def kernel(starts_ref, x_ref, o_ref, sem):
        b = pl.program_id(0)
        s = starts_ref[b]
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(s, R), :], o_ref.at[0], sem
        )
        dma.start()
        dma.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, R, 2 * NL), lambda b, starts: (b, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
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
    o = np.asarray(out[:40])
    s_ = np.asarray(src)
    st = np.asarray(starts)
    for b in (0, 17, 39):
        assert (o[b] == s_[st[b] : st[b] + R]).all(), f"pm mismatch {b}"
    nbytes = B2 * R * 2 * NL * 4
    return {"stage": "expand_dma_pm", "s": dt, "gb_per_s": nbytes / dt / 1e9}


def stage_tk_flat(n, _):
    """Point-major conversion transpose: (2nl, M) -> (M, 2nl) in fat blocks."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = n
    BT = 32768
    rng = np.random.default_rng(9)
    x = jnp.asarray(
        rng.integers(0, 1 << 30, size=(2 * NL, M)).astype(np.uint32)
    )

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(M // BT,),
            in_specs=[pl.BlockSpec((2 * NL, BT), lambda i: (0, i))],
            out_specs=pl.BlockSpec((BT, 2 * NL), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M, 2 * NL), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x)

    def chk(o, xi):
        assert (o[:256] == xi[:, :256].T).all()

    dt = _time_tkernel(run, x, chk)
    nbytes = 2 * NL * M * 4
    return {"stage": "tk_flat", "s": dt, "gb_per_s": nbytes / dt / 1e9}


STAGES = {
    "sort": stage_sort,
    "transpose": stage_transpose,
    "dma": stage_dma,
    "tkernel": stage_tkernel,
    "expand_dma": stage_expand_dma,
    "expand_scan": stage_expand_scan,
    "tk_copy": stage_tk_copy,
    "tk_fat": stage_tk_fat,
    "tk_mxu": stage_tk_mxu,
}
def stage_transpose210(n, _):
    """(GB, NL, R) -> (R, NL, GB) full-reversal transpose — the layout the
    bucket kernel needs from the scan-expanded table."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    B2, R = 4096, 392
    rng = np.random.default_rng(4)
    x = jnp.asarray(
        rng.integers(0, 1 << 16, size=(B2, NL, R)).astype(np.uint32)
    )

    @jax.jit
    def run(x):
        return jnp.transpose(x, (2, 1, 0))  # (R, NL, B2)

    out = run(x)
    _pull(out)
    t0 = time.time()
    out = run(x)
    _pull(out)
    dt = time.time() - t0
    nbytes = B2 * R * NL * 4
    return {"stage": "transpose210", "s": dt, "gb_per_s": nbytes / dt / 1e9}


def stage_take_cols(n, _):
    """msm.py's CURRENT round-table build: flat take along axis=1 of a
    (NP, n+R) source (each index pulls a STRIDED 16-element column — worst
    DMA granularity), then reshape + (2,0,1) transpose to (R, NP, B2)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    NP, B2, R = 16, 4096, 392
    rng = np.random.default_rng(6)
    src = jnp.asarray(
        rng.integers(0, 1 << 30, size=(NP, n + R)).astype(np.uint32)
    )
    starts = jnp.asarray(np.sort(rng.integers(0, n, size=B2)).astype(np.int32))

    @jax.jit
    def run(src, starts):
        kcol = jnp.arange(R, dtype=jnp.int32)[None, :]
        pos = (starts[:, None] + kcol).reshape(-1)
        t = jnp.take(src, pos, axis=1).reshape(NP, B2, R)
        return jnp.transpose(t, (2, 0, 1))

    out = run(src, starts)
    _pull(out)
    t0 = time.time()
    out = run(src, starts)
    _pull(out)
    dt = time.time() - t0
    nbytes = B2 * R * NP * 4
    return {"stage": "take_cols", "s": dt, "gb_per_s": nbytes / dt / 1e9}


def stage_take_rows(n, _):
    """Transposed-source alternative: take along axis=0 of (n+R, NP) — each
    index pulls one CONTIGUOUS 64B row — then (0,2,1) transpose. If the
    current 2.9 GB/s gather is strided-granularity-bound, this should win."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    NP, B2, R = 16, 4096, 392
    rng = np.random.default_rng(6)
    srcT = jnp.asarray(
        rng.integers(0, 1 << 30, size=(n + R, NP)).astype(np.uint32)
    )
    starts = jnp.asarray(np.sort(rng.integers(0, n, size=B2)).astype(np.int32))

    @jax.jit
    def run(srcT, starts):
        kcol = jnp.arange(R, dtype=jnp.int32)[:, None]
        pos = (kcol + starts[None, :]).reshape(-1)  # (R*B2,) round-major
        t = jnp.take(srcT, pos, axis=0).reshape(R, B2, NP)
        return jnp.transpose(t, (0, 2, 1))

    out = run(srcT, starts)
    _pull(out)
    t0 = time.time()
    out = run(srcT, starts)
    _pull(out)
    dt = time.time() - t0
    nbytes = B2 * R * NP * 4
    return {"stage": "take_rows", "s": dt, "gb_per_s": nbytes / dt / 1e9}


STAGES["expand_dma_pm"] = stage_expand_dma_pm
STAGES["tk_flat"] = stage_tk_flat
STAGES["transpose210"] = stage_transpose210
STAGES["take_cols"] = stage_take_cols
STAGES["take_rows"] = stage_take_rows


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
