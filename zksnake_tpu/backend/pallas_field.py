"""Pallas TPU kernel for batched Montgomery multiplication.

The jnp formulation of mont_mul is HBM-bandwidth bound: XLA materializes most
of the ~3k elementwise intermediates, so each (nl, N) pass costs a full HBM
round trip (measured ~5.4ms for 2^18 — exactly N*4B*ops/BW). This kernel runs
the identical lazy-carry CIOS entirely in VMEM on (nl, BLOCK) tiles, so the
only HBM traffic is the two operand reads and one result write.

Falls back transparently to the jnp path off-TPU (interpret mode is only used
in tests).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .limbs import W, MASK

BLOCK = 1024


def _make_kernel(nl, p_limbs, pinv):
    p_list = [int(x) for x in p_limbs]

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]  # (nl, BLOCK) uint32
        b = b_ref[...]
        zero = jnp.zeros((a.shape[1],), jnp.uint32)
        t = [zero] * (2 * nl + 1)

        for i in range(nl):
            prod = a[i][None, :] * b  # (nl, BLOCK)
            lo = prod & MASK
            hi = prod >> W
            for j in range(nl):
                t[i + j] = t[i + j] + lo[j]
                t[i + j + 1] = t[i + j + 1] + hi[j]

        for i in range(nl):
            m = ((t[i] & MASK) * pinv) & MASK
            for j in range(nl):
                prod = m * p_list[j]
                t[i + j] = t[i + j] + (prod & MASK)
                t[i + j + 1] = t[i + j + 1] + (prod >> W)
            t[i + 1] = t[i + 1] + (t[i] >> W)

        # carry normalize limbs nl..2nl-1
        out = []
        carry = zero
        for j in range(nl, 2 * nl):
            v = t[j] + carry
            out.append(v & MASK)
            carry = v >> W
        # conditional subtract p
        borrow = jnp.zeros_like(out[0], dtype=jnp.int32)
        diff = []
        for j in range(nl):
            d = out[j].astype(jnp.int32) - p_list[j] - borrow
            borrow = (d < 0).astype(jnp.int32)
            diff.append((d + (borrow << W)).astype(jnp.uint32))
        ge = borrow == 0
        res = [jnp.where(ge, diff[j], out[j]) for j in range(nl)]
        o_ref[...] = jnp.stack(res, axis=0)

    return kernel


@functools.lru_cache(maxsize=None)
def _compiled(nl, p_limbs_key, pinv, interpret):
    from jax.experimental import pallas as pl

    kernel = _make_kernel(nl, p_limbs_key, pinv)

    @jax.jit
    def run(a, b):
        m = a.shape[1]
        grid = m // BLOCK
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((nl, BLOCK), lambda i: (0, i)),
                pl.BlockSpec((nl, BLOCK), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((nl, BLOCK), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((nl, m), jnp.uint32),
            interpret=interpret,
        )(a, b)

    return run


_STATE = {"checked": False, "on_tpu": False}


def pallas_available():
    import os

    if os.environ.get("ZKSNAKE_NO_PALLAS", "0") == "1":
        return False
    if not _STATE["checked"]:
        try:
            _STATE["on_tpu"] = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            _STATE["on_tpu"] = False
        _STATE["checked"] = True
    return _STATE["on_tpu"]


def mont_mul_pallas(fs, a, b):
    """Flattened-batch Montgomery product via the Pallas kernel.
    a, b: (nl, *batch) broadcastable; returns (nl, *batch)."""
    nl = fs.nl
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

    def _bc(x):
        extra = len(shape) - (x.ndim - 1)
        x = x.reshape((nl,) + (1,) * extra + x.shape[1:])
        return jnp.broadcast_to(x, (nl,) + shape)

    a = _bc(a).reshape(nl, -1)
    b = _bc(b).reshape(nl, -1)
    m = a.shape[1]
    m_pad = -(-m // BLOCK) * BLOCK
    if m_pad != m:
        pad = ((0, 0), (0, m_pad - m))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    run = _compiled(nl, tuple(int(x) for x in fs.p_limbs), fs.pinv, False)
    out = run(a, b)
    if m_pad != m:
        out = out[:, :m]
    return out.reshape((nl,) + shape)
