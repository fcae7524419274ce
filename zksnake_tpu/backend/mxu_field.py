"""MXU-assisted Montgomery multiplication (SOS with matmul reduction).

The CIOS kernel (field._mont_mul_cols / pallas_field) is pure VPU work:
~2*nl^2 integer MACs plus carry bookkeeping per product. The MXU sits idle
because a*b has no shared operand across lanes. The Montgomery REDUCTION,
however, is linear in T with CONSTANT coefficients, so it maps onto the MXU
as two matmuls against constant byte-Toeplitz matrices:

    T = a * b                      (VPU schoolbook, lazy 16-bit columns)
    m = (T mod R) * P' mod R       (MXU: PMAT  (2nl x 2nl+1) @ bytes(T_lo))
    c = (T + m * p) / R            (MXU: PPMAT (4nl+1 x 2nl) @ bytes(m),
                                    then one signed carry chain on the VPU)

with P' = -p^-1 mod R, R = 2^(16*nl). Operands are unsigned byte planes
(values 0..255) cast to bfloat16: byte*byte products are exact in the MXU's
f32 accumulation (<= 2^24), so the arithmetic is bit-exact. This trades the
interleaved reduction's ~nl^2 VPU MACs (plus carry chains) for ~550 cheap
bitwise ops + two MXU matmuls — ~1.4x fewer VPU ops per montmul, with the
matmul cost negligible (K <= 2nl+1).

Replaces the same arkworks role as field.mont_mul (reference
src/bn254/polynomial.rs / curve.rs Montgomery backend); selected via
ZKSNAKE_MXU_MONTMUL=1 and benchmarked by scripts/bench_montmul.py.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .limbs import W, MASK


def _bytes_of(x: int, n: int):
    """n little-endian bytes of a nonnegative int (Python ints)."""
    return [(x >> (8 * i)) & 0xFF for i in range(n)]


@functools.lru_cache(maxsize=None)
def _reduction_mats(p: int, nl: int):
    """(PMAT, PPMAT) numpy f32 constant matrices for modulus p.

    PMAT  (NB x NB+1): row k = byte k of m_conv: m[k] = sum_i T8[i]*P'[k-i]
    PPMAT (2NB+1 x NB): row k = byte k of (m*p) conv (full, both halves)
    where NB = 2*nl bytes per R-sized value."""
    NB = 2 * nl
    R = 1 << (W * nl)
    pprime = (-pow(p, -1, R)) % R
    pb = _bytes_of(pprime, NB)
    pbyte = _bytes_of(p, NB)
    PMAT = np.zeros((NB, NB + 1), dtype=np.float32)
    for k in range(NB):
        for i in range(NB + 1):
            j = k - i
            if 0 <= j < NB:
                PMAT[k, i] = pb[j]
    PPMAT = np.zeros((2 * NB + 1, NB), dtype=np.float32)
    for k in range(2 * NB + 1):
        for i in range(NB):
            j = k - i
            if 0 <= j < NB:
                PPMAT[k, i] = pbyte[j]
    return PMAT, PPMAT


# Trace-time registry of reduction matrices already materialized INSIDE a
# Pallas kernel (read from refs): Pallas forbids closure-captured constant
# arrays, so kernels that want the MXU path receive PMAT/PPMAT as inputs and
# publish them here for the nested mont_mul calls (field.mont_mul ->
# mont_mul_mxu_cols) to pick up. Keyed by modulus.
_KERNEL_MATS = {}


def reduction_mats_dev(fs):
    """(PMAT, PPMAT) as bf16 jnp arrays — pass these as pallas inputs."""
    PMAT, PPMAT = _reduction_mats(fs.p, fs.nl)
    return (
        jnp.asarray(PMAT, dtype=jnp.bfloat16),
        jnp.asarray(PPMAT, dtype=jnp.bfloat16),
    )


def _matmul_bytes(mat, out_rows, planes):
    """(M x K) bf16 matrix @ (K, *shape) byte planes -> (M, *shape) int32.

    bf16 operands, f32 accumulate: bytes are exact in bf16 and every
    partial sum stays < 2^24, so the result is exact integer arithmetic
    on the MXU."""
    K = len(planes)
    # uint32 -> int32 -> float32 -> bf16: Mosaic has no direct u32->bf16
    # cast (real-hardware lowering failure; byte values 0..255 are exact
    # through every step)
    stacked = (
        jnp.stack(planes, axis=0)
        .astype(jnp.int32)
        .astype(jnp.float32)
        .astype(jnp.bfloat16)
    )
    flat = stacked.reshape(K, -1)
    out = jax.lax.dot_general(
        mat,
        flat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.int32).reshape((out_rows,) + stacked.shape[1:])


def mont_mul_mxu_cols(fs, a, b, shape, mats=None):
    """SOS Montgomery product with MXU reduction. a, b broadcast to
    (nl,) + shape uint32 16-bit limbs (Montgomery form); returns the same.

    Pure elementwise ops + dot_general: traces identically inside a Pallas
    kernel body (Mosaic lowers the dot to the MXU) and in a plain jit graph
    (XLA lowers it likewise). Inside Pallas, the constant matrices must
    arrive via `mats` or the _KERNEL_MATS registry (kernel inputs)."""
    nl = fs.nl
    NB = 2 * nl
    if mats is None:
        mats = _KERNEL_MATS.get(fs.p)
    if mats is None:
        from . import pallas_field

        if pallas_field._STATE["in_kernel"]:
            # Building the matrices here would close over constant arrays —
            # forbidden inside Pallas kernel bodies (obscure Mosaic failure).
            # Kernels must take PMAT/PPMAT as inputs and publish them via
            # pallas_field._published_mats.
            raise RuntimeError(
                "mont_mul_mxu_cols traced inside a Pallas kernel without "
                f"published reduction matrices for p={hex(fs.p)[:18]}…; "
                "pass them as kernel inputs (see pallas_field._mxu_mats)"
            )
        mats = reduction_mats_dev(fs)
    PMAT, PPMAT = mats

    # ---- schoolbook product, lazy 16-bit columns (VPU) ----
    zero = jnp.zeros(shape, dtype=jnp.uint32)
    t = [zero] * (2 * nl + 1)
    for i in range(nl):
        prod = a[i] * b  # (nl,) + shape, exact in uint32
        lo = prod & MASK
        hi = prod >> W
        for j in range(nl):
            t[i + j] = t[i + j] + lo[j]
            t[i + j + 1] = t[i + j + 1] + hi[j]

    # ---- normalize the low half to exact 16-bit limbs ----
    # (the normalized limbs REPLACE columns 0..nl-1; the overflow carry
    # moves into column nl — keeping the originals would double-count it)
    tlo = []
    carry = zero
    for j in range(nl):
        v = t[j] + carry
        tlo.append(v & MASK)
        carry = v >> W
    t[:nl] = tlo
    t[nl] = t[nl] + carry

    # ---- byte planes of T_lo (values 0..255 in uint32 lanes) ----
    t8 = []
    c2 = zero
    for j in range(nl):
        v = tlo[j] + c2
        t8.append(v & 0xFF)
        rest = v >> 8  # <= 257
        t8.append(rest & 0xFF)
        c2 = rest >> 8  # 0 or 1
    t8.append(c2)  # NB+1 planes

    # ---- m = T_lo * P' mod R  (MXU, then byte carry-normalize) ----
    m_conv = _matmul_bytes(PMAT, NB, t8)  # (NB,) + shape int32
    m8 = []
    mc = jnp.zeros(shape, dtype=jnp.int32)
    for k in range(NB):
        v = m_conv[k] + mc
        m8.append((v & 0xFF).astype(jnp.uint32))
        mc = v >> 8
    # final carry dropped: m is defined mod R

    # ---- m * p (MXU), folded into 16-bit columns ----
    mp_conv = _matmul_bytes(PPMAT, 2 * NB + 1, m8)  # (2NB+1,) + shape int32
    ti = [x.astype(jnp.int32) for x in t]
    for j in range(2 * nl):
        u = mp_conv[2 * j]
        if 2 * j + 1 < 2 * NB + 1:
            u = u + (mp_conv[2 * j + 1] << 8)
        ti[j] = ti[j] + u
    ti[2 * nl] = ti[2 * nl] + mp_conv[2 * NB]

    # ---- (T + m*p) / R: carry chain; low half is provably zero ----
    c3 = jnp.zeros(shape, dtype=jnp.int32)
    for j in range(nl):
        c3 = (ti[j] + c3) >> W
    out = []
    for j in range(nl, 2 * nl):
        v = ti[j] + c3
        out.append((v & MASK).astype(jnp.uint32))
        c3 = v >> W
    r = jnp.stack(out, axis=0)

    # result < 2p: one conditional subtract
    from .field import _cond_sub_p

    return _cond_sub_p(fs, r)


def mont_mul_mxu(fs, a, b):
    """Broadcasting wrapper matching field.mont_mul's contract."""
    nl = fs.nl
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

    def _bc(x):
        extra = len(shape) - (x.ndim - 1)
        x = x.reshape((nl,) + (1,) * extra + x.shape[1:])
        return jnp.broadcast_to(x, (nl,) + shape)

    return mont_mul_mxu_cols(fs, _bc(a), _bc(b), shape)
