"""Batched modular arithmetic kernels over 16-bit-limb tensors.

This module replaces the reference's arkworks Montgomery field arithmetic
(the workhorse under src/bn254/polynomial.rs and src/bn254/curve.rs) with
TPU-friendly vectorized kernels:

- Elements are stored **limbs-first**: shape (NL, *batch) of uint32 lanes
  holding 16-bit limbs (little-endian). The batch dimension is the trailing
  one so it maps onto the TPU's (8 sublane x 128 lane) vector tiles with full
  utilization; a limbs-last layout would waste 7/8 of every tile.
- Montgomery multiplication is CIOS with *lazy carries*: limb products fit
  uint32 exactly ((2^16-1)^2 < 2^32) and column accumulators stay < 2^23, so
  no 64-bit arithmetic is ever needed (int64 is emulated on TPU).
- The accumulator is a Python list of per-column tensors: every update is a
  plain elementwise add that XLA fuses. (Dynamic-update-slice chains compile
  pathologically on TPU — measured 250s vs 14s for this kernel.)
- All loops are static (unrolled under jit) except large exponentiations,
  which ride a fori_loop with the exponent bits as a constant array.

All values on device are kept in Montgomery form (x * R mod p, R = 2^(16*NL)).
"""

import numpy as np

import jax
import jax.numpy as jnp

from .limbs import W, MASK, n_limbs, ints_to_limbs, limbs_to_ints


class FieldSpec:
    """Per-modulus constants for the limb kernels."""

    _CACHE = {}

    def __init__(self, p: int):
        self.p = p
        self.nl = n_limbs(p)
        self.R = (1 << (W * self.nl)) % p
        self.R2 = self.R * self.R % p
        self.p_limbs = np.array(
            [(p >> (W * i)) & MASK for i in range(self.nl)], dtype=np.uint32
        )
        # -p^-1 mod 2^16
        self.pinv = (-pow(p, -1, 1 << W)) % (1 << W)
        self.one_mont = np.array(
            [(self.R >> (W * i)) & MASK for i in range(self.nl)], dtype=np.uint32
        )

    @classmethod
    def get(cls, p: int):
        if p not in cls._CACHE:
            cls._CACHE[p] = cls(p)
        return cls._CACHE[p]

    # ---------- host-side conversions (limbs-first device layout) ----------
    def to_mont_host(self, values):
        """ints -> (nl, n) Montgomery limb array (numpy)."""
        p = self.p
        R = self.R
        from ..native import get_codec

        codec = get_codec()
        if codec is not None:
            scaled = codec.mulmod_scalar(
                values if isinstance(values, list) else list(values), R, p
            )
        else:
            scaled = [int(v) % p * R % p for v in values]
        return np.ascontiguousarray(ints_to_limbs(scaled, self.nl).T)

    def from_mont_host(self, arr):
        """(nl, n) Montgomery limb array -> ints."""
        rinv = pow(self.R, -1, self.p)
        rows = np.ascontiguousarray(np.asarray(arr, dtype=np.uint32).T)
        return [v * rinv % self.p for v in limbs_to_ints(rows)]

    def raw_to_host(self, values):
        """ints (mod p, NOT Montgomery) -> (nl, n) limb array (numpy)."""
        return np.ascontiguousarray(
            ints_to_limbs([int(v) % self.p for v in values], self.nl).T
        )

    def raw_from_host(self, arr):
        rows = np.ascontiguousarray(np.asarray(arr, dtype=np.uint32).T)
        return limbs_to_ints(rows)

    def one_mont_dev(self, batch_shape=()):
        """Montgomery 1 broadcast to (nl, *batch_shape)."""
        return self.const_mont_dev(1, batch_shape)

    def const_mont_dev(self, value: int, batch_shape=()):
        """Montgomery constant built from per-limb Python scalars (scalar
        literals, not captured arrays — required inside Pallas kernels)."""
        m = int(value) % self.p * self.R % self.p
        cols = [
            jnp.full((1,) * len(batch_shape) or (), (m >> (W * i)) & MASK, jnp.uint32)
            for i in range(self.nl)
        ]
        v = jnp.stack(cols, axis=0)
        return jnp.broadcast_to(v, (self.nl,) + tuple(batch_shape))


def _cpu64_enabled():
    """u64 CIOS fast path for CPU-backend traces (ZKSNAKE_CPU64=0 disables).

    TPU has no native 64-bit integer lanes, but XLA-CPU does — and XLA-CPU
    compile time (the 2-core box's bottleneck for the suite, the dryrun,
    and the scaling bench) scales with per-montmul op count. Repacking the
    16-bit limbs to 32-bit limbs with u64 accumulation shrinks the CIOS
    from 16x16 to 8x8 limb products (BN254), ~4x fewer traced ops per
    instantiation, and runs faster too."""
    import os

    if os.environ.get("ZKSNAKE_CPU64", "1") != "1":
        return False
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return False


def _mont_mul_cpu64(fs, a, b):
    """CIOS Montgomery product on 32-bit limbs with u64 accumulators.
    a, b: (nl,) + shape uint32 16-bit limbs (already broadcast); returns the
    same layout. Bit-identical result to mont_mul's 16-bit path (same
    mathematical map; property-tested in tests/test_limbs.py)."""
    enable_x64 = jax.enable_x64  # context manager (jax >= 0.7 public API)

    nl = fs.nl
    assert nl % 2 == 0
    s = nl // 2
    p32 = [
        int(fs.p_limbs[2 * k]) | (int(fs.p_limbs[2 * k + 1]) << 16)
        for k in range(s)
    ]
    pinv32 = (-pow(fs.p, -1, 1 << 32)) % (1 << 32)

    with enable_x64():
        # Python-int constants are weak-typed (no dtype-truncation warnings
        # outside the context); all tensors below are u64.
        M32 = jnp.asarray(0xFFFFFFFF, dtype=jnp.uint64)
        a64 = a.astype(jnp.uint64)
        b64 = b.astype(jnp.uint64)
        A = [a64[2 * k] | (a64[2 * k + 1] << 16) for k in range(s)]
        B = [b64[2 * k] | (b64[2 * k + 1] << 16) for k in range(s)]
        zero = jnp.zeros_like(A[0])
        t = [zero] * (s + 2)
        for i in range(s):
            c = zero
            for j in range(s):
                cs = t[j] + A[i] * B[j] + c
                t[j] = cs & M32
                c = cs >> 32
            cs = t[s] + c
            t[s] = cs & M32
            t[s + 1] = t[s + 1] + (cs >> 32)
            m = (t[0] * pinv32) & M32
            cs = t[0] + m * p32[0]
            c = cs >> 32
            for j in range(1, s):
                cs = t[j] + m * p32[j] + c
                t[j - 1] = cs & M32
                c = cs >> 32
            cs = t[s] + c
            t[s - 1] = cs & M32
            c = cs >> 32
            t[s] = t[s + 1] + c
            t[s + 1] = zero
        # repack 32-bit limbs -> 16-bit uint32 planes
        out = []
        for k in range(s):
            out.append((t[k] & 0xFFFF).astype(jnp.uint32))
            out.append(((t[k] >> 16) & 0xFFFF).astype(jnp.uint32))
    r = jnp.stack(out, axis=0)
    return _cond_sub_p(fs, r)


def _mxu_montmul():
    """ZKSNAKE_MXU_MONTMUL=1 routes kernel-body Montgomery products to the
    SOS formulation with MXU matmul reduction (mxu_field) — measured by
    scripts/bench_montmul.py; the CIOS VPU core is the default."""
    import os

    return os.environ.get("ZKSNAKE_MXU_MONTMUL", "0") == "1"


def _carry_chain(cols, nl):
    """cols: list of nl (...,) tensors -> (nl, ...) normalized limbs (< 2^16).
    Caller guarantees the true value fits nl limbs."""
    out = []
    carry = jnp.zeros_like(cols[0])
    for j in range(nl):
        v = cols[j] + carry
        out.append(v & MASK)
        carry = v >> W
    return jnp.stack(out, axis=0)


def _cond_sub_p(fs, r):
    """r in [0, 2p) with normalized limbs (nl, ...) -> r mod p."""
    borrow = jnp.zeros_like(r[0], dtype=jnp.int32)
    diff = []
    ri = r.astype(jnp.int32)
    for j in range(fs.nl):
        d = ri[j] - jnp.int32(int(fs.p_limbs[j])) - borrow
        borrow = (d < 0).astype(jnp.int32)
        diff.append((d + (borrow << W)).astype(jnp.uint32))
    diff = jnp.stack(diff, axis=0)
    ge = borrow == 0  # r >= p
    return jnp.where(ge[None], diff, r)


def _mont_mul_cols(fs, a, b, shape):
    """Column-list CIOS (no lax.pad) — the formulation used *inside* Pallas
    kernels, where every update must be a plain elementwise op Mosaic can
    lower. a, b already broadcast to (nl,) + shape."""
    nl = fs.nl
    zero = jnp.zeros(shape, dtype=jnp.uint32)
    t = [zero] * (2 * nl + 1)
    for i in range(nl):
        prod = a[i] * b
        lo = prod & MASK
        hi = prod >> W
        for j in range(nl):
            t[i + j] = t[i + j] + lo[j]
            t[i + j + 1] = t[i + j + 1] + hi[j]
    for i in range(nl):
        m = ((t[i] & MASK) * fs.pinv) & MASK
        for j in range(nl):
            prod = m * int(fs.p_limbs[j])
            t[i + j] = t[i + j] + (prod & MASK)
            t[i + j + 1] = t[i + j + 1] + (prod >> W)
        t[i + 1] = t[i + 1] + (t[i] >> W)
    r = _carry_chain(t[nl : 2 * nl], nl)
    return _cond_sub_p(fs, r)


def _place(x, offset, ncols):
    """Pad x (k, ...) so its rows occupy columns [offset, offset+k) of ncols."""
    k = x.shape[0]
    cfg = [(offset, ncols - offset - k, 0)] + [(0, 0, 0)] * (x.ndim - 1)
    import jax.lax as lax

    return lax.pad(x, jnp.uint32(0), cfg)


def mont_mul(fs, a, b):
    """Montgomery product: (a * b * R^-1) mod p. a, b: (nl, ...) limb tensors.

    On TPU, large batches route to the Pallas VMEM kernel (HBM-bandwidth
    bound otherwise). The jnp fallback uses lax.pad placement (vector adds
    over the full column tensor) instead of per-column scalar updates — ~5x
    fewer traced ops, keeping fori_loop bodies tractable to compile.
    """
    nl = fs.nl
    batch = 1
    for d in jnp.broadcast_shapes(a.shape[1:], b.shape[1:]):
        batch *= d
    # Pallas wins only on large flat batches: one launch amortizes the kernel
    # dispatch. Small per-iteration muls (MSM bucket loops) stay on the fused
    # jnp path — hundreds of tiny pallas launches measured 10x slower.
    from . import pallas_field

    if pallas_field._STATE["in_kernel"]:
        # tracing inside a pallas kernel body: use the pad-free column core
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

        def _bc(x):
            extra = len(shape) - (x.ndim - 1)
            x = x.reshape((nl,) + (1,) * extra + x.shape[1:])
            return jnp.broadcast_to(x, (nl,) + shape)

        if _mxu_montmul():
            from .mxu_field import mont_mul_mxu_cols

            return mont_mul_mxu_cols(fs, _bc(a), _bc(b), shape)
        return _mont_mul_cols(fs, _bc(a), _bc(b), shape)
    if batch >= (1 << 15):
        if pallas_field.pallas_available():
            return pallas_field.mont_mul_pallas(fs, a, b)
    ncols = 2 * nl + 1
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

    def _bc(x):
        extra = len(shape) - (x.ndim - 1)
        x = x.reshape((nl,) + (1,) * extra + x.shape[1:])
        return jnp.broadcast_to(x, (nl,) + shape)

    a = _bc(a)
    b = _bc(b)
    if _cpu64_enabled():
        return _mont_mul_cpu64(fs, a, b)
    t = jnp.zeros((ncols,) + shape, dtype=jnp.uint32)

    # schoolbook product with 16-bit split accumulation
    for i in range(nl):
        prod = a[i] * b  # (nl, ...) uint32, exact
        t = t + _place(prod & MASK, i, ncols)
        t = t + _place(prod >> W, i + 1, ncols)

    # interleaved Montgomery reduction
    p_col = jnp.asarray(fs.p_limbs).reshape((nl,) + (1,) * len(shape))
    for i in range(nl):
        m = ((t[i] & MASK) * fs.pinv) & MASK
        prod = m[None] * p_col  # (nl, ...)
        t = t + _place(prod & MASK, i, ncols)
        t = t + _place(prod >> W, i + 1, ncols)
        t = t + _place((t[i] >> W)[None], i + 1, ncols)

    r = _carry_chain([t[j] for j in range(nl, 2 * nl)], nl)
    return _cond_sub_p(fs, r)


def mont_sqr(fs, a):
    return mont_mul(fs, a, a)


def mod_add(fs, a, b):
    s = a + b  # limbs < 2^17
    r = _carry_chain([s[j] for j in range(fs.nl)], fs.nl)
    return _cond_sub_p(fs, r)


def mod_sub(fs, a, b):
    borrow = jnp.zeros_like(a[0], dtype=jnp.int32)
    diff = []
    ai = a.astype(jnp.int32)
    bi = b.astype(jnp.int32)
    for j in range(fs.nl):
        d = ai[j] - bi[j] - borrow
        borrow = (d < 0).astype(jnp.int32)
        diff.append((d + (borrow << W)).astype(jnp.uint32))
    # where we borrowed past the top limb, add p back
    add_p = borrow.astype(jnp.uint32)
    carry = jnp.zeros_like(a[0])
    fixed = []
    for j in range(fs.nl):
        v = diff[j] + add_p * int(fs.p_limbs[j]) + carry
        fixed.append(v & MASK)
        carry = v >> W
    return jnp.stack(fixed, axis=0)


def mod_neg(fs, a):
    zero = jnp.zeros_like(a)
    r = mod_sub(fs, zero, a)
    is_zero = jnp.all(a == 0, axis=0, keepdims=True)
    return jnp.where(is_zero, zero, r)


def to_mont(fs, raw):
    """raw limbs (value < p) -> Montgomery form, on device."""
    r2 = np.array(
        [(fs.R2 >> (W * i)) & MASK for i in range(fs.nl)], dtype=np.uint32
    )
    return mont_mul(fs, raw, jnp.asarray(r2).reshape((fs.nl,) + (1,) * (raw.ndim - 1)))


def from_mont(fs, mont):
    """Montgomery form -> raw limbs, on device (multiply by 1)."""
    one = np.zeros(fs.nl, dtype=np.uint32)
    one[0] = 1
    return mont_mul(fs, mont, jnp.asarray(one).reshape((fs.nl,) + (1,) * (mont.ndim - 1)))


def mont_pow_static(fs, a, e: int):
    """a^e for a small static exponent (unrolled square-and-multiply)."""
    result = fs.one_mont_dev(a.shape[1:])
    base = a
    while e > 0:
        if e & 1:
            result = mont_mul(fs, result, base)
        base = mont_sqr(fs, base)
        e >>= 1
    return result


def mont_pow_int(fs, a, e: int):
    """a^e for a large static exponent via fori_loop (compact graph)."""
    nbits = e.bit_length()
    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32)
    )
    one = fs.one_mont_dev(a.shape[1:])

    def body(i, carry):
        result, base = carry
        cand = mont_mul(fs, result, base)
        result = jnp.where(bits[i][None] == 1, cand, result)
        base = mont_sqr(fs, base)
        return (result, base)

    result, _ = jax.lax.fori_loop(0, nbits, body, (one, a))
    return result


def mont_inv(fs, a):
    """Batched inversion via Fermat (a^(p-2)); a must be nonzero."""
    return mont_pow_int(fs, a, fs.p - 2)


def prefix_prod(fs, x):
    """Inclusive prefix product along the last axis of a (nl, n) limb tensor
    (Hillis–Steele scan: ceil(log2 n) full-width mont_muls, one per fori
    iteration so the graph stays one mont_mul instantiation deep)."""
    n = x.shape[-1]
    if n == 1:
        return x
    steps = (n - 1).bit_length()
    idx = jnp.arange(n)

    def body(k, a):
        sh = jnp.int32(1) << k
        rolled = jnp.roll(a, sh, axis=-1)
        cand = mont_mul(fs, a, rolled)
        cond = (idx >= sh).reshape((1,) * (a.ndim - 1) + (n,))
        return jnp.where(cond, cand, a)

    return jax.lax.fori_loop(0, steps, body, x)


def prefix_sum_mod(fs, x):
    """Inclusive prefix sum (mod p) along the last axis of a (nl, ..., n)
    limb tensor — the additive twin of prefix_prod (Hillis-Steele scan,
    ceil(log2 n) mod_adds)."""
    n = x.shape[-1]
    if n == 1:
        return x
    steps = (n - 1).bit_length()
    idx = jnp.arange(n)

    def body(k, a):
        sh = jnp.int32(1) << k
        rolled = jnp.roll(a, sh, axis=-1)
        cand = mod_add(fs, a, rolled)
        cond = (idx >= sh).reshape((1,) * (a.ndim - 1) + (n,))
        return jnp.where(cond, cand, a)

    return jax.lax.fori_loop(0, steps, body, x)


def sum_mod(fs, x, axis=-1):
    """Sum a limb tensor along `axis` (mod p) by folding in halves
    (log2(n) mod_adds; odd remainders fold via zero-padding)."""
    if axis < 0:
        axis += x.ndim
    n = x.shape[axis]
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(x, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(x, half, 2 * half, axis=axis)
        s = mod_add(fs, lo, hi)
        if n & 1:
            tail = jax.lax.slice_in_dim(x, 2 * half, n, axis=axis)
            s = jnp.concatenate([s, tail], axis=axis)
            n = half + 1
        else:
            n = half
        x = s
    return x


def mont_inv_batch(fs, x):
    """Batched inversion of a (nl, n) limb tensor along the last axis via the
    Montgomery product trick: two log-depth product scans + ONE Fermat
    inversion of the total + two full-width muls (~2 log2(n) + 3 mont_muls vs
    ~2·254 for per-lane Fermat). Zero lanes invert to zero (as `mont_inv`)."""
    n = x.shape[-1]
    if n == 1:
        return mont_inv(fs, x)
    is_zero = jnp.all(x == 0, axis=0)
    one_col = fs.one_mont_dev((1,))
    xs = jnp.where(is_zero[None], jnp.broadcast_to(one_col, x.shape), x)
    pre = prefix_prod(fs, xs)  # pre[i] = x_0 … x_i
    suf = jnp.flip(prefix_prod(fs, jnp.flip(xs, axis=-1)), axis=-1)
    tinv = mont_pow_int(fs, pre[:, -1:], fs.p - 2)  # (total product)^-1
    # inv(x_i) = pre[i-1] · suf[i+1] · total^-1
    pre_s = jnp.concatenate([one_col, pre[:, :-1]], axis=1)
    suf_s = jnp.concatenate([suf[:, 1:], one_col], axis=1)
    out = mont_mul(fs, mont_mul(fs, pre_s, suf_s), tinv)
    return jnp.where(is_zero[None], jnp.zeros_like(out), out)


def eq_zero(fs, a):
    return jnp.all(a == 0, axis=0)
