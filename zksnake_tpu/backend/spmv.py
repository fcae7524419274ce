"""Device sparse matrix-vector products over the scalar field.

Replaces the reference's pure-Python `SparseArray.dot` bignum loop — the QAP
hot path flagged in SURVEY.md section 3.3 ("an easy, early win") — with a
jitted kernel: gather witness limbs by column, Montgomery-multiply by the
matrix values, and segment-sum per row. Limb segment sums run in raw uint32
(each limb < 2^16, so up to 2^16 terms fit without overflow) followed by a
wide reduction back below p.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .field import FieldSpec, mont_mul
from .limbs import MASK, W


class DeviceSparseMatrix:
    """COO triplets prepared for the device SpMV: row-sorted indices and
    Montgomery-form values."""

    def __init__(self, fs: FieldSpec, triplets, n_row, n_col):
        self.fs = fs
        self.n_row = n_row
        self.n_col = n_col
        trip = sorted(triplets, key=lambda t: t[0])
        self.rows = jnp.asarray(np.array([t[0] for t in trip], dtype=np.int32))
        self.cols = jnp.asarray(np.array([t[1] for t in trip], dtype=np.int32))
        self.vals = jnp.asarray(fs.to_mont_host([t[2] for t in trip]))
        self.nnz = len(trip)

    @classmethod
    def from_sparse_array(cls, fs, sa):
        return cls(fs, sa.triplets, sa.n_row, sa.n_col)


def reduce_wide(fs: FieldSpec, cols):
    """(ncols, ...) uint32 lazy columns (each <= 2^32 - 2^16, weight
    2^(16 j)) -> (nl, ...) canonical limbs < p. The entry bound keeps the
    carry chain's `col + carry` additions from wrapping uint32; a
    2^16-term segment sum of 16-bit limbs sits exactly on it.

    Folds the excess above R = 2^(16 nl) back with R mod p. Each fold
    shrinks the excess by ~R / (R mod p), so the fold count is computed
    from the worst-case input magnitude — the old fixed two-folds-then-
    one-subtract silently truncated leftover excess for segment sums of
    more than a few hundred terms (any circuit with a high-fanout
    variable got a wrong K column in its proving key). The tail value
    < R + 2p is finished by conditional subtracts of p on nl+1 limbs."""
    nl = fs.nl
    r_mod_p = fs.R  # FieldSpec.R is stored reduced: 2^(16*nl) mod p
    r_limbs = np.array([(r_mod_p >> (W * i)) & MASK for i in range(nl)], np.uint32)

    def fold(c):
        # normalize to 16-bit limbs first (value may exceed nl limbs)
        ncols = c.shape[0]
        out = []
        carry = jnp.zeros_like(c[0])
        for j in range(ncols):
            v = c[j] + carry
            out.append(v & MASK)
            carry = v >> W
        out.append(carry)
        lo = out[:nl]
        hi = out[nl:]
        # value = lo + hi * 2^(16nl) == lo + hi * (R mod p)   (mod p)
        acc = list(lo) + [jnp.zeros_like(c[0])] * (len(hi) + 1)
        for k, h in enumerate(hi):
            for j in range(nl):
                prod = h * int(r_limbs[j])
                acc[k + j] = acc[k + j] + (prod & MASK)
                acc[k + j + 1] = acc[k + j + 1] + (prod >> W)
        return jnp.stack(acc[: nl + len(hi) + 1], axis=0)

    ncols0 = cols.shape[0]
    # value < ncols * 2^32 * 2^(16 (ncols-1))
    value_bits = 32 + W * (ncols0 - 1) + ncols0.bit_length()
    excess_bits = max(value_bits - W * nl, 1)
    shrink = max(W * nl - r_mod_p.bit_length(), 1)  # bits gained per fold
    folds = max(2, -(-excess_bits // shrink) + 1)
    c = cols
    for _ in range(folds):
        c = fold(c)
    # excess is now at most ~2 units of (R mod p): value < R + 2p fits
    # nl+1 limbs after a carry chain (higher limbs are provably zero)
    out = []
    carry = jnp.zeros_like(c[0])
    for j in range(c.shape[0]):
        v = c[j] + carry
        out.append(v & MASK)
        carry = v >> W
    out.append(carry)
    wide = jnp.stack(out[: nl + 1], axis=0)
    p_wide = [int(x) for x in fs.p_limbs] + [0]
    n_sub = (1 << (W * nl)) // fs.p + 2
    for _ in range(n_sub):
        borrow = jnp.zeros_like(wide[0], dtype=jnp.int32)
        diff = []
        wi = wide.astype(jnp.int32)
        for j in range(nl + 1):
            d = wi[j] - jnp.int32(p_wide[j]) - borrow
            borrow = (d < 0).astype(jnp.int32)
            diff.append((d + (borrow << W)).astype(jnp.uint32))
        ge = borrow == 0  # wide >= p
        wide = jnp.where(ge[None], jnp.stack(diff, axis=0), wide)
    return wide[:nl]


# uint32 headroom: at most 2^16 terms of (2^16 - 1)-bounded limbs
SEG_SUM_CHUNK = 1 << 16


def segment_sum_field(fs, terms, ids, num_segments, indices_are_sorted=True):
    """Per-segment field sum of Montgomery terms (nl, k) -> (nl, segments),
    canonical (< p). uint32 limb accumulation overflows beyond 2^16 terms
    in one segment (hit by high-fanout columns at 2^17+ constraints), so
    the term axis is summed in <= 2^16-row chunks with a modular combine."""
    from .field import mod_add

    k = terms.shape[1]
    out = None
    for s in range(0, max(k, 1), SEG_SUM_CHUNK):
        part = jax.ops.segment_sum(
            terms[:, s : s + SEG_SUM_CHUNK].T,
            ids[s : s + SEG_SUM_CHUNK],
            num_segments=num_segments,
            indices_are_sorted=indices_are_sorted,
        )
        red = reduce_wide(fs, part.T)
        out = red if out is None else mod_add(fs, out, red)
    return out