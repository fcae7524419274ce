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

from .field import FieldSpec, mont_mul, _carry_chain, _cond_sub_p
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
    """(nl + extra, ...) uint32 lazy columns (each < 2^32) -> (nl, ...) < p.

    Folds the overflow above 2^(16*nl) back with the precomputed
    2^(16*nl) mod p, twice, then a final conditional subtract."""
    nl = fs.nl
    r_mod_p = fs.R % fs.p  # 2^(16*nl) mod p
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

    c = cols
    # two folds bring any (nl+small)-limb value under ~nl limbs + small carry
    c = fold(c)
    c = fold(c)
    r = _carry_chain([c[j] for j in range(fs.nl)], fs.nl)
    # after two folds the value is < 2p (hi contribution < p/2^15)
    return _cond_sub_p(fs, r)