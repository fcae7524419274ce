"""Device folds for multilinear extensions.

Replaces the reference's rayon-parallel MLE fix-variables
(/root/reference/src/bn254/mle.rs:86 `partial_evaluate`) with strided tensor
folds on device (SURVEY.md §7 maps MLE partial-eval to exactly this): fixing
variable 0 (the LSB of the evaluation index) maps the dense table to

    new[k] = old[2k] + r * (old[2k+1] - old[2k])

which is one mod_sub + mont_mul + mod_add over even/odd stride views — a
single fused elementwise kernel per variable, halving the table each time.

The host sparse dict-walk (polynomial.SparseMultilinearPolynomial) remains
the path for genuinely sparse tables (it is O(nnz)); this module wins when
the table is dense enough that O(2^nv) vector lanes beat O(nnz) host bigint
ops. Dispatch lives in SparseMultilinearPolynomial.partial_evaluate.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .field import FieldSpec, mod_add, mod_sub, mont_mul

_FOLD_KERNELS = {}


def _fold_kernel(fs, size, k):
    """jitted: fold the first k variables of a (nl, size) Montgomery table."""
    key = (fs.p, size, k)
    if key not in _FOLD_KERNELS:

        def kernel(table, rs):
            # rs: (nl, k) Montgomery challenges, one per folded variable
            for j in range(k):
                lo = table[:, 0::2]
                hi = table[:, 1::2]
                step = mont_mul(fs, rs[:, j : j + 1], mod_sub(fs, hi, lo))
                table = mod_add(fs, lo, step)
            return table

        _FOLD_KERNELS[key] = jax.jit(kernel)
    return _FOLD_KERNELS[key]


def partial_evaluate_device(p, num_vars, evals_dict, points):
    """Fix the first len(points) variables of a sparse MLE on device.

    Returns the folded table as a dense list of ints (caller re-sparsifies).
    """
    fs = FieldSpec.get(p)
    size = 1 << num_vars
    dense = [0] * size
    for idx, v in evals_dict.items():
        dense[idx] = v
    table = jnp.asarray(fs.to_mont_host(dense))
    rs = jnp.asarray(fs.to_mont_host([int(r) % p for r in points]))
    out = _fold_kernel(fs, size, len(points))(table, rs)
    return fs.from_mont_host(np.asarray(out))


def should_use_device(num_vars, nnz, k):
    """Dense fold wins only when the table is big AND reasonably dense:
    the host walk is O(nnz * k) bigint ops, the device path is O(2^nv)
    lanes + transfer. Guard against densifying huge sparse selector MLEs."""
    from . import config

    if not config.jax_available() or k == 0:
        return False
    size = 1 << num_vars
    if size > (1 << 24):  # never materialize >16M-entry tables
        return False
    return size >= config.MLE_DEVICE_THRESHOLD and nnz * 16 >= size


# ------------------------------------------------------------------
# Device-resident sumcheck round driver
#
# The host sumcheck prover called partial_evaluate once per domain point per
# round (4 dense-table device->host round trips x num_vars rounds; reference
# role: mle.rs:86 + subprotocol/sumcheck.py:49-58). This driver keeps ONE
# Montgomery table on device for the whole protocol: each round needs only
# the two half-sums S0 = sum T[0::2], S1 = sum T[1::2] (a plain MLE's round
# polynomial is linear: g(x) = S0 + x*(S1 - S0), so the 4-point evaluations
# the transcript absorbs are derived on host from two scalars), and each
# challenge folds the table in place with one fused mul/add.
# ------------------------------------------------------------------

# instrumentation: device rounds/folds executed (tests assert the path ran)
SUMCHECK_DEVICE_ROUNDS = 0


class DeviceSumcheckTable:
    def __init__(self, p, num_vars, evals_dict):
        self.fs = FieldSpec.get(p)
        self.p = p
        self.num_vars = num_vars
        size = 1 << num_vars
        dense = [0] * size
        for idx, v in evals_dict.items():
            dense[idx] = v
        self._table = jnp.asarray(self.fs.to_mont_host(dense))
        self._kernels = {}

    def _round_kernel(self, m):
        """jitted: (nl, m) table -> (S0, S1) Montgomery scalars (nl, 1).
        Log-depth roll reduction: one mod_add instantiation."""
        fs = self.fs
        if m not in self._kernels:

            def kernel(table):
                halves = jnp.stack(
                    [table[:, 0::2], table[:, 1::2]], axis=1
                )  # (nl, 2, m//2)
                k = m // 2
                levels = max(k.bit_length() - 1, 0)

                def body(i, T):
                    h = jnp.int32(k) >> (i + 1)
                    Q = jnp.roll(T, -h, axis=-1)
                    return mod_add(fs, T, Q)

                # roll-based recursive doubling leaves the total in lane 0
                # (k is a power of two: num_vars >= 1 tables)
                T = jax.lax.fori_loop(0, levels, body, halves)
                return T[:, 0, :1], T[:, 1, :1]

            self._kernels[m] = jax.jit(kernel)
        return self._kernels[m]

    def round_sums(self):
        """Host ints (S0, S1) for the current variable."""
        global SUMCHECK_DEVICE_ROUNDS
        SUMCHECK_DEVICE_ROUNDS += 1
        m = self._table.shape[1]
        s0, s1 = self._round_kernel(m)(self._table)
        return (
            self.fs.from_mont_host(np.asarray(s0))[0],
            self.fs.from_mont_host(np.asarray(s1))[0],
        )

    def fold(self, r):
        """Fix the current first variable to challenge r (in-place)."""
        m = self._table.shape[1]
        rs = jnp.asarray(self.fs.to_mont_host([int(r) % self.p]))
        self._table = _fold_kernel(self.fs, m, 1)(self._table, rs)


def sumcheck_driver(p, num_vars, evals_dict):
    """DeviceSumcheckTable when the table is device-worthy, else None."""
    if not should_use_device(num_vars, len(evals_dict) or 1, 1):
        return None
    return DeviceSumcheckTable(p, num_vars, evals_dict)
