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
