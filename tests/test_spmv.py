"""Wide-accumulation regression tests for the device SpMV reduction.

Round-3 postmortem: reduce_wide's fixed two-folds-then-one-subtract only
bounds the value for segment sums of a few hundred terms; a ~4000-term
column (any high-fanout circuit variable, e.g. `inp` in the mult-chain
benchmark) silently truncated excess above 2^(16*nl) and produced a wrong
K column in every Groth16 proving key at 2^12+ constraints. Separately,
uint32 limb accumulation in segment_sum overflows outright beyond 2^16
terms per segment (2^17-constraint circuits). These tests pin both fixes
with host-bigint oracles.
"""

import random

import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zksnake_tpu.backend.field import FieldSpec, mont_mul
from zksnake_tpu.backend.spmv import (
    DeviceSparseMatrix,
    reduce_wide,
    segment_sum_field,
)

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617


def _one_column_sum(k):
    fs = FieldSpec.get(P)
    rng = random.Random(1000 + k)
    vals = [rng.randrange(1, P) for _ in range(k)]
    vecv = [rng.randrange(1, P) for _ in range(k)]
    mat = DeviceSparseMatrix(fs, [(i, 0, vals[i]) for i in range(k)], k, 1)
    vec = jnp.asarray(fs.to_mont_host(vecv))
    terms = mont_mul(fs, mat.vals, vec[:, mat.rows])
    got = fs.from_mont_host(
        np.asarray(segment_sum_field(fs, terms, mat.cols, 1))
    )[0]
    want = sum(v * w for v, w in zip(vals, vecv)) % P
    assert got == want, f"wrong {k}-term segment sum"


@pytest.mark.parametrize("k", [17, 511, 4096])
def test_high_fanout_segment_sum(k):
    _one_column_sum(k)


def test_segment_sum_past_u32_headroom():
    """> 2^16 terms in one segment: the chunked combine path."""
    _one_column_sum((1 << 16) + 77)


def test_reduce_wide_extreme_columns():
    """Saturated lazy columns (every entry 2^32 - 1): worst-case excess."""
    from zksnake_tpu.backend.limbs import limbs_to_ints

    fs = FieldSpec.get(P)
    top = (1 << 32) - (1 << 16)  # reduce_wide's documented entry bound
    for ncols in (fs.nl, 2 * fs.nl + 1):
        c = jnp.full((ncols, 3), top, jnp.uint32)
        # raw integer residue check (no Montgomery conversion involved)
        got = limbs_to_ints(np.asarray(reduce_wide(fs, c)).T)
        want = sum(top << (16 * j) for j in range(ncols)) % P
        assert got == [want] * 3
