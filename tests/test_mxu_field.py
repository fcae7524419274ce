"""MXU-reduction Montgomery multiply (backend/mxu_field.py) vs host bigints.

Covers both the plain-XLA path and the Pallas kernel variant (interpret mode
exercises the exact kernel trace on CPU). Replaces the same arkworks role as
the CIOS kernels (reference src/bn254/polynomial.rs Montgomery backend).
"""

import random

import pytest

pytest.importorskip("jax")

from zksnake_tpu.constant import BN254_SCALAR_FIELD, BLS12_381_SCALAR_FIELD

BN254_FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583


@pytest.mark.parametrize(
    "p", [BN254_SCALAR_FIELD, BLS12_381_SCALAR_FIELD, BN254_FQ]
)
def test_mont_mul_mxu_matches_host(p):
    import numpy as np
    import jax.numpy as jnp

    from zksnake_tpu.backend.field import FieldSpec
    from zksnake_tpu.backend.mxu_field import mont_mul_mxu

    fs = FieldSpec.get(p)
    rng = random.Random(9)
    n = 129
    xs = [rng.randrange(p) for _ in range(n)]
    ys = [rng.randrange(p) for _ in range(n)]
    xs[0] = 0
    ys[1] = 0
    xs[2] = p - 1
    ys[2] = p - 1
    a = jnp.asarray(fs.to_mont_host(xs))
    b = jnp.asarray(fs.to_mont_host(ys))
    got = fs.from_mont_host(np.asarray(mont_mul_mxu(fs, a, b)))
    assert got == [x * y % p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("variant", ["cios", "mxu"])
def test_mont_mul_pallas_interpret(variant, monkeypatch):
    import numpy as np
    import jax.numpy as jnp

    monkeypatch.setenv("ZKSNAKE_PALLAS_INTERPRET", "1")
    from zksnake_tpu.backend.field import FieldSpec
    from zksnake_tpu.backend import pallas_field

    p = BN254_FQ
    fs = FieldSpec.get(p)
    rng = random.Random(10)
    n = 2048  # two grid blocks
    xs = [rng.randrange(p) for _ in range(n)]
    ys = [rng.randrange(p) for _ in range(n)]
    a = jnp.asarray(fs.to_mont_host(xs))
    b = jnp.asarray(fs.to_mont_host(ys))
    got = fs.from_mont_host(
        np.asarray(pallas_field.mont_mul_pallas(fs, a, b, variant=variant))
    )
    assert got == [x * y % p for x, y in zip(xs, ys)]
