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


import os

heavy = pytest.mark.skipif(
    os.environ.get("ZKSNAKE_DEVICE_TESTS", "0") != "1",
    reason="interpret-mode Pippenger compile is minutes on this 2-CPU box",
)


@heavy
@pytest.mark.parametrize("mxu", ["0", "1"])
def test_pallas_bucket_msm_interpret(mxu, monkeypatch):
    """Pippenger MSM through the Pallas bucket-accumulate kernel (interpret
    mode), with and without the MXU montmul formulation."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    monkeypatch.setenv("ZKSNAKE_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("ZKSNAKE_MXU_MONTMUL", mxu)
    from zksnake_tpu.backend import msm as msm_mod
    from zksnake_tpu.backend.msm import msm_pippenger, _scalar_limbs
    from zksnake_tpu.backend.field import FieldSpec
    from zksnake_tpu.backend.curve_ops import get_group_spec
    from zksnake_tpu.curves import ec_bn254

    monkeypatch.setattr(msm_mod, "PALLAS_MSM_MIN", 1)
    # G=1 keeps the traced graph one window deep (tractable CPU compile)
    monkeypatch.setattr(msm_mod, "PALLAS_LANE_CAP_G1", 64)
    curve = ec_bn254._curve
    gs = get_group_spec(curve, 1)
    fr = FieldSpec.get(curve.r)
    rng = random.Random(77)
    n = 128
    pts = [ec_bn254.g1() * rng.randrange(1, 1 << 20) for _ in range(n)]
    ss = [rng.randrange(curve.r) for _ in range(n)]
    P = gs.points_to_device(pts)
    slimbs = jnp.asarray(_scalar_limbs(ss, curve.r, fr.nl))
    res = jax.jit(lambda P, s: msm_pippenger(gs, P, s, 7))(P, slimbs)
    got = gs.points_from_device(
        jax.tree_util.tree_map(lambda t: np.asarray(t)[..., None], res),
        ec_bn254.PointG1,
    )[0]
    want = None
    for pt, s in zip(pts, ss):
        term = pt * s
        want = term if want is None else want + term
    assert got == want
