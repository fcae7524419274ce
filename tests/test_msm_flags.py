"""Flag-gated MSM formulation parity (VERDICT r4 task 4).

The Pippenger bucket pipeline has two env-selected variants that must stay
promotable: ZKSNAKE_MSM_REMAINDER=1 (remainder-pass accumulation — no
duplicated lax.cond fallback pipeline, the G2 compile-pathology fix) and
ZKSNAKE_MSM_GATHER=rows (contiguous-row round-table gather). Each runs the
REAL pallas kernel trace through the interpreter on CPU against the host
scalar oracle, at deliberately tiny geometry (n=64, 32-bit scalars, c=5,
16-lane cap) so the cold XLA-CPU compile stays in minutes and warm runs
replay from the persistent cache in seconds.

Same reference role as arkworks VariableBaseMSM (reference
src/bn254/curve.rs:356-392), which has no equivalent knobs.
"""

import random

import pytest

pytest.importorskip("jax")


@pytest.mark.parametrize(
    "remainder,gather", [("1", "cols"), ("0", "rows")]
)
def test_msm_flag_variants_match_oracle(remainder, gather, monkeypatch):
    import numpy as np
    import jax
    import jax.numpy as jnp

    monkeypatch.setenv("ZKSNAKE_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("ZKSNAKE_MSM_REMAINDER", remainder)
    monkeypatch.setenv("ZKSNAKE_MSM_GATHER", gather)
    from zksnake_tpu.backend import msm as msm_mod
    from zksnake_tpu.backend.msm import msm_pippenger, _scalar_limbs
    from zksnake_tpu.backend.field import FieldSpec
    from zksnake_tpu.backend.curve_ops import get_group_spec
    from zksnake_tpu.curves import ec_bn254

    monkeypatch.setattr(msm_mod, "PALLAS_MSM_MIN", 1)
    monkeypatch.setattr(msm_mod, "PALLAS_LANE_CAP_G1", 16)
    curve = ec_bn254._curve
    gs = get_group_spec(curve, 1)
    fr = FieldSpec.get(curve.r)
    rng = random.Random(77)
    n = 64
    pts = [ec_bn254.g1() * rng.randrange(1, 1 << 20) for _ in range(n)]
    ss = [rng.randrange(1 << 31) for _ in range(n)]
    if remainder == "1":
        # 30 identical scalars make every window carry a 30-long bucket run,
        # past the static round budget (R = mean + slack = 24 at this
        # geometry) — so the remainder while_loop actually executes its
        # overflow rounds instead of tripping zero times
        for i in range(30):
            ss[i] = ss[0]
    P = gs.points_to_device(pts)
    slimbs = jnp.asarray(_scalar_limbs(ss, curve.r, fr.nl)[:2])
    res = jax.jit(lambda P, s: msm_pippenger(gs, P, s, 5))(P, slimbs)
    got = gs.points_from_device(
        jax.tree_util.tree_map(lambda t: np.asarray(t)[..., None], res),
        ec_bn254.PointG1,
    )[0]
    want = None
    for pt, s in zip(pts, ss):
        term = pt * s
        want = term if want is None else want + term
    assert got == want


def test_g2_msm_dna_route_matches_oracle(monkeypatch):
    """ZKSNAKE_G2_MSM=dna — the double-and-add route the TPU backend uses
    for G2 (the G2 Pippenger module is a remote-compiler pathology; see
    backend/msm.py::_g2_route_dna). n=6 also exercises the identity-pad to
    the next power of two inside _msm_dna."""
    import numpy as np
    import jax

    monkeypatch.setenv("ZKSNAKE_G2_MSM", "dna")
    import jax.numpy as jnp

    from zksnake_tpu.backend.msm import msm_device_raw, _scalar_limbs
    from zksnake_tpu.backend.field import FieldSpec
    from zksnake_tpu.backend.curve_ops import get_group_spec
    from zksnake_tpu.curves import ec_bn254

    curve = ec_bn254._curve
    gs = get_group_spec(curve, 2)
    fr = FieldSpec.get(curve.r)
    rng = random.Random(21)
    n = 6
    pts = [ec_bn254.g2() * rng.randrange(1, 1 << 16) for _ in range(n)]
    ss = [rng.randrange(1 << 15) for _ in range(n)]
    P = gs.points_to_device(pts)
    slimbs = jnp.asarray(_scalar_limbs(ss, curve.r, fr.nl)[:1])
    res = msm_device_raw(gs, P, slimbs)
    got = gs.points_from_device(
        jax.tree_util.tree_map(lambda t: np.asarray(t)[..., None], res),
        ec_bn254.PointG2,
    )[0]
    want = None
    for pt, s in zip(pts, ss):
        term = pt * s
        want = term if want is None else want + term
    assert got == want
