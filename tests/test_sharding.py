"""Multi-chip sharding regression tests on an 8-virtual-CPU-device mesh
(SURVEY.md §4: CPU-mesh tests via xla_force_host_platform_device_count).

ALL collective paths run in the default suite — sharded G1 AND G2 MSM
(all_gather partial combine), the identity-padding case, the four-step NTT
(all_to_all transpose), and a small sharded end-to-end Groth16 prove —
so multi-chip correctness evidence never depends on a single driver
dryrun (the round-2 failure mode). Sizes are chosen so every graph is
fori-loop-bounded: cold XLA-CPU compiles stay in the minutes range and
warm runs replay from the persistent cache in seconds.
"""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from zksnake_tpu.backend.field import FieldSpec
from zksnake_tpu.backend.msm import _scalar_limbs
from zksnake_tpu.backend.curve_ops import get_group_spec
from zksnake_tpu.backend.sharding import (
    make_mesh,
    sharded_msm_fn,
    sharded_ntt_fn,
    fourstep_input_layout,
    fourstep_output_to_natural,
    pad_msm_operands,
)
from zksnake_tpu.curves import ec_bn254

NDEV = 8


def _mesh():
    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        pytest.skip("no CPU backend")
    if len(cpus) < NDEV:
        pytest.skip(f"need {NDEV} virtual CPU devices, have {len(cpus)}")
    return make_mesh(n_devices=NDEV, devices=cpus)


@pytest.mark.parametrize("group", [1, 2], ids=["G1", "G2"])
def test_sharded_msm_matches_host(group):
    mesh = _mesh()
    curve = ec_bn254._curve
    fr = FieldSpec.get(curve.r)
    gs = get_group_spec(curve, group)
    G = ec_bn254.g1() if group == 1 else ec_bn254.g2()
    rng = random.Random(77 + group)

    n = 4 * NDEV
    pts = [G * rng.randrange(1, 1 << 16) for _ in range(n)]
    ss = [rng.randrange(1 << 31) for _ in range(n)]
    P = gs.points_to_device(pts)
    # 32-bit scalars keep the double-and-add trip count low; the kernel and
    # the collective plumbing are identical to full-width scalars
    slimbs = jnp.asarray(_scalar_limbs(ss, curve.r, fr.nl)[:2])

    res = jax.jit(sharded_msm_fn(gs, mesh))(P, slimbs)
    got = gs.points_from_device(
        jax.tree_util.tree_map(lambda t: np.asarray(t)[..., None], res), type(G)
    )[0]

    want = None
    for pt, s in zip(pts, ss):
        term = pt * s
        want = term if want is None else want + term
    assert got == want


def test_sharded_msm_identity_padding():
    """pad_msm_operands: identity points / zero scalars change nothing."""
    mesh = _mesh()
    curve = ec_bn254._curve
    fr = FieldSpec.get(curve.r)
    gs = get_group_spec(curve, 1)
    G = ec_bn254.g1()
    rng = random.Random(99)

    n = 3 * NDEV + 5  # NOT divisible by the mesh
    pts = [G * rng.randrange(1, 1 << 16) for _ in range(n)]
    ss = [rng.randrange(1 << 31) for _ in range(n)]
    P = gs.points_to_device(pts)
    slimbs = jnp.asarray(_scalar_limbs(ss, curve.r, fr.nl)[:2])
    Pp, sp = pad_msm_operands(gs, P, slimbs, NDEV)
    assert sp.shape[1] % NDEV == 0

    res = jax.jit(sharded_msm_fn(gs, mesh))(Pp, sp)
    got = gs.points_from_device(
        jax.tree_util.tree_map(lambda t: np.asarray(t)[..., None], res), type(G)
    )[0]
    want = None
    for pt, s in zip(pts, ss):
        term = pt * s
        want = term if want is None else want + term
    assert got == want


def test_sharded_fourstep_ntt_matches_host():
    mesh = _mesh()
    curve = ec_bn254._curve
    fr = FieldSpec.get(curve.r)
    from zksnake_tpu.backend.ntt import Domain

    rng = random.Random(31)
    n1 = n2 = 2 * NDEV
    n = n1 * n2
    dom = Domain.get(curve, n)
    coeffs = [rng.randrange(curve.r) for _ in range(n)]
    x = jnp.asarray(fourstep_input_layout(fr, coeffs, n1, n2))
    out = jax.jit(sharded_ntt_fn(dom, mesh, n1))(x)
    got = fourstep_output_to_natural(fr, out, n1, n2)

    from zksnake_tpu.polynomial import _HostDomain

    want = _HostDomain.get(curve.r, n).fft([c % curve.r for c in coeffs])
    assert got == want


def test_sharded_groth16_prove_verifies(monkeypatch):
    """End-to-end: Groth16(mesh=...) proves over the 8-device mesh (five
    sharded MSMs, G2 included) and the proof verifies."""
    from zksnake_tpu.backend import config as _cfg

    monkeypatch.setattr(_cfg, "_DISABLE", False)
    monkeypatch.setattr(_cfg, "NTT_DEVICE_THRESHOLD", 1)

    from zksnake_tpu.arithmetization import ConstraintSystem, R1CS, Var
    from zksnake_tpu.constant import BN254_SCALAR_FIELD
    from zksnake_tpu.groth16 import Groth16

    n_power = 48  # mult-chain out = inp^(2^k) shape, benchmark_groth16.py
    inp, out = Var("inp"), Var("out")
    v = [Var(f"v{i}") for i in range(n_power - 1)]
    cs = ConstraintSystem(["inp"], ["out"], BN254_SCALAR_FIELD)
    cs.add_constraint(v[0] == inp * inp)
    for i in range(1, n_power - 1):
        cs.add_constraint(v[i] == v[i - 1] * inp)
    cs.add_constraint(out == v[n_power - 2])
    cs.set_public(out)
    r1cs = R1CS(cs)
    r1cs.compile()
    pub, priv = r1cs.generate_witness(cs.solve({"inp": 2}))

    mesh = _mesh()
    g16 = Groth16(r1cs, "BN254", mesh=mesh)
    g16.setup()
    proof = g16.prove(pub, priv)
    assert g16.verify(proof, pub)
