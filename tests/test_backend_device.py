"""Device-backend correctness tests (opt-in: set ZKSNAKE_DEVICE_TESTS=1).

Opt-in because first-time kernel compiles and TPU-session claims can take
minutes on a shared chip; the same kernels are exercised continuously by
bench.py and __graft_entry__.dryrun_multichip. Run with:

    ZKSNAKE_DEVICE_TESTS=1 python -m pytest tests/test_backend_device.py -q
"""

import os
import random

import pytest

if os.environ.get("ZKSNAKE_DEVICE_TESTS", "0") != "1":
    pytest.skip(
        "device tests are opt-in (ZKSNAKE_DEVICE_TESTS=1)", allow_module_level=True
    )

import numpy as np
import jax
import jax.numpy as jnp

from zksnake_tpu.backend import config as _cfg

_cfg.jax_available()

from zksnake_tpu.backend.field import FieldSpec, mont_mul, mod_add, mod_sub, mont_inv
from zksnake_tpu.backend.ntt import Domain, ntt_device, intt_device
from zksnake_tpu.backend.msm import msm_device, batch_mul_device
from zksnake_tpu.curves import ec_bn254, ec_bls12_381

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617


def test_field_ops_device():
    fs = FieldSpec.get(P)
    random.seed(2)
    xs = [random.randrange(P) for _ in range(64)]
    ys = [random.randrange(P) for _ in range(64)]
    a = jnp.asarray(fs.to_mont_host(xs))
    b = jnp.asarray(fs.to_mont_host(ys))
    assert fs.from_mont_host(np.asarray(jax.jit(lambda a, b: mont_mul(fs, a, b))(a, b))) == [
        x * y % P for x, y in zip(xs, ys)
    ]
    assert fs.from_mont_host(np.asarray(jax.jit(lambda a, b: mod_add(fs, a, b))(a, b))) == [
        (x + y) % P for x, y in zip(xs, ys)
    ]
    assert fs.from_mont_host(np.asarray(jax.jit(lambda a, b: mod_sub(fs, a, b))(a, b))) == [
        (x - y) % P for x, y in zip(xs, ys)
    ]
    assert fs.from_mont_host(np.asarray(jax.jit(lambda a: mont_inv(fs, a))(a))) == [
        pow(x, -1, P) for x in xs
    ]


def test_ntt_device_roundtrip():
    from zksnake_tpu.polynomial import _HostDomain

    curve = ec_bn254._curve
    fs = FieldSpec.get(curve.r)
    dom = Domain.get(curve, 1 << 10)
    random.seed(3)
    coeffs = [random.randrange(curve.r) for _ in range(1 << 10)]
    x = jnp.asarray(fs.to_mont_host(coeffs))
    evals = jax.jit(lambda x: ntt_device(dom, x))(x)
    host = _HostDomain.get(curve.r, 1 << 10)
    assert fs.from_mont_host(np.asarray(evals)) == host.fft(coeffs)
    back = jax.jit(lambda x: intt_device(dom, x))(evals)
    assert fs.from_mont_host(np.asarray(back)) == coeffs


@pytest.mark.parametrize(
    "mod,grp", [(ec_bn254, 1), (ec_bn254, 2), (ec_bls12_381, 1)]
)
def test_msm_device(mod, grp):
    random.seed(4)
    G = mod.g1() if grp == 1 else mod.g2()
    n = 50
    pts = [G * random.randrange(1, 1 << 30) for _ in range(n)]
    pts[3] = type(G).identity()
    ss = [random.randrange(mod._curve.r) for _ in range(n)]
    ss[7] = 0
    want = type(G).identity()
    for pt, s in zip(pts, ss):
        want = want + pt * s
    got = msm_device(mod._curve, grp, pts, ss, type(G))
    assert got == want
    got_b = batch_mul_device(mod._curve, grp, pts[:5], ss[:5], type(G))
    assert got_b == [pt * s for pt, s in zip(pts[:5], ss[:5])]


@pytest.mark.parametrize("mod,grp", [(ec_bn254, 1), (ec_bn254, 2)])
def test_fixed_base_batch_mul(mod, grp):
    from zksnake_tpu.backend.msm import batch_mul_fixed_base

    random.seed(9)
    G = mod.g1() if grp == 1 else mod.g2()
    ss = [random.randrange(mod._curve.r) for _ in range(33)] + [0, 1, mod._curve.r - 1]
    got = batch_mul_fixed_base(mod._curve, grp, G, ss, type(G))
    assert got == [G * s for s in ss]


def test_signed_window_digits():
    from zksnake_tpu.backend.msm import _scalar_limbs, _signed_window_digits

    curve = ec_bn254._curve
    fs = FieldSpec.get(curve.r)
    random.seed(5)
    scalars = [random.randrange(curve.r) for _ in range(32)] + [0, 1, curve.r - 1]
    slimbs = jnp.asarray(_scalar_limbs(scalars, curve.r, fs.nl))
    nbits = fs.nl * 16
    for c in (7, 11, 13):
        digs = np.asarray(_signed_window_digits(slimbs, c, nbits))
        half = 1 << (c - 1)
        assert digs.max() <= half and digs.min() >= -(half - 1)
        for j, s in enumerate(scalars):
            v = 0
            for w in range(digs.shape[0]):
                v = (v << c) + int(digs[w, j])
            assert v == s


@pytest.mark.parametrize("mod,grp", [(ec_bn254, 1), (ec_bls12_381, 2)])
def test_add_affine_matches_add(mod, grp):
    from zksnake_tpu.backend.curve_ops import get_group_spec

    random.seed(6)
    G = mod.g1() if grp == 1 else mod.g2()
    gs = get_group_spec(mod._curve, grp)
    # P arbitrary projective (result of prior adds), Q affine; includes the
    # complete-formula edge cases P = identity, P = Q, P = -Q
    qs = [G * k for k in (1, 2, 3, 5, 3)]
    ps = [G * 7 + G * 2, type(G).identity(), G * 2, G * 5, -(G * 3)]
    Pd = gs.points_to_device(ps)
    Qd = gs.points_to_device(qs)
    # make P actually projective by running it through a device add
    Pd = gs.add(Pd, gs.identity((len(ps),)))
    res = jax.jit(lambda P, Q: gs.add_affine(P, (Q[0], Q[1])))(Pd, Qd)
    got = gs.points_from_device(res, type(G))
    want = [p + q for p, q in zip(ps, qs)]
    assert got == want


def test_plonk_device_prover(monkeypatch):
    """Fused device PlonK prover (backend/plonk_device.py) runs all five
    rounds on device and produces byte-identical proofs to the host prover
    under the same blinding draw."""
    monkeypatch.setattr(_cfg, "PLONK_DEVICE_THRESHOLD", 1)
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_plonk import _build_cs
    from zksnake_tpu.arithmetization.plonkish import Plonkish
    from zksnake_tpu.constant import BN254_SCALAR_FIELD
    from zksnake_tpu.plonk import Plonk, Proof

    cs = _build_cs(BN254_SCALAR_FIELD)
    plonkish = Plonkish(cs)
    plonkish.compile()
    pub, priv = plonkish.generate_witness(plonkish.solve({"x": 3}))
    plonk = Plonk(plonkish)
    plonk.setup()

    blinds = [0xB11D + 17 * i for i in range(11)]
    host_proof = plonk._prove_with_blinding(pub, priv, blinds, force_host=True)
    dev_proof = plonk._prove_with_blinding(pub, priv, blinds)
    assert plonk._dev_prover is not None  # device path actually ran
    assert dev_proof.to_bytes() == host_proof.to_bytes()
    assert plonk.verify(Proof.from_bytes(dev_proof.to_bytes()), pub)


def test_mle_device_fold_matches_host(monkeypatch):
    """Device strided MLE fold (backend/mle.py) matches the host dict walk."""
    from zksnake_tpu.backend import config as _c
    from zksnake_tpu.polynomial import MultilinearPolynomial

    monkeypatch.setattr(_c, "MLE_DEVICE_THRESHOLD", 1)
    random.seed(12)
    nv = 6
    entries = [(i, random.randrange(P)) for i in range(1 << nv) if i % 3]
    mle = MultilinearPolynomial(nv, entries, P)
    points = [random.randrange(P) for _ in range(3)]

    dev = mle.partial_evaluate(points)

    monkeypatch.setattr(_c, "MLE_DEVICE_THRESHOLD", 1 << 62)  # force host
    host = mle.partial_evaluate(points)
    assert dev.num_vars == host.num_vars and dev.evals == host.evals
    assert mle.evaluate(points + [random.randrange(P) for _ in range(nv - 3)]) is not None


def test_prefix_prod_and_batch_inv():
    from zksnake_tpu.backend.field import prefix_prod, mont_inv_batch

    fs = FieldSpec.get(P)
    random.seed(11)
    xs = [random.randrange(1, P) for _ in range(37)]
    xs[5] = 0  # zero lane must invert to zero without breaking the scan
    a = jnp.asarray(fs.to_mont_host(xs))
    got = fs.from_mont_host(np.asarray(jax.jit(lambda a: prefix_prod(fs, a))(a)))
    want = []
    acc = 1
    for x in xs:
        acc = acc * x % P
        want.append(acc)
    assert got == want
    inv = fs.from_mont_host(
        np.asarray(jax.jit(lambda a: mont_inv_batch(fs, a))(a))
    )
    assert inv == [pow(x, -1, P) if x else 0 for x in xs]


def test_groth16_device_setup_matches_host(monkeypatch):
    """Device trusted setup (tau-power scan, Lagrange batch inversion, L/R/O
    transpose-SpMV, fixed-base MSMs) produces byte-identical keys to the host
    reference loop, and its device-cached PK proves/verifies e2e."""
    monkeypatch.setattr(_cfg, "NTT_DEVICE_THRESHOLD", 1)
    from zksnake_tpu.constant import BN254_SCALAR_FIELD
    from zksnake_tpu.arithmetization import Var, ConstraintSystem, R1CS
    from zksnake_tpu.groth16 import Groth16

    x = Var("x")
    y = Var("y")
    v1 = Var("v1")
    cs = ConstraintSystem(["x"], ["y"], BN254_SCALAR_FIELD)
    cs.add_constraint(v1 == x * x)
    cs.add_constraint(y - 5 - x == v1 * x)
    cs.set_public(y)
    r1cs = R1CS(cs)
    r1cs.compile()
    pub, priv = r1cs.generate_witness(r1cs.solve({"x": 3}))

    waste = (0xA11CE, 0xB0B, 0xCAFE, 0xD00D, 0xE66)
    host = Groth16(r1cs)
    host._setup_from_waste(*waste, force_host=True)
    dev = Groth16(r1cs)
    dev._setup_from_waste(*waste)
    assert dev._device_prover is not None  # device path actually ran
    assert dev._device_prover._pk_dev is not None  # PK stayed device-resident
    assert dev.proving_key.to_bytes() == host.proving_key.to_bytes()
    assert dev.verifying_key.to_bytes() == host.verifying_key.to_bytes()

    proof = dev.prove(pub, priv)
    assert dev.verify(proof, pub)


def test_sumcheck_device_rounds_match_host(monkeypatch):
    """The device-resident sumcheck driver (backend/mle.py
    DeviceSumcheckTable) produces byte-identical round polynomials and
    challenges to the host partial-evaluate path, and actually runs."""
    from zksnake_tpu.backend import config as _c
    from zksnake_tpu.backend import mle as _mle
    from zksnake_tpu.polynomial import MultilinearPolynomial
    from zksnake_tpu.subprotocol.sumcheck import Sumcheck

    random.seed(21)
    nv = 7
    entries = [(i, random.randrange(P)) for i in range(1 << nv) if i % 5]
    poly = MultilinearPolynomial(nv, entries, P)
    sc = Sumcheck(nv, P)

    monkeypatch.setattr(_c, "MLE_DEVICE_THRESHOLD", 1)
    before = _mle.SUMCHECK_DEVICE_ROUNDS
    claim_d, proof_d, chal_d = sc.prove(poly)
    assert _mle.SUMCHECK_DEVICE_ROUNDS >= before + nv, "device path did not run"

    monkeypatch.setattr(_c, "MLE_DEVICE_THRESHOLD", 1 << 62)  # force host
    claim_h, proof_h, chal_h = sc.prove(poly)

    assert claim_d == claim_h
    assert chal_d == chal_h
    assert [u.coeffs() for u in proof_d] == [u.coeffs() for u in proof_h]
    assert sc.verify(claim_d, proof_d, 3, mlpoly=poly)
