"""PlonK end-to-end tests (oracle: reference tests/test_plonk.py)."""

import pytest

from zksnake_tpu.arithmetization.plonkish import Plonkish
from zksnake_tpu.constant import BLS12_381_SCALAR_FIELD, BN254_SCALAR_FIELD
from zksnake_tpu.arithmetization import Var, ConstraintSystem
from zksnake_tpu.plonk import Plonk, Proof, ProvingKey, VerifyingKey


def _build_cs(field):
    x = Var("x")
    y = Var("y")
    z = Var("z")
    v0 = Var("v0")
    v1 = Var("v1")
    v2 = Var("v2")
    v3 = Var("v3")
    v4 = Var("v4")
    v5 = Var("v5")
    v6 = Var("v6")

    cs = ConstraintSystem(["x"], ["y"], field)
    cs.add_constraint(z == x)
    cs.add_constraint(v0 == z * z)
    cs.add_constraint(v1 == z * z)
    cs.add_constraint(v2 == v1 * x)
    cs.add_constraint(v3 == v0 * 2 * 3)
    cs.add_constraint(v4 == 2 * v1 * v2 * 3)
    cs.add_constraint(v5 == 2 * v3 - v4)
    cs.add_constraint(v6 == 2 + v5 + 3)
    cs.add_constraint(y == v6 + v4 + 1337)
    cs.set_public(y)
    cs.set_public(z)
    return cs


@pytest.fixture
def plonkish_data_bn254():
    cs = _build_cs(BN254_SCALAR_FIELD)
    plonkish = Plonkish(cs)
    plonkish.compile()
    pub, priv = plonkish.generate_witness(plonkish.solve({"x": 3}))

    assert plonkish.is_sat(pub, priv)

    return plonkish, (pub, priv)


@pytest.fixture
def plonkish_data_bls12_381():
    cs = _build_cs(BLS12_381_SCALAR_FIELD)
    plonkish = Plonkish(cs, "BLS12_381")
    plonkish.compile()

    pub, priv = plonkish.generate_witness(plonkish.solve({"x": 1337}))
    assert plonkish.is_sat(pub, priv)

    return plonkish, (pub, priv)


def test_plonk_bn254(plonkish_data_bn254):
    plonkish, witness = plonkish_data_bn254
    pub, priv = witness

    plonk = Plonk(plonkish)
    plonk.setup()

    proof = plonk.prove(pub, priv)

    proof_bytes = proof.to_bytes()
    assert plonk.verify(Proof.from_bytes(proof_bytes), pub)


def test_plonk_bls12_381(plonkish_data_bls12_381):
    plonkish, witness = plonkish_data_bls12_381
    pub, priv = witness

    plonk = Plonk(plonkish, curve="BLS12_381")
    plonk.setup()

    proof = plonk.prove(pub, priv)

    proof_bytes = proof.to_bytes()
    assert plonk.verify(Proof.from_bytes(proof_bytes, "BLS12_381"), pub)


def test_plonk_external_tau_resume(plonkish_data_bn254):
    """Resume setup from an external powers-of-tau SRS (the reference's
    checkpoint path, its plonk/protocol.py:53-57): a prove/verify cycle must
    work against keys derived from a previous ceremony's tau powers."""
    plonkish, (pub, priv) = plonkish_data_bn254

    ceremony = Plonk(plonkish)
    ceremony.setup()
    g1_tau, g2_tau = ceremony.G1_tau, ceremony.G2_tau

    plonk = Plonk(plonkish)
    plonk.setup(g1_tau=g1_tau, g2_tau=g2_tau)
    assert plonk.G1_tau == g1_tau

    proof = plonk.prove(pub, priv)
    assert plonk.verify(proof, pub)
    # keys from the same SRS must agree with the originating ceremony's
    assert plonk.verifying_key.to_bytes() == ceremony.verifying_key.to_bytes()


def test_plonk_external_tau_validation(plonkish_data_bn254):
    """An undersized SRS (< n+6 powers) must be rejected, and g2_tau is
    mandatory alongside g1_tau."""
    plonkish, _ = plonkish_data_bn254

    ceremony = Plonk(plonkish)
    ceremony.setup()
    g1_tau, g2_tau = ceremony.G1_tau, ceremony.G2_tau

    n = plonkish.length
    with pytest.raises(ValueError):
        Plonk(plonkish).setup(g1_tau=g1_tau[: n + 5], g2_tau=g2_tau)
    with pytest.raises(ValueError):
        Plonk(plonkish).setup(g1_tau=g1_tau)


def test_key_serialization_bn254(plonkish_data_bn254):
    plonkish, _ = plonkish_data_bn254

    plonk = Plonk(plonkish)
    plonk.setup()

    pk = plonk.proving_key.to_bytes()
    vk = plonk.verifying_key.to_bytes()

    assert ProvingKey.from_bytes(pk).to_bytes() == plonk.proving_key.to_bytes()
    assert VerifyingKey.from_bytes(vk).to_bytes() == plonk.verifying_key.to_bytes()


def test_key_serialization_bls12_381(plonkish_data_bls12_381):
    plonkish, _ = plonkish_data_bls12_381

    plonk = Plonk(plonkish, "BLS12_381")
    plonk.setup()

    pk = plonk.proving_key.to_bytes()
    vk = plonk.verifying_key.to_bytes()

    assert (
        ProvingKey.from_bytes(pk, "BLS12_381").to_bytes()
        == plonk.proving_key.to_bytes()
    )
    assert (
        VerifyingKey.from_bytes(vk, "BLS12_381").to_bytes()
        == plonk.verifying_key.to_bytes()
    )
