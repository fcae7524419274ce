"""Curve-layer unit tests: group laws, pairings, serialization, hash-to-curve.
(New coverage beyond the reference suite — SURVEY.md section 4 implications.)"""

import pytest
from zksnake_tpu.curves import ec_bn254, ec_bls12_381


@pytest.mark.parametrize("mod", [ec_bn254, ec_bls12_381], ids=["BN254", "BLS12_381"])
def test_group_laws(mod):
    G1, G2 = mod.g1(), mod.g2()
    assert (G1 * 2) + G1 == G1 * 3
    assert (G2 * 5) - (G2 * 3) == G2 * 2
    assert (G1 * 0).is_zero()
    assert (G1 + type(G1).identity()) == G1
    assert (G1 - G1).is_zero()
    # scalar reduced mod r
    assert G1 * (mod._curve.r + 7) == G1 * 7


@pytest.mark.parametrize("mod", [ec_bn254, ec_bls12_381], ids=["BN254", "BLS12_381"])
def test_serialization_roundtrip(mod):
    G1, G2 = mod.g1(), mod.g2()
    for P in (G1 * 1337, type(G1).identity(), G2 * 133337, type(G2).identity()):
        b = bytes(P.to_bytes())
        Q = type(P).from_bytes(b)
        assert P == Q
    # flag bits: infinity flag
    assert bytes(type(G1).identity().to_bytes())[-1] & 0x40


@pytest.mark.parametrize("mod", [ec_bn254, ec_bls12_381], ids=["BN254", "BLS12_381"])
def test_pairing_bilinearity(mod):
    G1, G2 = mod.g1(), mod.g2()
    e = mod.pairing
    lhs = e(G1 * 6, G2 * 7)
    assert lhs == e(G1 * 42, G2)
    assert lhs == e(G1, G2 * 42)
    assert lhs != e(G1 * 41, G2)
    assert mod.multi_pairing([G1 * 2, G1 * 3], [G2 * 5, G2 * 10]) == e(G1 * 40, G2)
    # identity behaves neutrally in multi_pairing
    assert mod.multi_pairing(
        [G1 * 40, type(G1).identity()], [G2, G2 * 9]
    ) == e(G1 * 40, G2)


def test_bn254_known_coordinates():
    """Pin generator constants to the alt_bn128 standard values."""
    G1 = ec_bn254.g1()
    assert (G1.x, G1.y) == (1, 2)
    P = G1 * 2
    assert P.x == 1368015179489954701390400359078579693043519447331113978918064868415326638035
    assert P.y == 9918110051302171585080402603319702774565515993150576347155970296011118125764


@pytest.mark.parametrize("mod", [ec_bn254, ec_bls12_381], ids=["BN254", "BLS12_381"])
def test_hash_to_curve(mod):
    cls = mod.PointG1
    p1 = cls.hash_to_curve(b"dst", b"hello")
    p2 = cls.hash_to_curve(b"dst", b"hello")
    p3 = cls.hash_to_curve(b"dst", b"world")
    assert p1 == p2
    assert p1 != p3
    assert p1.is_on_curve()
    assert p1.in_subgroup()
    f = cls.hash_to_field(b"dst", b"hello")
    assert 0 <= f < mod._curve.p


def test_from_x():
    cls = ec_bn254.PointG1
    G1 = ec_bn254.g1()
    P = G1 * 12345
    Q = cls.from_x(P.x)
    assert Q.x == P.x
    assert Q in (P, -P)


def test_bls12_381_hash_to_curve_rfc9380_vectors():
    """WB suite parity with arkworks: RFC 9380 BLS12381G1_XMD:SHA-256_SSWU_RO_
    test vectors (the vectors arkworks' WBMap is itself tested against)."""
    cls = ec_bls12_381.PointG1
    dst = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_"
    vectors = {
        b"": (
            0x052926ADD2207B76CA4FA57A8734416C8DC95E24501772C814278700EED6D1E4E8CF62D9C09DB0FAC349612B759E79A1,
            0x08BA738453BFED09CB546DBB0783DBB3A5F1F566ED67BB6BE0E8C67E2E81A4CC68EE29813BB7994998F3EAE0C9C6A265,
        ),
        b"abc": (
            0x03567BC5EF9C690C2AB2ECDF6A96EF1C139CC0B2F284DCA0A9A7943388A49A3AEE664BA5379A7655D3C68900BE2F6903,
            0x0B9C15F3FE6E5CF4211F346271D7B01C8F3B28BE689C8429C85B67AF215533311F0B8DFAAA154FA6B88176C229F2885D,
        ),
    }
    for msg, (x, y) in vectors.items():
        p = cls.hash_to_curve(dst, msg)
        assert (p.x, p.y) == (x, y)
        assert p.in_subgroup()
