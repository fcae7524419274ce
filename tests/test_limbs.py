"""Host-side limb codec and field-spec constant tests (no device needed)."""

import random
import numpy as np
import pytest

from zksnake_tpu.backend.limbs import (
    W,
    MASK,
    n_limbs,
    ints_to_limbs,
    limbs_to_ints,
)
from zksnake_tpu.constant import (
    BN254_SCALAR_FIELD,
    BN254_MODULUS,
    BLS12_381_SCALAR_FIELD,
    BLS12_381_MODULUS,
)

FIELDS = [
    BN254_SCALAR_FIELD,
    BN254_MODULUS,
    BLS12_381_SCALAR_FIELD,
    BLS12_381_MODULUS,
]


@pytest.mark.parametrize("p", FIELDS)
def test_limb_roundtrip(p):
    random.seed(p % 9973)
    nl = n_limbs(p)
    assert nl % 2 == 0
    assert nl * W >= p.bit_length()
    vals = [random.randrange(p) for _ in range(100)] + [0, 1, p - 1]
    arr = ints_to_limbs(vals, nl)
    assert arr.shape == (len(vals), nl)
    assert arr.dtype == np.uint32
    assert int(arr.max()) <= MASK
    back = limbs_to_ints(arr)
    assert back == vals


@pytest.mark.parametrize("p", FIELDS)
def test_field_spec_constants(p):
    from zksnake_tpu.backend.field import FieldSpec

    fs = FieldSpec.get(p)
    assert fs.R == (1 << (16 * fs.nl)) % p
    assert fs.R2 == fs.R * fs.R % p
    # -p^-1 mod 2^16
    assert (fs.pinv * p) % (1 << 16) == (1 << 16) - 1
    # Montgomery round trip on host
    xs = [3, 12345, p - 2]
    arr = fs.to_mont_host(xs)
    assert fs.from_mont_host(arr) == xs


def test_ntt_domain_matches_arkworks_convention():
    """omega = generator^((r-1) >> two_adicity) then squared down — pin the
    known arkworks two-adic roots."""
    from zksnake_tpu.polynomial import _HostDomain

    r = BN254_SCALAR_FIELD
    dom = _HostDomain.get(r, 1 << 4)
    assert pow(dom.omega, 1 << 4, r) == 1
    assert pow(dom.omega, 1 << 3, r) != 1

    r2 = BLS12_381_SCALAR_FIELD
    dom2 = _HostDomain.get(r2, 1 << 5)
    assert pow(dom2.omega, 1 << 5, r2) == 1
    assert pow(dom2.omega, 1 << 4, r2) != 1


@pytest.mark.parametrize("p", FIELDS)
def test_mont_mul_cpu64_matches_int_model(p):
    """The u64/32-bit-limb CIOS CPU fast path (field._mont_mul_cpu64) is
    bit-compatible with the big-int model for every modulus, including the
    p-1 edge lanes (round-4 compile-time lever; see CLAUDE.md)."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp
    from zksnake_tpu.backend.field import FieldSpec, _mont_mul_cpu64

    fs = FieldSpec.get(p)
    rng = random.Random(17)
    xs = [rng.randrange(p) for _ in range(61)] + [p - 1, p - 1, 0]
    ys = [rng.randrange(p) for _ in range(61)] + [p - 1, 1, p - 1]
    a = jnp.asarray(fs.to_mont_host(xs))
    b = jnp.asarray(fs.to_mont_host(ys))
    out = jax.jit(lambda a, b: _mont_mul_cpu64(fs, a, b))(a, b)
    assert fs.from_mont_host(np.asarray(out)) == [
        x * y % p for x, y in zip(xs, ys)
    ]
