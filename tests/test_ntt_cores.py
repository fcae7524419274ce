"""Bit-identity tests across the NTT core variants (ADVICE r3: the flat
2-D core is the default public path but was only covered by the bench
oracle; this pins all cores — unrolled, constant-geometry, flat, and
batched-flat — to each other and to the host oracle, so future edits to
any core are caught by the suite).

Reference surface: /root/reference/src/bn254/polynomial.rs:535-585.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from zksnake_tpu.backend.field import FieldSpec
from zksnake_tpu.backend import ntt as ntt_mod
from zksnake_tpu.curves.params import CURVES


@pytest.fixture(scope="module")
def bn254():
    curve = CURVES["BN254"]
    return curve, FieldSpec.get(curve.r)


def test_ntt_core_equivalence(bn254):
    """All four cores produce bit-identical outputs, for every batch shape
    the provers use (B = 1 unit-batch, small B < 8, and B >= 8)."""
    curve, fs = bn254
    rng = random.Random(7)
    n = 64
    dom = ntt_mod.Domain.get(curve, n).warm()
    tw = dom.twiddles(False)
    for B in (1, 3, 4, 8):
        vals = [rng.randrange(curve.r) for _ in range(B * n)]
        x3 = jnp.asarray(fs.to_mont_host(vals)).reshape(fs.nl, B, n)
        ref = np.asarray(ntt_mod._ntt_core(dom, x3, tw))
        cg = np.asarray(ntt_mod._ntt_core_cg(dom, x3, tw))
        bflat = np.asarray(ntt_mod._ntt_core_cg_bflat(dom, x3, tw))
        assert np.array_equal(ref, cg), f"cg differs at B={B}"
        assert np.array_equal(ref, bflat), f"bflat differs at B={B}"
        if B == 1:
            flat = np.asarray(ntt_mod._ntt_core_cg_flat(dom, x3[:, 0], tw))
            assert np.array_equal(ref[:, 0], flat), "flat differs"


def test_ntt_policy_roundtrip_and_oracle(bn254):
    """The public policy entry (ntt_device/intt_device) round-trips for 2-D
    and 3-D inputs and matches direct evaluation at omega^i."""
    curve, fs = bn254
    rng = random.Random(11)
    n = 64
    dom = ntt_mod.Domain.get(curve, n).warm()
    coeffs = [rng.randrange(curve.r) for _ in range(n)]
    x = jnp.asarray(fs.to_mont_host(coeffs))

    ev = ntt_mod.ntt_device(dom, x)
    back = ntt_mod.intt_device(dom, ev)
    assert fs.from_mont_host(np.asarray(back)) == coeffs

    # direct-evaluation oracle at a few points
    got = fs.from_mont_host(np.asarray(ev))
    for i in (0, 1, 5, n - 1):
        want = 0
        wi = pow(dom.omega, i, curve.r)
        for c in reversed(coeffs):
            want = (want * wi + c) % curve.r
        assert got[i] == want, f"NTT mismatch at lane {i}"

    # 3-D batched roundtrip (small B exercises the bflat core)
    x3 = jnp.stack([x, ev, x], axis=1)  # (nl, 3, n)
    back3 = ntt_mod.intt_device(dom, ntt_mod.ntt_device(dom, x3))
    assert np.array_equal(np.asarray(back3), np.asarray(x3))


def test_transform_host_flat_kernel_512(bn254):
    """transform_host (the public Polynomial.fft device entry, n >= 512
    above NTT_DEVICE_THRESHOLD) through the jitted flat kernel: fft/ifft
    and coset_fft/coset_ifft round-trip, and fft matches a Horner oracle
    at one point."""
    curve, _ = bn254
    rng = random.Random(13)
    n = 512
    coeffs = [rng.randrange(curve.r) for _ in range(n)]
    ev = ntt_mod.transform_host(curve, coeffs, n, "fft")
    back = ntt_mod.transform_host(curve, ev, n, "ifft")
    assert back == coeffs

    dom = ntt_mod.Domain.get(curve, n)
    want1 = 0
    for c in reversed(coeffs):
        want1 = (want1 * dom.omega + c) % curve.r
    assert ev[1] == want1

    cev = ntt_mod.transform_host(curve, coeffs, n, "coset_fft")
    cback = ntt_mod.transform_host(curve, cev, n, "coset_ifft")
    assert cback == coeffs
