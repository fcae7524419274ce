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
