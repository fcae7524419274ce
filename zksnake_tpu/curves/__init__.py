"""Curve backends exposing the same surface as the reference's native
`zksnake._algebra.ec_bn254` / `ec_bls12_381` modules
(/root/reference/src/lib.rs:6-68): PointG1, PointG2, g1(), g2(), pairing,
multi_pairing, batch_multi_scalar_g{1,2}, multiscalar_mul_g{1,2}.

The MSM / batch scalar-mul entry points dispatch to the TPU backend for large
inputs and fall back to the host bigint path for small ones.
"""

from .params import CURVES
from .point import get_g1_class, get_g2_class, PointG12
from .pairing import get_engine


class CurveModule:
    """One curve's operation namespace (equivalent of the Rust submodule)."""

    def __init__(self, name):
        self._curve = CURVES[name]
        self.name = self._curve.name
        self.PointG1 = get_g1_class(name)
        self.PointG2 = get_g2_class(name)
        self.PointG12 = PointG12

    def g1(self):
        return self.PointG1.gen()

    def g2(self):
        return self.PointG2.gen()

    def pairing(self, a, b):
        return get_engine(self.name).pairing(a, b)

    def multi_pairing(self, a, b):
        return get_engine(self.name).multi_pairing(a, b)

    # --- bulk kernels (TPU-backed) ---
    def batch_multi_scalar_g1(self, points, scalars):
        from ..backend import dispatch

        return dispatch.batch_scalar_mul(self, points, scalars, group=1)

    def batch_multi_scalar_g2(self, points, scalars):
        from ..backend import dispatch

        return dispatch.batch_scalar_mul(self, points, scalars, group=2)

    def multiscalar_mul_g1(self, points, scalars):
        from ..backend import dispatch

        return dispatch.msm(self, points, scalars, group=1)

    def multiscalar_mul_g2(self, points, scalars):
        from ..backend import dispatch

        return dispatch.msm(self, points, scalars, group=2)


ec_bn254 = CurveModule("BN254")
ec_bls12_381 = CurveModule("BLS12_381")

_MODULES = {
    "BN254": ec_bn254,
    "BN128": ec_bn254,
    "ALT_BN128": ec_bn254,
    "BLS12_381": ec_bls12_381,
}


def get_curve_module(name):
    return _MODULES[name]
