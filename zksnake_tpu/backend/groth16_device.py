"""Fused device pipeline for the Groth16 prover.

Keeps the entire QAP evaluation on device (SURVEY.md section 1: "keep data
device-resident across calls instead of round-tripping per op"):

    witness limbs -> SpMV (Az,Bz,Cz) -> iNTT x3 -> 2n-NTT product -> iNTT
      -> vanishing-poly division (coefficient fold) -> raw scalar limbs

followed by the Pippenger MSMs over a device-resident proving key cache.
The host only sees the five result points plus the divisibility flag.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .field import FieldSpec, mont_mul, mod_sub, from_mont, to_mont
from .ntt import Domain, ntt_device, intt_device
from .spmv import DeviceSparseMatrix, reduce_wide
from .curve_ops import get_group_spec
from .msm import msm_device_raw
from .limbs import ints_to_limbs


class Groth16DeviceProver:
    """Per-(qap, proving key) device state for fused proving."""

    def __init__(self, qap, curve):
        self.curve = curve
        self.fr = FieldSpec.get(curve.r)
        self.n = qap.a.n_row  # padded domain size
        self.m = qap.a.n_col
        self.dom = Domain.get(curve, self.n)
        self.dom2 = Domain.get(curve, 2 * self.n)
        fr = self.fr
        self.A = DeviceSparseMatrix.from_sparse_array(fr, qap.a)
        self.B = DeviceSparseMatrix.from_sparse_array(fr, qap.b)
        self.C = DeviceSparseMatrix.from_sparse_array(fr, qap.c)
        self._pk_dev = None
        self._kernel = None

    def _spmv(self, mat, w_mont):
        terms = mont_mul(self.fr, mat.vals, w_mont[:, mat.cols])
        sums = jax.ops.segment_sum(
            terms.T,
            mat.rows,
            num_segments=self.n,
            indices_are_sorted=True,
        )
        return reduce_wide(self.fr, sums.T)

    def _build_kernel(self):
        fr = self.fr
        n = self.n
        dom = self.dom
        dom2 = self.dom2

        def kernel(w_raw):
            w = to_mont(fr, w_raw)
            az = self._spmv(self.A, w)
            bz = self._spmv(self.B, w)
            cz = self._spmv(self.C, w)
            u = intt_device(dom, az)
            v = intt_device(dom, bz)
            wpoly = intt_device(dom, cz)
            # UV over the 2n domain
            zpad = jnp.zeros((fr.nl, n), jnp.uint32)
            u2 = jnp.concatenate([u, zpad], axis=1)
            v2 = jnp.concatenate([v, zpad], axis=1)
            uv = intt_device(
                dom2, mont_mul(fr, ntt_device(dom2, u2), ntt_device(dom2, v2))
            )
            # T = UV - W (first n coefficients), then divide by x^n - 1:
            # quotient H = T[n:], remainder r_i = T_i + H_i must vanish
            from .field import mod_add

            t_lo = mod_sub(fr, uv[:, :n], wpoly)
            h = uv[:, n:]
            r_col = mod_add(fr, t_lo, h)
            ok = jnp.all(r_col == 0)
            return (
                from_mont(fr, u),
                from_mont(fr, v),
                from_mont(fr, h),
                ok,
            )

        return jax.jit(kernel)

    def evaluate_witness_device(self, witness_ints):
        """witness ints -> (U_rawlimbs, V_rawlimbs, H_rawlimbs) on device."""
        fr = self.fr
        if self._kernel is None:
            self._kernel = self._build_kernel()
        w_raw = jnp.asarray(
            np.ascontiguousarray(
                ints_to_limbs([int(x) % fr.p for x in witness_ints], fr.nl).T
            )
        )
        u, v, h, ok = self._kernel(w_raw)
        if not bool(ok):
            raise ValueError("(U * V - W) did not divided by Z to zero")
        return u, v, h

    def pk_device(self, pk):
        """Device tensors of the proving key point vectors (cached)."""
        if self._pk_dev is None:
            g1 = get_group_spec(self.curve, 1)
            g2 = get_group_spec(self.curve, 2)
            self._pk_dev = {
                "tau1": g1.points_to_device(pk.tau_1),
                "tau2": g2.points_to_device(pk.tau_2),
                "target1": g1.points_to_device(pk.target_1),
                "kdelta1": g1.points_to_device(pk.kdelta_1),
            }
        return self._pk_dev

    def prove_msms(self, pk, witness_ints, private_witness, point_cls_g1, point_cls_g2):
        """Runs the 5 MSMs of Groth16.prove on device; returns host points
        (msmA, msmB1, msmB2, msmHZ, msmKpriv)."""
        from ..metrics import phase

        fr = self.fr
        g1 = get_group_spec(self.curve, 1)
        g2 = get_group_spec(self.curve, 2)
        with phase("groth16.prove.qap", items=self.n):
            u, v, h, = self.evaluate_witness_device(witness_ints)
        pkd = self.pk_device(pk)

        def trunc(P, k):
            return jax.tree_util.tree_map(lambda t: t[..., :k], P)

        n = self.n
        with phase("groth16.prove.msm", items=4 * n):
            msm_a = msm_device_raw(g1, trunc(pkd["tau1"], n), u)
            msm_b1 = msm_device_raw(g1, trunc(pkd["tau1"], n), v)
            msm_b2 = msm_device_raw(g2, trunc(pkd["tau2"], n), v)
            msm_hz = msm_device_raw(g1, trunc(pkd["target1"], n), h)

        out = [
            g1.points_from_device(
                jax.tree_util.tree_map(lambda t: t[..., None], r), point_cls_g1
            )[0]
            for r in (msm_a, msm_b1)
        ]
        out.append(
            g2.points_from_device(
                jax.tree_util.tree_map(lambda t: t[..., None], msm_b2), point_cls_g2
            )[0]
        )
        out.append(
            g1.points_from_device(
                jax.tree_util.tree_map(lambda t: t[..., None], msm_hz), point_cls_g1
            )[0]
        )

        if len(private_witness) > 0:
            priv = jnp.asarray(
                np.ascontiguousarray(
                    ints_to_limbs(
                        [int(x) % fr.p for x in private_witness], fr.nl
                    ).T
                )
            )
            msm_k = msm_device_raw(g1, pkd["kdelta1"], priv)
            out.append(
                g1.points_from_device(
                    jax.tree_util.tree_map(lambda t: t[..., None], msm_k),
                    point_cls_g1,
                )[0]
            )
        else:
            out.append(point_cls_g1.identity())
        return out
