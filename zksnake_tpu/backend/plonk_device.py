"""Fused device pipeline for the PlonK prover — all five rounds resident.

Replaces the reference's host loops
(/root/reference/python/zksnake/plonk/protocol.py:157-484) with jitted limb
kernels; the host only sees the nine commitment points, six opening
evaluations, and per-round ok flags:

  R1  batched 4-way iNTT (wires + PI) -> blinding scatter -> batched 4n NTT
      -> gate product G on the extended domain -> 3 MSM commits
  R2  batched 6-way 4n NTT of (wire + beta*id/sigma + gamma) -> two 3-way
      products -> stride-4 sampling -> batched inversion (mont_inv_batch)
      -> prefix-product accumulator scan (prefix_prod) -> [z]_1
  R3  Z_omega by cyclic root table -> batched 8n NTT products (nom*Z,
      den*Z_omega) -> (Z-1)*L1 over 4n -> quotient by X^n - 1 as suffix
      block folds -> T split + X^n blinding -> 3 MSM commits
  R4  one batched Horner-free evaluation kernel: zeta-power table by
      prefix_prod, coefficient dot by log-depth sum_mod
  R5  linearization R as ONE weighted combination of 15 cached coefficient
      tensors (weights are host scalars derived from the R4 evals), then
      (X - z) division by suffix sums: q_i = z^-(i+1) * sum_{j>i} N_j z^j

Proof bytes are identical to the host prover's under the same blinding draw
(asserted by tests/test_backend_device.py::test_plonk_device_prover).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .curve_ops import get_group_spec
from .field import (
    FieldSpec,
    mod_add,
    mod_sub,
    from_mont,
    to_mont,
    mont_mul,
    mont_inv_batch,
    prefix_prod,
    prefix_sum_mod,
    sum_mod,
)
from .limbs import ints_to_limbs
from .msm import msm_device_raw
from .ntt import Domain, intt_device, ntt_device


def _pad_last(x, n):
    """Zero-pad the last axis up to length n."""
    pad = n - x.shape[-1]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, cfg)


class PlonkDeviceProver:
    """Per-proving-key device state for fused PlonK proving.

    Requires n >= 8 (the quotient block fold needs 4n >= 3n + 6)."""

    def __init__(self, pk, curve):
        self.curve = curve
        self.fr = FieldSpec.get(curve.r)
        self.n = pk.n
        if self.n < 8:
            raise ValueError("device PlonK prover requires domain size >= 8")
        self.dom1 = Domain.get(curve, self.n)
        self.dom4 = Domain.get(curve, 4 * self.n)
        self.dom8 = Domain.get(curve, 8 * self.n)
        fr = self.fr
        n = self.n

        def coeff_tensor(poly, length):
            c = poly.coeffs()
            return fr.to_mont_host(c + [0] * (length - len(c)))

        # (nl, 5, n): QL, QR, QO, QM, QC coefficient vectors
        self.sel_coeffs = jnp.asarray(
            np.stack(
                [coeff_tensor(pk.selector_poly[k], n) for k in "LROMC"], axis=1
            )
        )
        # (nl, 5, 4n): cached extended-domain selector evaluations
        self.sel_evals4 = jnp.asarray(
            np.stack(
                [
                    fr.to_mont_host(list(pk.selector_eval[k]))
                    for k in "LROMC"
                ],
                axis=1,
            )
        )
        # (nl, 6, n): id1..3 then sigma1..3 coefficient vectors
        self.idsig_coeffs = jnp.asarray(
            np.stack(
                [coeff_tensor(p, n) for p in pk.identity_poly]
                + [coeff_tensor(p, n) for p in pk.permutation_poly],
                axis=1,
            )
        )
        # (nl, 4n): L1 on the extended domain
        self.lagrange4 = jnp.asarray(fr.to_mont_host(list(pk.lagrange_evals)))
        # (nl, n+3): omega^(i mod n), the Z -> Z(omega X) rotation table
        r = curve.r
        omega = self.dom1.omega
        cyc = []
        w = 1
        for i in range(n + 3):
            cyc.append(w)
            w = w * omega % r
            if (i + 1) % n == 0:
                w = 1
        self.roots_cyc = jnp.asarray(fr.to_mont_host(cyc))

        self.g1 = get_group_spec(curve, 1)
        self.srs_len = len(pk.tau_g1)
        self._tau1_dev = self.g1.points_to_device(pk.tau_g1)

        self._kernels = {}
        self._st = {}

    # -- small host<->device helpers --------------------------------------

    def _m(self, *values):
        """ints -> (nl, k) Montgomery device scalars."""
        return jnp.asarray(self.fr.to_mont_host([int(v) % self.fr.p for v in values]))

    def _raw(self, values):
        return jnp.asarray(
            np.ascontiguousarray(
                ints_to_limbs([int(v) % self.fr.p for v in values], self.fr.nl).T
            )
        )

    def _commit(self, raw_limbs, point_cls):
        """MSM of raw coefficient limbs against the SRS (padded so one
        compiled Pippenger serves every commitment in the protocol)."""
        scalars = _pad_last(raw_limbs, self.srs_len)
        res = msm_device_raw(self.g1, self._tau1_dev, scalars)
        return self.g1.points_from_device(
            jax.tree_util.tree_map(lambda t: np.asarray(t)[..., None], res),
            point_cls,
        )[0]

    def _jit(self, name, builder):
        if name not in self._kernels:
            self._kernels[name] = jax.jit(builder())
        return self._kernels[name]

    # -- round 1 -----------------------------------------------------------

    def _build_round1(self):
        fr, n = self.fr, self.n

        def kernel(wires_raw, pub_raw, blinds):
            # wires_raw: (nl, 3, n); pub_raw: (nl, n); blinds: (nl, 6)
            stacked = to_mont(
                fr, jnp.concatenate([wires_raw, pub_raw[:, None, :]], axis=1)
            )
            coeffs = intt_device(self.dom1, stacked)  # (nl, 4, n)
            pi = coeffs[:, 3]
            bl = blinds.reshape(fr.nl, 3, 2)
            # wire + blind*(X^n - 1): subtract at [0:2], append at [n:n+2]
            low = mod_sub(fr, coeffs[:, :3], _pad_last(bl, n))
            abc = jnp.concatenate([low, bl], axis=-1)  # (nl, 3, n+2)

            ext = ntt_device(
                self.dom4,
                jnp.concatenate(
                    [_pad_last(abc, 4 * n), _pad_last(pi[:, None, :], 4 * n)],
                    axis=1,
                ),
            )  # (nl, 4, 4n)
            a_e, b_e, c_e, pi_e = (ext[:, i] for i in range(4))
            ab_e = mont_mul(fr, a_e, b_e)
            prods = mont_mul(
                fr,
                jnp.stack([a_e, b_e, c_e, ab_e], axis=1),
                self.sel_evals4[:, :4],
            )
            g_e = mod_add(
                fr,
                mod_add(fr, sum_mod(fr, prods, axis=1)[:, 0], self.sel_evals4[:, 4]),
                pi_e,
            )
            g = intt_device(self.dom4, g_e)
            return abc, pi, g, from_mont(fr, abc)

        return kernel

    def round1(self, a, b, c, pub_vec, blinds, point_cls):
        """Wire polynomials + gate product; returns ([a]1, [b]1, [c]1)."""
        kern = self._jit("r1", self._build_round1)
        wires_raw = jnp.stack([self._raw(a), self._raw(b), self._raw(c)], axis=1)
        abc, pi, g, abc_raw = kern(wires_raw, self._raw(pub_vec), self._m(*blinds))
        self._st.update(abc=abc, pi=pi, g=g)
        return [self._commit(abc_raw[:, i], point_cls) for i in range(3)]

    # -- round 2 -----------------------------------------------------------

    def _build_round2(self):
        fr, n = self.fr, self.n
        one_col = fr.one_mont_dev((1,))

        def kernel(abc, beta_m, gamma_m, blinds):
            # (wire + beta*id + gamma) and (wire + beta*sigma + gamma)
            wires6 = jnp.concatenate([abc, abc], axis=1)  # (nl, 6, n+2)
            beta_terms = mont_mul(fr, self.idsig_coeffs, beta_m[:, None])
            shifted = mod_add(fr, wires6, _pad_last(beta_terms, n + 2))
            gamma_col = _pad_last(gamma_m[:, None, :], n + 2)
            shifted = mod_add(fr, shifted, jnp.broadcast_to(gamma_col, shifted.shape))

            ext = ntt_device(self.dom4, _pad_last(shifted, 4 * n))  # (nl,6,4n)
            # nom = e0*e1*e2 (id side), den = e3*e4*e5 (sigma side)
            p1 = mont_mul(
                fr,
                jnp.stack([ext[:, 0], ext[:, 3]], axis=1),
                jnp.stack([ext[:, 1], ext[:, 4]], axis=1),
            )
            p2 = mont_mul(fr, p1, jnp.stack([ext[:, 2], ext[:, 5]], axis=1))
            nomden = intt_device(self.dom4, p2)  # coeffs (nl, 2, 4n)

            nom_s = p2[:, 0, ::4]
            den_s = p2[:, 1, ::4]
            ratio = mont_mul(fr, nom_s, mont_inv_batch(fr, den_s))
            pref = prefix_prod(fr, ratio)
            acc = jnp.concatenate(
                [jnp.broadcast_to(one_col, (fr.nl, 1)), pref[:, : n - 1]], axis=-1
            )
            ok = jnp.all(pref[:, n - 1 : n] == one_col)

            acc_c = intt_device(self.dom1, acc)
            z_low = mod_sub(fr, acc_c, _pad_last(blinds, n))
            z = jnp.concatenate([z_low, blinds], axis=-1)  # (nl, n+3)
            return nomden, z, from_mont(fr, z), ok

        return kernel

    def round2(self, beta, gamma, blinds, point_cls):
        """Permutation accumulator; returns [z]_1."""
        kern = self._jit("r2", self._build_round2)
        nomden, z, z_raw, ok = kern(
            self._st["abc"], self._m(beta), self._m(gamma), self._m(*blinds)
        )
        if not bool(ok):
            raise AssertionError("Copy constraints are not satisfied")
        self._st.update(nomden=nomden, z=z)
        return self._commit(z_raw, point_cls)

    # -- round 3 -----------------------------------------------------------

    def _build_round3(self):
        fr, n = self.fr, self.n
        one_col = fr.one_mont_dev((1,))

        def kernel(nomden, z, g, alpha_m, blinds):
            z_omega = mont_mul(fr, z, self.roots_cyc)

            big = ntt_device(
                self.dom8,
                jnp.concatenate(
                    [
                        _pad_last(nomden, 8 * n),
                        _pad_last(z[:, None, :], 8 * n),
                        _pad_last(z_omega[:, None, :], 8 * n),
                    ],
                    axis=1,
                ),
            )  # (nl, 4, 8n): nom, den, Z, Z_omega evals
            prod = mont_mul(fr, big[:, 0:2], big[:, 2:4])
            nz_dz = intt_device(self.dom8, prod)  # (nl, 2, 8n)

            # (Z - 1) * L1 over the 4n domain
            zm1 = jnp.concatenate(
                [mod_sub(fr, z[:, :1], one_col), z[:, 1:]], axis=-1
            )
            z1_e = ntt_device(self.dom4, _pad_last(zm1, 4 * n))
            z1l1 = intt_device(self.dom4, mont_mul(fr, z1_e, self.lagrange4))

            alpha2 = mont_mul(fr, alpha_m, alpha_m)
            numer = mod_add(
                fr,
                _pad_last(g, 8 * n),
                mont_mul(fr, mod_sub(fr, nz_dz[:, 0], nz_dz[:, 1]), alpha_m),
            )
            numer = mod_add(fr, numer, mont_mul(fr, _pad_last(z1l1, 8 * n), alpha2))

            # divide by X^n - 1: q block b = sum of numer blocks > b
            blocks = numer.reshape(fr.nl, 8, n)
            suffix = [None] * 8
            suffix[7] = blocks[:, 7]
            for j in range(6, 0, -1):
                suffix[j] = mod_add(fr, blocks[:, j], suffix[j + 1])
            remainder = mod_add(fr, blocks[:, 0], suffix[1])
            ok = jnp.all(remainder == 0)
            t = jnp.concatenate(suffix[1:5], axis=-1)  # (nl, 4n), deg <= 3n+5

            b_lo, b_hi = blinds[:, :1], blinds[:, 1:2]
            t_lo = jnp.concatenate([t[:, :n], b_lo], axis=-1)
            mid = t[:, n : 2 * n]
            t_mid = jnp.concatenate(
                [mod_sub(fr, mid[:, :1], b_lo), mid[:, 1:], b_hi], axis=-1
            )
            hi = t[:, 2 * n : 3 * n + 6]
            t_hi = jnp.concatenate([mod_sub(fr, hi[:, :1], b_hi), hi[:, 1:]], axis=-1)

            parts = (t_lo, t_mid, t_hi)
            return z_omega, parts, tuple(from_mont(fr, x) for x in parts), ok

        return kernel

    def round3(self, alpha, blinds, point_cls):
        """Quotient polynomial; returns ([t_lo]1, [t_mid]1, [t_hi]1)."""
        kern = self._jit("r3", self._build_round3)
        z_omega, parts, parts_raw, ok = kern(
            self._st["nomden"], self._st["z"], self._st["g"],
            self._m(alpha), self._m(*blinds),
        )
        if not bool(ok):
            raise AssertionError("quotient remainder is non-zero")
        self._st.update(z_omega=z_omega, t_parts=parts)
        return [self._commit(raw, point_cls) for raw in parts_raw]

    # -- round 4 -----------------------------------------------------------

    def _build_round4(self):
        fr, n = self.fr, self.n
        L = n + 3
        one_col = fr.one_mont_dev((1,))

        def kernel(abc, z_omega, pi, zeta_m):
            zp = prefix_prod(
                fr,
                jnp.concatenate(
                    [
                        jnp.broadcast_to(one_col, (fr.nl, 1)),
                        jnp.broadcast_to(zeta_m, (fr.nl, L - 1)),
                    ],
                    axis=-1,
                ),
            )  # [1, zeta, ..., zeta^(L-1)]
            polys = jnp.concatenate(
                [
                    _pad_last(abc, L),  # A, B, C
                    _pad_last(self.idsig_coeffs[:, 3:5], L),  # sigma1, sigma2
                    _pad_last(z_omega[:, None, :], L),  # Z_omega
                    _pad_last(pi[:, None, :], L),  # PI
                ],
                axis=1,
            )  # (nl, 7, L)
            prods = mont_mul(fr, polys, zp[:, None, :])
            evals = sum_mod(fr, prods, axis=-1)[..., 0]  # (nl, 7)
            return from_mont(fr, evals)

        return kernel

    def round4(self, zeta):
        """Opening evaluations: (zA, zB, zC, zs1, zs2, zZw, PI(zeta))."""
        kern = self._jit("r4", self._build_round4)
        raw = kern(
            self._st["abc"], self._st["z_omega"], self._st["pi"], self._m(zeta)
        )
        return self.fr.raw_from_host(np.asarray(raw))

    # -- round 5 -----------------------------------------------------------

    def _build_round5(self):
        fr, n = self.fr, self.n
        L = n + 6
        one_col = fr.one_mont_dev((1,))

        def divide(numer, point_m, point_inv_m):
            """(X - point) division by suffix sums; returns (quotient, ok)."""
            zp = prefix_prod(
                fr,
                jnp.concatenate(
                    [
                        jnp.broadcast_to(one_col, (fr.nl, 1)),
                        jnp.broadcast_to(point_m, (fr.nl, L - 1)),
                    ],
                    axis=-1,
                ),
            )
            zp_inv = prefix_prod(
                fr, jnp.broadcast_to(point_inv_m, (fr.nl, L))
            )  # [z^-1, ..., z^-L]
            m = mont_mul(fr, numer, zp)
            incl = jnp.flip(prefix_sum_mod(fr, jnp.flip(m, axis=-1)), axis=-1)
            excl = jnp.concatenate(
                [incl[:, 1:], jnp.zeros((fr.nl, 1), jnp.uint32)], axis=-1
            )
            q = mont_mul(fr, excl, zp_inv)
            ok = jnp.all(incl[:, :1] == 0)
            return q, ok

        def kernel(abc, z, t_lo, t_mid, t_hi, weights, const1, const2,
                   zeta_m, zeta_inv_m, zw_m, zw_inv_m):
            # stacked basis for the linearization combination (order matches
            # the weight vector built in round5()):
            polys = jnp.concatenate(
                [
                    _pad_last(self.sel_coeffs, L),  # QL QR QO QM QC
                    _pad_last(z[:, None, :], L),  # Z
                    _pad_last(self.idsig_coeffs[:, 5:6], L),  # sigma3
                    _pad_last(t_lo[:, None, :], L),
                    _pad_last(t_mid[:, None, :], L),
                    _pad_last(t_hi[:, None, :], L),
                    _pad_last(abc, L),  # A B C
                    _pad_last(self.idsig_coeffs[:, 3:5], L),  # sigma1 sigma2
                ],
                axis=1,
            )  # (nl, 15, L)
            comb = sum_mod(
                fr, mont_mul(fr, polys, weights[:, :, None]), axis=1
            )[:, 0]
            numer = jnp.concatenate(
                [mod_add(fr, comb[:, :1], const1), comb[:, 1:]], axis=-1
            )
            w_zeta, ok1 = divide(numer, zeta_m, zeta_inv_m)

            numer2 = jnp.concatenate(
                [mod_add(fr, z[:, :1], const2), z[:, 1:]], axis=-1
            )
            w_zw, ok2 = divide(_pad_last(numer2, L), zw_m, zw_inv_m)
            return from_mont(fr, w_zeta), from_mont(fr, w_zw), ok1 & ok2

        return kernel

    def round5(self, weights, const1, const2, zeta, zeta_omega, point_cls):
        """Opening quotients; returns ([W_zeta]1, [W_zeta_omega]1)."""
        kern = self._jit("r5", self._build_round5)
        r = self.fr.p
        w_raw, ww_raw, ok = kern(
            self._st["abc"], self._st["z"], *self._st["t_parts"],
            self._m(*weights), self._m(const1), self._m(const2),
            self._m(zeta), self._m(pow(zeta, -1, r)),
            self._m(zeta_omega), self._m(pow(zeta_omega, -1, r)),
        )
        if not bool(ok):
            raise AssertionError("opening quotient remainder is non-zero")
        return self._commit(w_raw, point_cls), self._commit(ww_raw, point_cls)
