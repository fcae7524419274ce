"""PlonK proof system (https://eprint.iacr.org/2019/953.pdf, vanilla/paper
version).

Behavioral parity with /root/reference/python/zksnake/plonk/protocol.py:
universal setup with optional external powers of tau, cosets k1=2/k2=3,
5-round prover, D/F/E-combination verifier, and a bit-exact Fiat-Shamir
schedule (SURVEY.md §7 hard part #3). Original implementation:

- Above PLONK_DEVICE_THRESHOLD the prover runs the fused device pipeline
  (backend/plonk_device.py) — every NTT, permutation scan, quotient fold,
  polynomial evaluation, and opening division on device; the host only
  orchestrates the transcript. Proof bytes are identical to the host path
  under the same blinding draw.
- Both paths derive round 5 from one shared linearization: the W_zeta
  numerator is a single weighted combination of 15 cached polynomials whose
  scalar weights come from the round-4 evaluations
  (_linearization_weights), rather than re-deriving R inline.
"""

from ..arithmetization.plonkish import Plonkish
from ..ecc import EllipticCurve
from ..polynomial import (
    Polynomial,
    add_over_evaluation_domain,
    barycentric_eval,
    evaluate_vanishing_polynomial,
    fft,
    get_all_evaluation_points,
    get_evaluation_point,
    ifft,
    mul_over_evaluation_domain,
    mul_over_fft,
)
from ..transcript import FiatShamirTranscript
from ..utils import batch_modinv, get_random_int
from .serialization import SELECTOR_KEYS, Proof, ProvingKey, VerifyingKey

K1 = 2
K2 = 3


class Plonk:
    """PlonK over `BN254` or `BLS12_381`, built from compiled Plonkish
    constraints."""

    def __init__(self, constraints: Plonkish, curve: str = "BN254"):
        self.E = EllipticCurve(curve)
        self.order = self.E.order
        if getattr(constraints, "p", self.order) != self.order:
            # the reference silently proves over the wrong field when the
            # Plonkish was compiled for another curve (its public-input
            # negation uses Plonkish.p) — fail loudly instead; divergence
            # documented in PARITY.md (invalid-usage guard only)
            raise ValueError(
                "Plonkish was built for a different curve/field than "
                f"{curve}: pass the same curve to Plonkish(cs, curve)"
            )
        self.constraints = constraints
        self.label = "PlonK"
        self.G1_tau = None
        self.G2_tau = None
        self.proving_key = None
        self.verifying_key = None
        self._roots = []
        self._tau_dev = None
        self._dev_prover = None

    # -- commitments -------------------------------------------------------

    def _commit(self, tau_g1, coeffs):
        """MSM of coeffs against the tau powers; large circuits use the
        device Pippenger with a cached device-resident point set (scalars are
        zero-padded to the full SRS length so one compiled kernel serves
        every commitment in the protocol)."""
        from ..backend import config as _cfg

        n_full = len(tau_g1)
        if not _cfg.use_device(n_full, _cfg.MSM_DEVICE_THRESHOLD):
            return self.E.multiexp(tau_g1, coeffs)

        import numpy as np
        import jax
        import jax.numpy as jnp
        from ..backend.curve_ops import get_group_spec
        from ..backend.msm import msm_device_raw, _scalar_limbs
        from ..backend.field import FieldSpec
        from ..curves.params import CURVES

        curve = CURVES[self.E.name]
        gs = get_group_spec(curve, 1)
        fr = FieldSpec.get(curve.r)
        if self._tau_dev is None or self._tau_dev[0] is not tau_g1:
            self._tau_dev = (tau_g1, gs.points_to_device(tau_g1))
        pts = self._tau_dev[1]
        coeffs = list(coeffs)[:n_full]
        coeffs = coeffs + [0] * (n_full - len(coeffs))
        slimbs = jnp.asarray(_scalar_limbs(coeffs, curve.r, fr.nl))
        res = msm_device_raw(gs, pts, slimbs)
        return gs.points_from_device(
            jax.tree_util.tree_map(lambda t: np.asarray(t)[..., None], res),
            self.E.curve.PointG1,
        )[0]

    # -- setup ---------------------------------------------------------------

    def setup(self, g1_tau=None, g2_tau=None):
        """Universal trusted setup; optionally resume from external powers
        of tau (the reference's checkpoint path, its protocol.py:53-57)."""
        n = self.constraints.length
        p = self.order

        if not g1_tau:
            tau = get_random_int(p - 1)
            powers = []
            acc = 1
            for _ in range(n + 6):
                powers.append(acc)
                acc = acc * tau % p
            self.G1_tau = self.E.batch_mul(self.E.G1(), powers)
            self.G2_tau = self.E.G2() * tau
        else:
            # Resume from an external powers-of-tau ceremony (the reference's
            # documented checkpoint path, its protocol.py:53-57 — whose own
            # assert is inverted and would reject a sufficient SRS; we match
            # the documented semantics, divergence recorded in PARITY.md).
            if len(g1_tau) < n + 6:
                raise ValueError("Constraints are too big for the given g1_tau")
            if g2_tau is None:
                raise ValueError("g2_tau is required alongside g1_tau")
            self.G1_tau = list(g1_tau)
            self.G2_tau = g2_tau

        roots = get_all_evaluation_points(n, p)
        self._roots = roots

        # identity and copy-permutation tables over the 3n wire slots
        ids = (
            roots
            + [K1 * w % p for w in roots]
            + [K2 * w % p for w in roots]
        )
        perm = self.constraints.permutation
        sigma_cols = [
            [ids[perm[slot + lane * n]] for slot in range(n)] for lane in range(3)
        ]

        selector_vectors = {
            "L": self.constraints.qL,
            "R": self.constraints.qR,
            "O": self.constraints.qO,
            "M": self.constraints.qM,
            "C": self.constraints.qC,
        }
        selector_poly = {
            k: Polynomial(ifft(v, p), p) for k, v in selector_vectors.items()
        }
        selector_evaluations = {
            k: fft(poly.coeffs(), p, 4 * n) for k, poly in selector_poly.items()
        }
        sigma_polys = [Polynomial(ifft(col, p), p) for col in sigma_cols]
        identity_polys = [Polynomial(ifft(ids[i * n : (i + 1) * n], p), p)
                          for i in range(3)]

        tau_selector = {
            k: self._commit(self.G1_tau, selector_poly[k].coeffs())
            for k in SELECTOR_KEYS
        }
        tau_permutation = [
            self._commit(self.G1_tau, poly.coeffs()) for poly in sigma_polys
        ]

        # L1 (the first Lagrange basis poly) cached as 4n evaluations
        L1 = Polynomial(ifft([1] + [0] * (n - 1), p), p)
        lagrange_evals = fft(L1.coeffs(), p, 4 * n)

        self.proving_key = ProvingKey(
            n, self.G1_tau, selector_poly, selector_evaluations,
            sigma_polys, identity_polys, tau_selector, tau_permutation,
            lagrange_evals, self.E.name,
        )
        self.verifying_key = VerifyingKey(
            n, self.G2_tau, tau_selector, tau_permutation, self.E.name
        )

    # -- prover --------------------------------------------------------------

    def _device_prover(self):
        """Fused device pipeline when the domain crosses the threshold."""
        from ..backend import config as _cfg

        n = self.proving_key.n
        if not _cfg.use_device(n, _cfg.PLONK_DEVICE_THRESHOLD) or n < 8:
            return None
        if self._dev_prover is None:
            from ..backend.plonk_device import PlonkDeviceProver
            from ..curves.params import CURVES

            self._dev_prover = PlonkDeviceProver(
                self.proving_key, CURVES[self.E.name]
            )
        return self._dev_prover

    def _init_transcript(self, public_witness):
        transcript = FiatShamirTranscript(field=self.order)
        for key in SELECTOR_KEYS:
            transcript.append(self.proving_key.tau_selector_poly[key])
        for point in self.proving_key.tau_permutation_poly:
            transcript.append(point)
        for value in public_witness.values():
            transcript.append(value)
        return transcript

    def _split_wires(self, public_witness, private_witness):
        n = self.proving_key.n
        lanes = [private_witness[lane::3] for lane in range(3)]
        lanes = [lane + [0] * (n - len(lane)) for lane in lanes]
        pub_vec = [0] * n
        for gate, value in public_witness.items():
            pub_vec[gate] = value
        return lanes, pub_vec

    def prove(self, public_witness: dict, private_witness: list):
        """Prove statement from Plonkish constraints."""
        blinds = [get_random_int(self.order - 1) for _ in range(11)]
        return self._prove_with_blinding(public_witness, private_witness, blinds)

    def _prove_with_blinding(self, public_witness, private_witness, blinds,
                             force_host=False):
        """blinds = [a0,a1, b0,b1, c0,c1, z0,z1,z2, t0,t1] — factored out so
        the host/device byte-identity test can fix the randomness."""
        if not self.proving_key:
            raise RuntimeError("ProvingKey has not been generated")
        if not self._roots:
            self._roots = get_all_evaluation_points(self.proving_key.n, self.order)

        (a, b, c), pub_vec = self._split_wires(public_witness, private_witness)
        transcript = self._init_transcript(public_witness)

        dev = None if force_host else self._device_prover()
        if dev is not None:
            return self._prove_device(dev, transcript, a, b, c, pub_vec, blinds)
        return self._prove_host(transcript, a, b, c, pub_vec, blinds)

    # ---- shared round-5 derivation ----

    def _linearization_weights(self, beta, gamma, alpha, zeta, v, evals, pi_zeta):
        """Scalar weights for the W_zeta numerator as a combination of
        [QL QR QO QM QC | Z | sigma3 | T_lo T_mid T_hi | A B C | s1 s2],
        plus its constant term and the second opening's constant.

        Algebra identical to the reference's linearization R (its
        protocol.py:413-442) merged with the v-fold of round 5 (:457-464)."""
        p = self.order
        n = self.proving_key.n
        z_a, z_b, z_c, z_s1, z_s2, z_zw = evals

        l1_zeta = barycentric_eval(n, {0: 1}, zeta, p)
        zh_zeta = evaluate_vanishing_polynomial(n, zeta, p)
        gate_nom = (
            (z_a + beta * zeta + gamma)
            * (z_b + beta * K1 * zeta + gamma)
            * (z_c + beta * K2 * zeta + gamma)
        ) % p
        gate_den = ((z_a + beta * z_s1 + gamma) * (z_b + beta * z_s2 + gamma)) % p

        v_pows = [pow(v, i, p) for i in range(1, 6)]
        weights = [
            z_a, z_b, z_c, z_a * z_b % p, 1,
            (alpha * gate_nom + alpha * alpha % p * l1_zeta) % p,
            (-alpha * beta * gate_den * z_zw) % p,
            (-zh_zeta) % p,
            (-zh_zeta * pow(zeta, n, p)) % p,
            (-zh_zeta * pow(zeta, 2 * n, p)) % p,
        ] + v_pows
        const1 = (
            pi_zeta
            - alpha * gate_den * (z_c + gamma) * z_zw
            - alpha * alpha * l1_zeta
            - sum(w * e for w, e in zip(v_pows, evals[:5]))
        ) % p
        const2 = (-z_zw) % p
        return weights, const1, const2

    # ---- device prover ----

    def _prove_device(self, dev, transcript, a, b, c, pub_vec, blinds):
        P1 = self.E.curve.PointG1
        p = self.order

        commit_abc = dev.round1(a, b, c, pub_vec, blinds[:6], P1)
        for point in commit_abc:
            transcript.append(point)
        beta = transcript.get_challenge_scalar()
        gamma = transcript.get_challenge_scalar()

        commit_z = dev.round2(beta, gamma, blinds[6:9], P1)
        transcript.append(commit_z)
        alpha = transcript.get_challenge_scalar()

        commit_t = dev.round3(alpha, blinds[9:11], P1)
        for point in commit_t:
            transcript.append(point)
        zeta = transcript.get_challenge_scalar()

        *evals, pi_zeta = dev.round4(zeta)
        for value in evals:
            transcript.append(value)
        v = transcript.get_challenge_scalar()

        weights, const1, const2 = self._linearization_weights(
            beta, gamma, alpha, zeta, v, evals, pi_zeta
        )
        w_zeta, w_zeta_omega = dev.round5(
            weights, const1, const2, zeta, zeta * self._roots[1] % p, P1
        )
        return Proof(*commit_abc, commit_z, *commit_t, w_zeta, w_zeta_omega, *evals)

    # ---- host prover ----

    def _blinded_poly(self, values, rands):
        """Interpolation of `values` + (b0 + b1 x) * (X^n - 1)."""
        p = self.order
        n = self.proving_key.n
        mask = Polynomial(list(rands), p, n)
        return Polynomial(ifft(values, p), p) + mask.multiply_by_vanishing_poly()

    def _prove_host(self, transcript, a, b, c, pub_vec, blinds):
        p = self.order
        pk = self.proving_key
        n = pk.n
        n4 = 4 * n
        sel_eval = pk.selector_eval
        commit = lambda poly: self._commit(pk.tau_g1, poly.coeffs())

        # ROUND 1 — blinded wire polynomials + gate product on the 4n domain
        A = self._blinded_poly(a, blinds[0:2])
        B = self._blinded_poly(b, blinds[2:4])
        C = self._blinded_poly(c, blinds[4:6])
        PI = Polynomial(ifft(pub_vec, p), p)

        ext = {
            name: fft(poly.coeffs(), p, n4)
            for name, poly in (("a", A), ("b", B), ("c", C), ("pi", PI))
        }
        pointwise = lambda x, y: mul_over_evaluation_domain(n4, x, y, p)
        g_eval = add_over_evaluation_domain(
            n4,
            [
                pointwise(ext["a"], sel_eval["L"]),
                pointwise(ext["b"], sel_eval["R"]),
                pointwise(ext["c"], sel_eval["O"]),
                pointwise(pointwise(ext["a"], ext["b"]), sel_eval["M"]),
                sel_eval["C"],
                ext["pi"],
            ],
            p,
        )
        G = Polynomial(ifft(g_eval, p), p, n)

        commit_abc = [commit(A), commit(B), commit(C)]
        for point in commit_abc:
            transcript.append(point)
        beta = transcript.get_challenge_scalar()
        gamma = transcript.get_challenge_scalar()

        # ROUND 2 — permutation accumulator z(X)
        id1, id2, id3 = pk.identity_poly
        s1, s2, s3 = pk.permutation_poly

        def shifted_product(w1, w2, w3):
            rows = [
                fft((wire + table * beta + gamma).coeffs(), p, n4)
                for wire, table in ((A, w1), (B, w2), (C, w3))
            ]
            return pointwise(pointwise(rows[0], rows[1]), rows[2])

        nom_eval = shifted_product(id1, id2, id3)
        den_eval = shifted_product(s1, s2, s3)
        nom_poly = Polynomial(ifft(nom_eval, p), p)
        den_poly = Polynomial(ifft(den_eval, p), p)

        # accumulator over the base domain (stride-4 samples of the 4n grid)
        den_inv = batch_modinv(den_eval[::4][:n], p)
        acc = [1]
        for i in range(n):
            acc.append(acc[-1] * nom_eval[4 * i] * den_inv[i] % p)
        if acc.pop() != 1:
            raise AssertionError("Copy constraints are not satisfied")
        Z = Polynomial(list(blinds[6:9]), p, n).multiply_by_vanishing_poly() + Polynomial(
            ifft(acc, p), p
        )
        commit_z = commit(Z)
        transcript.append(commit_z)
        alpha = transcript.get_challenge_scalar()

        # ROUND 3 — quotient T = (G + alpha*(nom*Z - den*Zw) + alpha^2*(Z-1)*L1) / Zh
        Z_omega = Polynomial(
            [
                coeff * self._roots[i % n] % p
                for i, coeff in enumerate(Z.coeffs())
            ],
            p,
        )
        nom_z = mul_over_fft(n, nom_poly, Z, p)
        den_zw = mul_over_fft(n, den_poly, Z_omega, p)
        z1_l1 = Polynomial(
            ifft(
                pointwise(fft((Z - 1).coeffs(), p, n4), pk.lagrange_evals), p
            ),
            p,
        )
        T, remainder = (
            G + (nom_z - den_zw) * alpha + z1_l1 * (alpha * alpha % p)
        ).divide_by_vanishing_poly()
        if not remainder.is_zero():
            raise AssertionError("quotient remainder is non-zero")

        t = T.coeffs()
        x_n = Polynomial([0] * n + [1], p)
        b_lo, b_hi = blinds[9:11]
        T_lo = Polynomial(t[:n], p) + x_n * b_lo
        T_mid = Polynomial(t[n : 2 * n], p) - b_lo + x_n * b_hi
        T_hi = Polynomial(t[2 * n :], p) - b_hi

        commit_t = [commit(T_lo), commit(T_mid), commit(T_hi)]
        for point in commit_t:
            transcript.append(point)
        zeta = transcript.get_challenge_scalar()

        # ROUND 4 — opening evaluations
        evals = [
            A(zeta), B(zeta), C(zeta), s1(zeta), s2(zeta), Z_omega(zeta)
        ]
        for value in evals:
            transcript.append(value)
        v = transcript.get_challenge_scalar()

        # ROUND 5 — W_zeta as the shared weighted combination, then the two
        # opening divisions
        weights, const1, const2 = self._linearization_weights(
            beta, gamma, alpha, zeta, v, evals, PI(zeta)
        )
        basis = (
            [pk.selector_poly[k] for k in SELECTOR_KEYS]
            + [Z, s3, T_lo, T_mid, T_hi, A, B, C, s1, s2]
        )
        numerator = Polynomial([const1], p)
        for weight, poly in zip(weights, basis):
            numerator += poly * weight

        W_zeta, rem1 = numerator / Polynomial([(-zeta) % p, 1], p)
        zeta_omega = zeta * self._roots[1] % p
        W_zeta_omega, rem2 = (Z + const2) / Polynomial([(-zeta_omega) % p, 1], p)
        if not (rem1.is_zero() and rem2.is_zero()):
            raise AssertionError("opening quotient remainder is non-zero")

        return Proof(
            *commit_abc, commit_z, *commit_t,
            commit(W_zeta), commit(W_zeta_omega), *evals,
        )

    # -- verifier ------------------------------------------------------------

    def _replay_challenges(self, proof: Proof, public_input: dict):
        transcript = FiatShamirTranscript(field=self.order)
        for key in SELECTOR_KEYS:
            transcript.append(self.verifying_key.tau_selector_poly[key])
        for point in self.verifying_key.tau_permutation_poly:
            transcript.append(point)
        for value in public_input.values():
            transcript.append(value)

        transcript.append(proof.tau_a)
        transcript.append(proof.tau_b)
        transcript.append(proof.tau_c)
        beta = transcript.get_challenge_scalar()
        gamma = transcript.get_challenge_scalar()

        transcript.append(proof.tau_z)
        alpha = transcript.get_challenge_scalar()

        transcript.append(proof.tau_t_lo)
        transcript.append(proof.tau_t_mid)
        transcript.append(proof.tau_t_hi)
        zeta = transcript.get_challenge_scalar()

        for value in (proof.zeta_a, proof.zeta_b, proof.zeta_c,
                      proof.zeta_sigma1, proof.zeta_sigma2, proof.zeta_omega):
            transcript.append(value)
        v = transcript.get_challenge_scalar()

        transcript.append(proof.tau_W_zeta)
        transcript.append(proof.tau_W_zeta_omega)
        u = transcript.get_challenge_scalar()
        return beta, gamma, alpha, zeta, v, u

    def verify(self, proof: Proof, public_input: dict):
        """Verify a proof against the public inputs."""
        if not self.verifying_key:
            raise RuntimeError("VerifyingKey has not been generated")
        vk = self.verifying_key
        p = self.order
        n = vk.n

        beta, gamma, alpha, zeta, v, u = self._replay_challenges(
            proof, public_input
        )
        omega = self._roots[1] if self._roots else get_evaluation_point(n, 1, p)

        zh_zeta = evaluate_vanishing_polynomial(n, zeta, p)
        l1_zeta = barycentric_eval(n, {0: 1}, zeta, p)
        pi_zeta = barycentric_eval(n, public_input, zeta, p)
        alpha2 = alpha * alpha % p

        gate_den = (
            (proof.zeta_a + beta * proof.zeta_sigma1 + gamma)
            * (proof.zeta_b + beta * proof.zeta_sigma2 + gamma)
        ) % p
        r0 = (
            pi_zeta
            - l1_zeta * alpha2
            - gate_den * (proof.zeta_c + gamma) * proof.zeta_omega * alpha
        ) % p

        gate_nom = (
            (proof.zeta_a + beta * zeta + gamma)
            * (proof.zeta_b + beta * K1 * zeta + gamma)
            * (proof.zeta_c + beta * K2 * zeta + gamma)
        ) % p

        sel = vk.tau_selector_poly
        tau_D = (
            (proof.zeta_a * proof.zeta_b % p) * sel["M"]
            + proof.zeta_a * sel["L"]
            + proof.zeta_b * sel["R"]
            + proof.zeta_c * sel["O"]
            + sel["C"]
            + ((gate_nom * alpha + l1_zeta * alpha2 + u) % p) * proof.tau_z
            - ((gate_den * alpha * beta * proof.zeta_omega) % p)
            * vk.tau_permutation_poly[2]
            - zh_zeta
            * (
                proof.tau_t_lo
                + pow(zeta, n, p) * proof.tau_t_mid
                + pow(zeta, 2 * n, p) * proof.tau_t_hi
            )
        )

        v_pows = [pow(v, i, p) for i in range(1, 6)]
        tau_F = (
            tau_D
            + proof.tau_a * v_pows[0]
            + proof.tau_b * v_pows[1]
            + proof.tau_c * v_pows[2]
            + vk.tau_permutation_poly[0] * v_pows[3]
            + vk.tau_permutation_poly[1] * v_pows[4]
        )

        e_scalar = (
            -r0
            + sum(
                w * e
                for w, e in zip(
                    v_pows,
                    (proof.zeta_a, proof.zeta_b, proof.zeta_c,
                     proof.zeta_sigma1, proof.zeta_sigma2),
                )
            )
            + u * proof.zeta_omega
        ) % p
        tau_E = e_scalar * self.E.G1()

        lhs = self.E.pairing(
            proof.tau_W_zeta + u * proof.tau_W_zeta_omega, vk.tau_g2
        )
        rhs = self.E.pairing(
            zeta * proof.tau_W_zeta
            + (u * zeta * omega % p) * proof.tau_W_zeta_omega
            + tau_F
            - tau_E,
            self.E.G2(),
        )
        return lhs == rhs
