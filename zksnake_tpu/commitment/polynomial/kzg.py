"""KZG polynomial commitment scheme with halo2-style multipoint opening.

API/semantics parity with
/root/reference/python/zksnake/commitment/polynomial/kzg.py.
"""

from collections import defaultdict
from ...transcript import FiatShamirTranscript
from ...polynomial import Polynomial, lagrange_interpolation
from ...utils import get_random_int
from ...ecc import EllipticCurve
from .base import MultiOpeningQuery, PolynomialCommitmentScheme


class KZG(PolynomialCommitmentScheme):

    def __init__(self, max_degree, group):
        super().__init__(max_degree, group)
        self.name = "KZG"
        self.E = EllipticCurve(self.group)
        self.order = self.E.order
        self.G1_tau = None
        self.G2_tau = None

    def setup(self):
        tau = get_random_int(self.order)
        power_of_tau = [pow(tau, i, self.order) for i in range(self.degree + 1)]

        self.G1_tau = self.E.batch_mul(self.E.G1(), power_of_tau)
        self.G2_tau = self.E.G2() * tau

        self.is_setup = True

    def zero_commitment(self):
        return self.E.curve.PointG1.identity()

    def commit(self, polynomial):
        assert self.is_setup, "Trusted setup has not been run"

        commitment = self.E.multiexp(self.G1_tau, polynomial.coeffs())
        return commitment

    def open(self, polynomial, point):
        assert self.is_setup, "Trusted setup has not been run"

        evaluation = polynomial(point)
        divisor_poly = Polynomial([-point % self.order, 1], self.order)
        quotient_poly, remainder = (polynomial - evaluation) / divisor_poly
        if not remainder.is_zero():
            raise ValueError("Given polynomial is not divided to zero")

        proof = self.E.multiexp(self.G1_tau, quotient_poly.coeffs())

        return proof, evaluation

    def verify(self, commitment, proof, point, evaluation, transcript=None):
        assert self.is_setup, "Trusted setup has not been run"

        lhs = self.E.pairing(proof, self.G2_tau - self.E.G2() * point)
        rhs = self.E.pairing(commitment - self.E.G1() * evaluation, self.E.G2())

        return lhs == rhs

    def _group_evaluation(
        self,
        points_query: MultiOpeningQuery,
        x: int,
        is_verifier=False,
    ):
        """Group polynomials (indexed by commitment) by shared opening-point
        sets, then x1-fold each group (kzg.py:62-128)."""

        group_map = defaultdict(set)
        for point, commitments in points_query.get_commitments():
            for commitment in commitments:
                group_map[commitment].add(point)

        result_map = defaultdict(set)
        for value, keys in group_map.items():
            result_map[frozenset(keys)].add(value)

        q_polys = []
        r_polys = []
        points_list = []
        for points, commitments in result_map.items():
            if not is_verifier:
                polys = [
                    points_query.to_polynomial(commitment) for commitment in commitments
                ]
                q = Polynomial([0], self.order)
                for i, poly in enumerate(polys):
                    q += pow(x, i, self.order) * poly
            else:
                q = self.zero_commitment()
                for i, comm in enumerate(commitments):
                    q += pow(x, i, self.order) * comm

            xs = []
            ys = []
            for i, point in enumerate(points):
                if not is_verifier:
                    evaluation = q(point)
                else:
                    evaluation = (
                        sum(
                            [
                                pow(x, j, self.order)
                                * points_query.get_evaluation(comm, point)
                                % self.order
                                for j, comm in enumerate(commitments)
                            ]
                        )
                        % self.order
                    )

                xs.append(point)
                ys.append(evaluation)

            r = lagrange_interpolation(xs, ys, self.order)

            q_polys.append(q)
            r_polys.append(r)
            points_list.append(list(points))

        return q_polys, r_polys, points_list

    def multi_open(self, points_query, transcript=None):
        """Halo2-style multipoint opening argument."""
        assert self.is_setup, "Trusted setup has not been run"

        transcript = transcript or FiatShamirTranscript(self.name.encode(), self.order)
        transcript.append(points_query.commitments)

        proof = []
        verifier_query = MultiOpeningQuery()
        for point, polys in points_query.get_polynomials():
            for poly in polys:
                evaluation = poly(point)
                comm = points_query.to_commitment(poly)
                verifier_query.verifier_query(comm, point, evaluation)

                transcript.append(evaluation)

        x1 = transcript.get_challenge_scalar()
        x2 = transcript.get_challenge_scalar()

        q_polys, r_polys, points_list = self._group_evaluation(points_query, x1)

        f_polys = []
        for i, points in enumerate(points_list):
            divisor = Polynomial([1], self.order)
            for point in points:
                divisor *= Polynomial([-point % self.order, 1], self.order)

            quotient, remainder = (q_polys[i] - r_polys[i]) / divisor
            assert remainder.is_zero()

            f_polys.append(quotient)

        f_poly = Polynomial([0], self.order)
        for i, poly in enumerate(f_polys):
            f_poly += pow(x2, i, self.order) * poly

        f_commitment = self.commit(f_poly)

        proof.append(f_commitment)
        transcript.append(f_commitment)
        x3 = transcript.get_challenge_scalar()

        q_polys_x3 = [q(x3) for q in q_polys]

        proof.extend(q_polys_x3)
        transcript.append(q_polys_x3)
        x4 = transcript.get_challenge_scalar()

        final_poly = f_poly
        for i, poly in enumerate(q_polys):
            final_poly += pow(x4, i + 1, self.order) * poly

        opening_proof, _ = self.open(final_poly, x3)
        proof.append(opening_proof)

        return proof, verifier_query

    def multi_verify(
        self,
        points_query: MultiOpeningQuery,
        proof: list,
        transcript: FiatShamirTranscript = None,
    ):
        assert self.is_setup, "Trusted setup has not been run"
        assert len(proof) > 2, "Invalid proof"

        transcript = transcript or FiatShamirTranscript(self.name.encode(), self.order)
        transcript.append(points_query.commitments)

        for point, commitments in points_query.get_commitments():
            for commitment in commitments:
                evaluation = points_query.get_evaluation(commitment, point)
                transcript.append(evaluation)

        x1 = transcript.get_challenge_scalar()
        x2 = transcript.get_challenge_scalar()

        f_commitment = proof.pop(0)
        opening_proof = proof.pop()
        q_polys_x3 = proof

        transcript.append(f_commitment)
        x3 = transcript.get_challenge_scalar()
        transcript.append(q_polys_x3)
        x4 = transcript.get_challenge_scalar()

        q_commitments, r_polys, points_list = self._group_evaluation(
            points_query, x1, True
        )

        # construct f_poly(x3)
        f_poly_x3 = 0
        for i, points in enumerate(points_list):
            denominator = 1
            for point in points:
                denominator = denominator * (x3 - point) % self.order

            numerator = (q_polys_x3[i] - r_polys[i](x3)) % self.order

            f_poly_x3 += (
                pow(x2, i, self.order)
                * numerator
                * pow(denominator, -1, self.order)
                % self.order
            )

        f_poly_x3 %= self.order

        # construct final_commitment
        final_commitment = f_commitment
        for i, commitment in enumerate(q_commitments):
            final_commitment += pow(x4, i + 1, self.order) * commitment

        # construct final_poly(x3)
        q_x4 = 0
        for i, q in enumerate(q_polys_x3):
            q_x4 += pow(x4, i + 1, self.order) * q

        final_poly_x3 = (f_poly_x3 + q_x4) % self.order

        return self.verify(final_commitment, opening_proof, x3, final_poly_x3)
