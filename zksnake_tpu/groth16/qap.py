"""R1CS -> QAP transformation.

API parity with /root/reference/python/zksnake/groth16/qap.py: domain padded
to next_pow2(n_row) (:32-40), witness evaluation via sparse dots + iFFT
interpolation + FFT-domain product + vanishing division (:53-69).
"""

from ..utils import next_power_of_two
from ..constant import BN254_SCALAR_FIELD
from ..arithmetization.r1cs import R1CS
from ..polynomial import (
    Polynomial,
    ifft,
    mul_over_fft,
)


class QAP:

    def __init__(self, p=None):
        self.a = []
        self.b = []
        self.c = []
        self.n_public = 0

        self.p = p or BN254_SCALAR_FIELD

    def from_r1cs(self, r1cs: R1CS):
        """Parse QAP from R1CS matrices"""
        assert r1cs.A is not None, "R1CS is not compiled"

        self.n_public = r1cs.n_public

        next_power_2 = next_power_of_two(r1cs.A.n_row)

        self.a = r1cs.A
        self.b = r1cs.B
        self.c = r1cs.C

        self.a.n_row = next_power_2
        self.b.n_row = next_power_2
        self.c.n_row = next_power_2

    def evaluate_witness(self, witness: list):
        """Evaluate QAP with the witness vector; returns U, V, W, H."""
        a = self.a.dot(witness)
        b = self.b.dot(witness)
        c = self.c.dot(witness)

        # polynomial interpolation via IFFT
        u = Polynomial(ifft(a, self.p), self.p)
        v = Polynomial(ifft(b, self.p), self.p)
        w = Polynomial(ifft(c, self.p), self.p)

        # UV = IFFT( FFT(U) * FFT(V) )
        uv = mul_over_fft(self.a.n_row, u, v, self.p)

        # H = (U * V - W) / Z
        hz = uv - w
        h, remainder = hz.divide_by_vanishing_poly()
        if not remainder.is_zero():
            raise ValueError("(U * V - W) did not divided by Z to zero")

        return u, v, w, h
