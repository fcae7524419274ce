"""Circom Num2Bits import + Groth16 e2e, with hint assignments.

Mirrors the reference workflow (examples/example_bitify_circom.py): the
num2bits circuit's output bits are non-deterministic wires the solver cannot
derive symbolically, so each is assigned via an `unsafe_assign` hint closure.
"""

import os

from zksnake_tpu.arithmetization import Var
from zksnake_tpu.arithmetization.r1cs import R1CS
from zksnake_tpu.groth16 import Groth16

folder = os.path.dirname(__file__)
r1cs = R1CS.from_file(
    os.path.join(folder, "circom", "num2bits.r1cs"),
    os.path.join(folder, "circom", "num2bits.sym"),
)


def bit_hint(i):
    return lambda **kwargs: (kwargs["main.in"] >> i) & 1


for i in range(256):
    r1cs.constraint_system.unsafe_assign(
        Var(f"main.out[{i}]"), bit_hint(i), ("main.in",)
    )

solution = r1cs.constraint_system.solve({"main.in": 0xDEADF00D})

r1cs.compile()
pub, priv = r1cs.generate_witness(solution)

groth16 = Groth16(r1cs)
groth16.setup()

proof = groth16.prove(pub, priv)
print("Proof:", proof.to_bytes().hex())

assert groth16.verify(proof, pub)
print("Proof is valid!")
