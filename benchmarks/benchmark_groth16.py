"""Groth16 timing harness over the reference's benchmark workload shape
(multiplication-chain circuit out = inp^(2^k); reference
benchmarks/benchmark_groth16.py:12-57) with per-phase wall-clock prints."""

import time
import sys

from zksnake_tpu.arithmetization import Var, ConstraintSystem
from zksnake_tpu.arithmetization.r1cs import R1CS
from zksnake_tpu.constant import BN254_SCALAR_FIELD
from zksnake_tpu.groth16 import Groth16


def run(n_power, crv):
    time_results = []

    v = []
    inp = Var("inp")
    out = Var("out")
    for i in range(n_power - 1):
        v.append(Var(f"v{i}"))

    cs = ConstraintSystem(["inp"], ["out"], BN254_SCALAR_FIELD)

    cs.add_constraint(v[0] == inp * inp)
    for i in range(1, n_power - 1):
        cs.add_constraint(v[i] == v[i - 1] * inp)

    cs.add_constraint(out == v[n_power - 2])
    cs.set_public(out)

    start = time.time()
    r1cs = R1CS(cs, crv)
    r1cs.compile()
    time_results.append(time.time() - start)

    start = time.time()
    pub, priv = r1cs.generate_witness(cs.solve({"inp": 2}))
    time_results.append(time.time() - start)

    start = time.time()
    groth16 = Groth16(r1cs, crv)
    groth16.setup()
    time_results.append(time.time() - start)

    start = time.time()
    proof = groth16.prove(pub, priv)
    time_results.append(time.time() - start)

    # second prove shows steady-state (kernels compiled, PK device-resident)
    start = time.time()
    proof = groth16.prove(pub, priv)
    time_results.append(time.time() - start)

    start = time.time()
    assert groth16.verify(proof, pub)
    time_results.append(time.time() - start)

    return time_results


if __name__ == "__main__":
    sizes = sys.argv[1:] or ["10", "11", "12", "13", "14", "15", "16"]
    for k in sizes:
        n = 2 ** int(k)
        result = run(n, "BN254")
        print(f"{n} constraints with BN254 curve")
        print("=" * 50)
        print("Compile time:", result[0])
        print("Witness gen time:", result[1])
        print("Setup time:", result[2])
        print("Prove time (cold):", result[3])
        print("Prove time (warm):", result[4])
        print("Verify time:", result[5])
        print(flush=True)
