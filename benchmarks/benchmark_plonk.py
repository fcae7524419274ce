"""PlonK timing harness over the reference's benchmark workload shape
(multiplication-chain circuit out = inp^(2^k); reference
benchmarks/benchmark_plonk.py:27-58) with per-phase wall-clock prints.

Like benchmark_groth16.py, a second warm prove is timed separately: the first
prove pays one-time kernel compilation, the second shows the steady state the
BASELINE metric cares about (device-resident SRS, cached jits)."""

import time
import sys

from zksnake_tpu.arithmetization import Var, ConstraintSystem
from zksnake_tpu.arithmetization.plonkish import Plonkish
from zksnake_tpu.constant import BN254_SCALAR_FIELD
from zksnake_tpu.plonk import Plonk


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
    plonkish = Plonkish(cs, crv)
    plonkish.compile()
    time_results.append(time.time() - start)

    start = time.time()
    pub, priv = plonkish.generate_witness(cs.solve({"inp": 2}))
    time_results.append(time.time() - start)

    start = time.time()
    plonk = Plonk(plonkish, crv)
    plonk.setup()
    time_results.append(time.time() - start)

    start = time.time()
    proof = plonk.prove(pub, priv)
    time_results.append(time.time() - start)

    start = time.time()
    proof = plonk.prove(pub, priv)
    time_results.append(time.time() - start)

    start = time.time()
    assert plonk.verify(proof, pub)
    time_results.append(time.time() - start)

    return time_results


if __name__ == "__main__":
    sizes = sys.argv[1:] or ["10", "11", "12", "13", "14"]
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
