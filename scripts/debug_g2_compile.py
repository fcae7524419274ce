"""Bisect the G2 Pippenger XLA-TPU compiler SIGABRT (round-3/4 bench
groth16 crash: "Check failed: limits[i] <= dim(i) (8 vs 1)").

Each variant runs in a fresh process (a TPU compile failure poisons the
session). Usage:

    python scripts/debug_g2_compile.py --variant pallas 15
    python scripts/debug_g2_compile.py --variant nopallas 15
    python scripts/debug_g2_compile.py --variant g1pallas 15
"""

import os
import random
import sys
import time


def main(variant, logn):
    if variant == "nopallas":
        os.environ["ZKSNAKE_NO_PALLAS"] = "1"
    import numpy as np
    import jax
    import jax.numpy as jnp
    from zksnake_tpu.backend import config as _cfg

    _cfg.jax_available()
    from zksnake_tpu.backend.field import FieldSpec
    from zksnake_tpu.backend.curve_ops import get_group_spec
    from zksnake_tpu.backend.msm import _scalar_limbs, msm_device_raw
    from zksnake_tpu.curves import ec_bn254

    curve = ec_bn254._curve
    fr = FieldSpec.get(curve.r)
    group = 1 if variant == "g1pallas" else 2
    gs = get_group_spec(curve, group)
    G = ec_bn254.g1() if group == 1 else ec_bn254.g2()
    rng = random.Random(0xD1)

    n = 1 << logn
    base = [G * (i + 1) for i in range(64)]
    P64 = gs.points_to_device(base)
    P = jax.tree_util.tree_map(lambda t: jnp.tile(t, (1, n // 64)), P64)
    scalars = [rng.randrange(curve.r) for _ in range(n)]
    slimbs = jnp.asarray(_scalar_limbs(scalars, curve.r, fr.nl))

    t0 = time.time()
    res = msm_device_raw(gs, P, slimbs)
    leaf = jax.tree_util.tree_leaves(res)[0]
    np.asarray(leaf[:1])
    print(f"@@OK@@ {variant} 2^{logn} compiled+ran in {time.time()-t0:.0f}s", flush=True)

    total = 0
    for i, s in enumerate(scalars):
        total += s * (i % 64 + 1)
    want = G * (total % curve.r)
    cls = type(G)
    got = gs.points_from_device(
        jax.tree_util.tree_map(lambda t: t[..., None], res), cls
    )[0]
    print("@@CORRECT@@", got == want, flush=True)


if __name__ == "__main__":
    main(sys.argv[sys.argv.index("--variant") + 1], int(sys.argv[-1]))
