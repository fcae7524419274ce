"""Isolate the G2 Pippenger TPU compile crash to a kernel piece.

Variants (each in a fresh process):
  bucket   — bucket_accumulate_pallas alone on a random G2 table
  addaff   — one gs.add_affine as a plain jit graph (no pallas)
  reduce   — suffix-scan + tree reduction fori graph alone
  sort     — the payload sort + searchsorted prologue alone
  horner   — the cross-window Horner fori alone

Usage: python scripts/debug_g2_kernel.py <variant> [group]
"""

import random
import sys
import time

import numpy as np


def main(variant, group=2):
    import jax
    import jax.numpy as jnp
    from zksnake_tpu.backend import config as _cfg

    _cfg.jax_available()
    from zksnake_tpu.backend import pallas_field
    from zksnake_tpu.backend.field import FieldSpec
    from zksnake_tpu.backend.curve_ops import get_group_spec
    from zksnake_tpu.curves import ec_bn254

    curve = ec_bn254._curve
    gs = get_group_spec(curve, group)
    fs = gs.fs
    nl = fs.nl
    rng = np.random.default_rng(7)
    B = 1024
    R = 16

    t0 = time.time()
    if variant == "bucket":
        ident = gs.identity((B,))
        L = len(jax.tree_util.tree_leaves((ident[0], ident[1])))
        PL = nl // 2
        table = jnp.asarray(
            rng.integers(0, 1 << 30, size=(R, L * PL, B)).astype(np.uint32)
        )
        valid = jnp.asarray(np.zeros((R, B), np.int32))  # all masked: result = identity

        @jax.jit
        def run(table, valid):
            return pallas_field.bucket_accumulate_pallas(gs, table, valid, R, B)

        out = run(table, valid)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
    elif variant == "addaff":
        G = ec_bn254.g1() if group == 1 else ec_bn254.g2()
        pts = [G * (i + 1) for i in range(B)]
        P = gs.points_to_device(pts)
        Q = gs.identity((B,))

        @jax.jit
        def run(Px, Py, Pz, Q):
            return gs.add_affine(Q, (Px, Py))

        out = run(P[0], P[1], P[2], Q)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
    elif variant == "reduce":
        from zksnake_tpu.backend.msm import _tree_reduce

        Wp = 24
        buckets = gs.identity((Wp, B))
        iota_b = jnp.arange(B, dtype=jnp.int32)

        @jax.jit
        def run(buckets):
            def suffix_body(i, T):
                sh = 1 << i
                Q = jax.tree_util.tree_map(
                    lambda t: jnp.roll(t, -sh, axis=-1), T
                )
                cand = gs.add(T, Q)
                return gs.select(iota_b < B - sh, cand, T)

            T = jax.lax.fori_loop(0, 10, suffix_body, buckets)
            return _tree_reduce(gs, T, B)

        out = run(buckets)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
    elif variant == "horner":
        Wp = 24
        wsums = gs.identity((Wp,))

        @jax.jit
        def run(wsums):
            def horner(j, Rpt):
                Rpt = jax.lax.fori_loop(0, 13, lambda i, Q: gs.double(Q), Rpt)
                wj = jax.tree_util.tree_map(
                    lambda t: jax.lax.dynamic_index_in_dim(
                        t, j, axis=-1, keepdims=False
                    ),
                    wsums,
                )
                return gs.add(Rpt, wj)

            return jax.lax.fori_loop(0, Wp, horner, gs.identity(()))

        out = run(wsums)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    else:
        raise ValueError(variant)
    print(f"@@OK@@ {variant} G{group} compiled+ran in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__" and not sys.argv[1].startswith("whileadd"):
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    sys.exit(0)
# appended variants: loop-wrapped adds (compile-time pathology bisect)


def main2(variant, group=2):
    import jax
    import jax.numpy as jnp
    from zksnake_tpu.backend import config as _cfg

    _cfg.jax_available()
    from zksnake_tpu.backend.curve_ops import get_group_spec, DevFq2
    from zksnake_tpu.curves import ec_bn254

    if variant.endswith("_unstacked"):
        from zksnake_tpu.backend.field import mont_mul, mod_add, mod_sub

        def mul_many_naive(self, pairs):
            out = []
            f = self.fs
            for (a0, a1), (b0, b1) in pairs:
                t0 = mont_mul(f, a0, b0)
                t1 = mont_mul(f, a1, b1)
                t2 = mont_mul(f, mod_add(f, a0, a1), mod_add(f, b0, b1))
                out.append(
                    (mod_sub(f, t0, t1), mod_sub(f, mod_sub(f, t2, t0), t1))
                )
            return out

        DevFq2.mul_many = mul_many_naive

    import time
    import numpy as np

    curve = ec_bn254._curve
    gs = get_group_spec(curve, group)
    B = 1024
    G = ec_bn254.g1() if group == 1 else ec_bn254.g2()
    pts = [G * (i + 1) for i in range(B)]
    P = gs.points_to_device(pts)

    t0 = time.time()

    @jax.jit
    def run(Px, Py, Pz):
        def body(state):
            k, acc = state
            acc2 = gs.add_affine(acc, (Px, Py))
            return (k + 1, acc2)

        _, acc = jax.lax.while_loop(
            lambda s: s[0] < 64, body, (jnp.int32(0), gs.identity((B,)))
        )
        return acc

    out = run(P[0], P[1], P[2])
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
    print(f"@@OK@@ {variant} G{group} compiled+ran in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__" and sys.argv[1].startswith("whileadd"):
    main2(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    sys.exit(0)
