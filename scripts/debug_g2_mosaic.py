"""Bisect the G2 Mosaic (pallas) compile crash inside the kernel body.

Variants:
  addaff   — one gs.add_affine(G2) inside a minimal pallas kernel
  addaff1  — same but DevFq2.mul_many monkeypatched to per-pair muls
  fq2mul   — a single Fq2 (Karatsuba, stacked) product in-kernel
  fq2mul1  — a single Fq2 product via two separate stacked k=... calls
  fqmul3d  — one plain Fq mont_mul on a stacked (nl, 3, B) tensor in-kernel
  fqstack5 / fqstack6 / fqstack15 / fqstack18 — same at other stack widths
  select   — Fq2 select + is_zero in-kernel

Usage: python scripts/debug_g2_mosaic.py <variant>
"""

import sys
import time

import numpy as np


def main(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from zksnake_tpu.backend import config as _cfg

    _cfg.jax_available()
    from zksnake_tpu.backend import pallas_field
    from zksnake_tpu.backend.field import FieldSpec, mont_mul
    from zksnake_tpu.backend.curve_ops import get_group_spec, DevFq2
    from zksnake_tpu.curves import ec_bn254

    curve = ec_bn254._curve
    gs = get_group_spec(curve, 2)
    fs = gs.fs
    nl = fs.nl
    rng = np.random.default_rng(3)
    B = 1024

    def rnd():
        return jnp.asarray(rng.integers(0, 1 << 15, size=(nl, B)).astype(np.uint32))

    if variant == "addaff1":
        from zksnake_tpu.backend.field import mod_add, mod_sub

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

    n_in = {"addaff": 10, "addaff1": 10, "fq2mul": 4, "fq2mul1": 4,
            "fqmul3d": 2, "select": 4, "fqstack5": 2, "fqstack6": 2,
            "fqstack15": 2, "fqstack18": 2}[variant]
    ins = [rnd() for _ in range(n_in)]

    def kernel(*refs):
        in_refs = refs[:n_in]
        out_refs = refs[n_in:]
        vals = [r[...] for r in in_refs]
        pallas_field._STATE["in_kernel"] = True
        try:
            if variant in ("addaff", "addaff1"):
                P = ((vals[0], vals[1]), (vals[2], vals[3]), (vals[4], vals[5]))
                Q = ((vals[6], vals[7]), (vals[8], vals[9]))
                x3, y3, z3 = gs.add_affine(P, Q)
                outs = [x3[0], x3[1], y3[0], y3[1], z3[0], z3[1]]
            elif variant == "fq2mul":
                (c0, c1), = gs.F.mul_many([((vals[0], vals[1]), (vals[2], vals[3]))])
                outs = [c0, c1]
            elif variant == "fq2mul1":
                c0, c1 = gs.F.mul((vals[0], vals[1]), (vals[2], vals[3]))
                outs = [c0, c1]
            elif variant.startswith("fqmul3d") or variant.startswith("fqstack"):
                k = 3 if variant == "fqmul3d" else int(variant[7:])
                a = jnp.stack([vals[i % 2] for i in range(k)], axis=1)
                b = jnp.stack([vals[(i + 1) % 2] for i in range(k)], axis=1)
                p = mont_mul(fs, a, b)
                outs = [p[:, 0], p[:, k - 1]]
            elif variant == "select":
                cond = vals[0][0] > 0
                a = (vals[0], vals[1])
                b = (vals[2], vals[3])
                s = gs.F.select(cond, a, b)
                z = gs.F.is_zero(s)
                outs = [s[0], jnp.where(z[None], s[1], vals[0])]
        finally:
            pallas_field._STATE["in_kernel"] = False
        for oref, o in zip(out_refs, outs):
            oref[...] = o

    n_out = {"addaff": 6, "addaff1": 6, "fq2mul": 2, "fq2mul1": 2,
             "fqmul3d": 2, "select": 2, "fqstack5": 2, "fqstack6": 2,
             "fqstack15": 2, "fqstack18": 2}[variant]

    t0 = time.time()
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((nl, B), lambda i: (0, 0)) for _ in range(n_in)],
        out_specs=[pl.BlockSpec((nl, B), lambda i: (0, 0)) for _ in range(n_out)],
        out_shape=[jax.ShapeDtypeStruct((nl, B), jnp.uint32) for _ in range(n_out)],
        compiler_params=pallas_field._compiler_params(),
    )(*ins)
    np.asarray(out[0][:1, :1])
    print(f"@@OK@@ {variant} compiled+ran in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
