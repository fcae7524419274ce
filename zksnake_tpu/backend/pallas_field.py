"""Pallas TPU kernel for batched Montgomery multiplication.

The jnp formulation of mont_mul is HBM-bandwidth bound: XLA materializes most
of the ~3k elementwise intermediates, so each (nl, N) pass costs a full HBM
round trip (measured ~5.4ms for 2^18 — exactly N*4B*ops/BW). This kernel runs
the identical lazy-carry CIOS entirely in VMEM on (nl, BLOCK) tiles, so the
only HBM traffic is the two operand reads and one result write.

Falls back transparently to the jnp path off-TPU (interpret mode is only used
in tests).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .limbs import W, MASK

BLOCK = 1024


def _make_kernel_mxu(nl, p):
    """Pallas body for the SOS + MXU-reduction formulation (mxu_field):
    schoolbook on the VPU, both Montgomery-reduction products as byte-
    Toeplitz matmuls on the MXU. The matrices arrive as kernel inputs
    (Pallas forbids closure-captured constant arrays)."""

    def kernel(pm_ref, pp_ref, a_ref, b_ref, o_ref):
        from .field import FieldSpec
        from .mxu_field import mont_mul_mxu_cols

        fs = FieldSpec.get(p)
        a = a_ref[...]
        b = b_ref[...]
        mats = (pm_ref[...], pp_ref[...])
        o_ref[...] = mont_mul_mxu_cols(fs, a, b, (a.shape[1],), mats=mats)

    return kernel


def _make_kernel(nl, p_limbs, pinv):
    p_list = [int(x) for x in p_limbs]

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]  # (nl, BLOCK) uint32
        b = b_ref[...]
        zero = jnp.zeros((a.shape[1],), jnp.uint32)
        t = [zero] * (2 * nl + 1)

        for i in range(nl):
            prod = a[i][None, :] * b  # (nl, BLOCK)
            lo = prod & MASK
            hi = prod >> W
            for j in range(nl):
                t[i + j] = t[i + j] + lo[j]
                t[i + j + 1] = t[i + j + 1] + hi[j]

        for i in range(nl):
            m = ((t[i] & MASK) * pinv) & MASK
            for j in range(nl):
                prod = m * p_list[j]
                t[i + j] = t[i + j] + (prod & MASK)
                t[i + j + 1] = t[i + j + 1] + (prod >> W)
            t[i + 1] = t[i + 1] + (t[i] >> W)

        # carry normalize limbs nl..2nl-1
        out = []
        carry = zero
        for j in range(nl, 2 * nl):
            v = t[j] + carry
            out.append(v & MASK)
            carry = v >> W
        # conditional subtract p
        borrow = jnp.zeros_like(out[0], dtype=jnp.int32)
        diff = []
        for j in range(nl):
            d = out[j].astype(jnp.int32) - p_list[j] - borrow
            borrow = (d < 0).astype(jnp.int32)
            diff.append((d + (borrow << W)).astype(jnp.uint32))
        ge = borrow == 0
        res = [jnp.where(ge, diff[j], out[j]) for j in range(nl)]
        o_ref[...] = jnp.stack(res, axis=0)

    return kernel


@functools.lru_cache(maxsize=None)
def _compiled(nl, p_limbs_key, pinv, interpret, variant="cios"):
    from jax.experimental import pallas as pl

    if variant == "mxu":
        p = sum(int(x) << (W * i) for i, x in enumerate(p_limbs_key))
        kernel = _make_kernel_mxu(nl, p)

        from .field import FieldSpec
        from .mxu_field import reduction_mats_dev

        mat_shapes = [m.shape for m in reduction_mats_dev(FieldSpec.get(p))]
        mat_specs = [
            pl.BlockSpec(s, lambda i: (0, 0)) for s in mat_shapes
        ]

        @jax.jit
        def run(a, b):
            # the matrices MUST be materialized inside this trace: this
            # `run` is cached across callers by the enclosing lru_cache, and
            # device arrays created during whatever trace first built it
            # would leak into every later caller's trace (measured:
            # UnexpectedTracerError from the MSM suffix reduction when the
            # first call came from inside a fori body)
            pmat, ppmat = reduction_mats_dev(FieldSpec.get(p))
            m = a.shape[1]
            grid = m // BLOCK
            return pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=mat_specs
                + [
                    pl.BlockSpec((nl, BLOCK), lambda i: (0, i)),
                    pl.BlockSpec((nl, BLOCK), lambda i: (0, i)),
                ],
                out_specs=pl.BlockSpec((nl, BLOCK), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((nl, m), jnp.uint32),
                interpret=interpret,
                compiler_params=None if interpret else _compiler_params(),
            )(pmat, ppmat, a, b)

        return run

    kernel = _make_kernel(nl, p_limbs_key, pinv)

    @jax.jit
    def run(a, b):
        m = a.shape[1]
        grid = m // BLOCK
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((nl, BLOCK), lambda i: (0, i)),
                pl.BlockSpec((nl, BLOCK), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((nl, BLOCK), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((nl, m), jnp.uint32),
            interpret=interpret,
            compiler_params=None if interpret else _compiler_params(),
        )(a, b)

    return run


_STATE = {"checked": False, "on_tpu": False, "in_kernel": False}


def _compiler_params():
    """Raise Mosaic's scoped-VMEM budget above the 16MB default: the bucket
    accumulator's traced mixed-add needs ~4KB/lane of temporaries (measured:
    63MB at 16384 lanes — the round-1 on-hardware compile failure), and v5e
    has 128MB of VMEM to spend."""
    import os

    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        vmem_limit_bytes=int(
            os.environ.get("ZKSNAKE_VMEM_LIMIT", 100 * 1024 * 1024)
        )
    )


def _interpret():
    import os

    return os.environ.get("ZKSNAKE_PALLAS_INTERPRET", "0") == "1"


def pallas_available():
    import os

    if os.environ.get("ZKSNAKE_NO_PALLAS", "0") == "1":
        return False
    if _STATE["in_kernel"]:
        # already tracing inside a pallas kernel body: nested pallas_call is
        # invalid, use the jnp core
        return False
    if _interpret():
        # ZKSNAKE_PALLAS_INTERPRET=1: exercise the kernel logic on any
        # backend via the pallas interpreter (CPU validation of TPU kernels)
        return True
    if not _STATE["checked"]:
        try:
            _STATE["on_tpu"] = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            _STATE["on_tpu"] = False
        _STATE["checked"] = True
    return _STATE["on_tpu"]


def _mxu_mats(gs):
    """(inputs, specs) for the MXU-reduction matrices when
    ZKSNAKE_MXU_MONTMUL=1 — Pallas kernels can't capture constant arrays, so
    point kernels receive PMAT/PPMAT as leading inputs and publish them to
    mxu_field._KERNEL_MATS for the nested mont_mul calls."""
    from jax.experimental import pallas as pl
    from .field import _mxu_montmul

    if not _mxu_montmul():
        return [], []
    from .mxu_field import reduction_mats_dev

    pmat, ppmat = reduction_mats_dev(gs.fs)
    specs = [
        pl.BlockSpec(pmat.shape, lambda r: (0, 0)),
        pl.BlockSpec(ppmat.shape, lambda r: (0, 0)),
    ]
    return [pmat, ppmat], specs


class _published_mats:
    """Trace-time context: expose mat refs to nested mont_mul_mxu_cols."""

    def __init__(self, gs, mat_refs):
        self.p = gs.fs.p
        self.mat_refs = mat_refs

    def __enter__(self):
        if self.mat_refs:
            from . import mxu_field

            mxu_field._KERNEL_MATS[self.p] = tuple(
                ref[...] for ref in self.mat_refs
            )

    def __exit__(self, *exc):
        if self.mat_refs:
            from . import mxu_field

            mxu_field._KERNEL_MATS.pop(self.p, None)
        return False


def bucket_accumulate_pallas(gs, table, valid, R, B):
    """Bucket accumulation for one Pippenger window as ONE pallas launch.

    table: (R, L*PL, B) uint32 PACKED round-major table of the sorted
    affine points (round k, lane b = the rank-k element of digit-b's run).
    PL = nl//2 rows per coordinate leaf (X then Y, Fp2 legs in tree-leaf
    order); packed row j of a leaf holds limb 2j in the low 16 bits and
    limb 2j+1 in the high 16. Packing halves the sort payload, the
    expansion/transpose traffic, and this kernel's HBM streaming; limbs
    unpack to (nl, B) registers in VMEM. The round axis MUST lead: Mosaic
    blocks along leading dims only (a (nl, 1, B) block of an (nl, R, B)
    table is rejected).

    valid: (R, B) int32 mask (identity inputs pre-masked by the caller). The
    bucket accumulator lives in VMEM across all R grid steps (constant
    out-block index); each step is one masked complete mixed point-add on B
    lanes while the next round's points stream in via the grid pipeline. The
    weighted reduction stays OUTSIDE (jnp fori_loop): unrolling its ~2c
    point-adds inside the kernel made Mosaic compiles exceed 50 minutes.
    """
    from jax.experimental import pallas as pl
    from .field import _mxu_montmul

    nl = gs.fs.nl
    PL = nl // 2
    ident0 = gs.identity((B,))
    treedef = jax.tree_util.tree_structure(ident0)
    xy_treedef = jax.tree_util.tree_structure((ident0[0], ident0[1]))
    L = len(jax.tree_util.tree_leaves((ident0[0], ident0[1])))
    assert table.shape == (R, L * PL, B), (table.shape, R, L, PL, B)
    mats_in, mats_specs = _mxu_mats(gs)
    NM = len(mats_in)

    def kernel(*refs):
        with _published_mats(gs, refs[:NM]):
            valid_ref = refs[NM]
            tab_ref = refs[NM + 1]
            out_refs = refs[NM + 2 :]
            r = pl.program_id(0)

            ident = gs.identity((B,))

            @pl.when(r == 0)
            def _():
                for oref, leaf in zip(
                    out_refs, jax.tree_util.tree_leaves(ident)
                ):
                    oref[...] = leaf

            bucket = jax.tree_util.tree_unflatten(
                treedef, [oref[...] for oref in out_refs]
            )
            blk = tab_ref[0]  # (L*PL, B) packed
            xy_leaves = []
            for i in range(L):
                sub = blk[i * PL : (i + 1) * PL]
                lo = sub & jnp.uint32(0xFFFF)
                hi = sub >> 16
                parts = []
                for j in range(PL):
                    parts.append(lo[j : j + 1])
                    parts.append(hi[j : j + 1])
                xy_leaves.append(jnp.concatenate(parts, axis=0))
            pt_xy = jax.tree_util.tree_unflatten(xy_treedef, xy_leaves)
            res = gs.add_affine(bucket, pt_xy)
            v = valid_ref[0, 0] != 0
            out = gs.select(v, res, bucket)
            for oref, leaf in zip(out_refs, jax.tree_util.tree_leaves(out)):
                oref[...] = leaf

    n_out = len(jax.tree_util.tree_leaves(ident0))
    in_specs = (
        mats_specs
        + [pl.BlockSpec((1, 1, B), lambda r: (r, 0, 0))]
        + [pl.BlockSpec((1, L * PL, B), lambda r: (r, 0, 0))]
    )
    out_specs = [pl.BlockSpec((nl, B), lambda r: (0, 0)) for _ in range(n_out)]
    out_shape = [jax.ShapeDtypeStruct((nl, B), jnp.uint32) for _ in range(n_out)]

    _STATE["in_kernel"] = True
    try:
        outs = pl.pallas_call(
            kernel,
            grid=(R,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=_interpret(),
            compiler_params=None if _interpret() else _compiler_params(),
        )(*mats_in, valid[:, None, :], table)
    finally:
        _STATE["in_kernel"] = False
    return jax.tree_util.tree_unflatten(treedef, list(outs))


def mont_mul_pallas(fs, a, b, variant=None):
    """Flattened-batch Montgomery product via the Pallas kernel.
    a, b: (nl, *batch) broadcastable; returns (nl, *batch).
    variant: "cios" (VPU, default) or "mxu" (SOS with matmul reduction);
    ZKSNAKE_MXU_MONTMUL=1 flips the default."""
    import os

    if variant is None:
        variant = (
            "mxu"
            if os.environ.get("ZKSNAKE_MXU_MONTMUL", "0") == "1"
            else "cios"
        )
    nl = fs.nl
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

    def _bc(x):
        extra = len(shape) - (x.ndim - 1)
        x = x.reshape((nl,) + (1,) * extra + x.shape[1:])
        return jnp.broadcast_to(x, (nl,) + shape)

    a = _bc(a).reshape(nl, -1)
    b = _bc(b).reshape(nl, -1)
    m = a.shape[1]
    m_pad = -(-m // BLOCK) * BLOCK
    if m_pad != m:
        pad = ((0, 0), (0, m_pad - m))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    run = _compiled(
        nl, tuple(int(x) for x in fs.p_limbs), fs.pinv, _interpret(), variant
    )
    out = run(a, b)
    if m_pad != m:
        out = out[:, :m]
    return out.reshape((nl,) + shape)
