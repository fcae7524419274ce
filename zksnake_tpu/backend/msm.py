"""Multi-scalar multiplication and batched scalar multiplication on device.

Replaces arkworks `VariableBaseMSM::msm` / rayon `batch_multi_scalar`
(/root/reference/src/bn254/curve.rs:326-392).

v1 kernel: branch-free batched double-and-add over all lanes (every lane does
identical work per bit — masked complete adds), followed by a log-depth tree
reduction. Work: ~2 point-ops per scalar bit per lane. A Pippenger bucket
kernel (sorted digits + segmented scan) is the planned upgrade; this version
keeps the VPU busy with large batches and is the unit of sharding for the
multi-chip path (points split across the mesh, per-shard partials combined).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .field import FieldSpec
from .limbs import ints_to_limbs
from .curve_ops import get_group_spec


def _scalar_limbs(scalars, r, nl):
    """Scalars mod r -> (nl, N) uint32 16-bit limbs (numpy, limbs-first)."""
    return np.ascontiguousarray(ints_to_limbs([int(s) % r for s in scalars], nl).T)


def _double_and_add(gs, P, slimbs, nbits):
    """Per-lane scalar mul: returns projective points, one per lane.
    slimbs: (SL, N) 16-bit scalar limbs (not Montgomery)."""

    def body(i, acc):
        b = nbits - 1 - i
        limb = jax.lax.dynamic_index_in_dim(slimbs, b // 16, axis=0, keepdims=False)
        bit = (limb >> (b % 16)) & 1
        acc = gs.double(acc)
        cand = gs.add(acc, P)
        return gs.select(bit == 1, cand, acc)

    acc0 = gs.identity((slimbs.shape[1],))
    return jax.lax.fori_loop(0, nbits, body, acc0)


def _tree_reduce(gs, P, n):
    """Sum all lanes of P (lane axis trailing; n a power of two).

    Recursive doubling with jnp.roll inside a fori_loop: after log2(n)
    rounds every lane holds the total, and the loop body is a single point
    add (compact graph — an unrolled tree would trace log2(n) adds)."""
    if n == 1:
        return jax.tree_util.tree_map(lambda t: t[..., 0], P)
    levels = n.bit_length() - 1

    def body(k, P):
        h = n >> (k + 1)
        Q = jax.tree_util.tree_map(lambda t: jnp.roll(t, -h, axis=-1), P)
        return gs.add(P, Q)

    P = jax.lax.fori_loop(0, levels, body, P)
    return jax.tree_util.tree_map(lambda t: t[..., 0], P)


def _next_pow2(n):
    return 1 << (n - 1).bit_length() if n > 1 else 1


class _Kernels:
    """jit-compiled kernels cached per (curve, group, padded size)."""

    _msm = {}
    _batch = {}

    @classmethod
    def msm(cls, gs, n_pad, nbits):
        key = (gs.curve.name, gs.group, n_pad, nbits)
        if key not in cls._msm:

            @jax.jit
            def kernel(P, slimbs):
                acc = _double_and_add(gs, P, slimbs, nbits)
                return _tree_reduce(gs, acc, n_pad)

            cls._msm[key] = kernel
        return cls._msm[key]

    @classmethod
    def batch(cls, gs, nbits):
        key = (gs.curve.name, gs.group, nbits)
        if key not in cls._batch:

            @jax.jit
            def kernel(P, slimbs):
                return _double_and_add(gs, P, slimbs, nbits)

            cls._batch[key] = kernel
        return cls._batch[key]


def _pad_points(gs, P, n, n_pad):
    if n == n_pad:
        return P
    ident = gs.identity((n_pad - n,))
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=-1), P, ident
    )


def msm_device(curve, group, points, scalars, point_cls):
    """Full MSM on device from host points/ints; returns a host point."""
    gs = get_group_spec(curve, group)
    fr = FieldSpec.get(curve.r)
    n = len(points)
    slimbs = _scalar_limbs(scalars, curve.r, fr.nl)
    nbits = fr.nl * 16

    P = gs.points_to_device(points)
    n_pad = _next_pow2(n)
    P = _pad_points(gs, P, n, n_pad)
    slimbs = jnp.asarray(
        np.concatenate([slimbs, np.zeros((fr.nl, n_pad - n), np.uint32)], axis=1)
    )
    kernel = _Kernels.msm(gs, n_pad, nbits)
    result = kernel(P, slimbs)
    result = jax.tree_util.tree_map(lambda t: t[..., None], result)
    return gs.points_from_device(result, point_cls)[0]


def msm_device_raw(gs, P, slimbs):
    """MSM over already-device-resident points/scalar limbs (fused paths).
    P coords (NL, n); slimbs (SL, n). Returns projective limb tensors."""
    n = slimbs.shape[1]
    nbits = slimbs.shape[0] * 16
    n_pad = _next_pow2(n)
    P = _pad_points(gs, P, n, n_pad)
    if n_pad != n:
        slimbs = jnp.concatenate(
            [slimbs, jnp.zeros((slimbs.shape[0], n_pad - n), jnp.uint32)], axis=1
        )
    return _Kernels.msm(gs, n_pad, nbits)(P, slimbs)


def batch_mul_device(curve, group, points, scalars, point_cls):
    """Independent per-lane scalar multiplications on device."""
    gs = get_group_spec(curve, group)
    fr = FieldSpec.get(curve.r)
    slimbs = jnp.asarray(_scalar_limbs(scalars, curve.r, fr.nl))
    nbits = fr.nl * 16
    P = gs.points_to_device(points)
    kernel = _Kernels.batch(gs, nbits)
    result = kernel(P, slimbs)
    return gs.points_from_device(result, point_cls)
