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
    """jit-compiled kernels cached per (curve, group, size signature)."""

    _msm = {}
    _batch = {}
    _pip = {}

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
    def pippenger(cls, gs, n, nbits, c):
        key = (gs.curve.name, gs.group, n, nbits, c)
        if key not in cls._pip:

            @jax.jit
            def kernel(P, slimbs):
                return msm_pippenger(gs, P, slimbs, c)

            cls._pip[key] = kernel
        return cls._pip[key]

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


# ------------------------------------------------------------------
# Pippenger bucket MSM
#
# Scatter-adds of group elements don't exist, so bucket accumulation uses a
# sorted, conflict-free striping: sort points by window digit, compute each
# element's rank within its run, and in round k add every run's rank-k
# element into its bucket — all digits distinct within a round, so a single
# masked 2^c-lane point-add per round accumulates without conflicts. Rounds
# = longest run (~N/2^c for random scalars; a while_loop handles the
# data-dependent count). Bucket reduction computes sum_b b*S_b as the sum of
# suffix sums (log-depth roll scans); windows combine by Horner under one
# lax.scan so the whole MSM compiles a single window body.
# ------------------------------------------------------------------


def _window_digits(slimbs, c, nbits):
    """(SL, N) 16-bit limbs -> (W, N) c-bit window digits, HIGH window first."""
    sl, n = slimbs.shape
    W = -(-nbits // c)
    rows = []
    for w in range(W - 1, -1, -1):
        bit = w * c
        li = bit // 16
        ofs = bit % 16
        d = slimbs[li] >> ofs
        have = 16 - ofs
        while have < c and li + 1 + (have - (16 - ofs)) // 16 < sl:
            nxt = li + 1 + (have - (16 - ofs)) // 16
            d = d | (slimbs[nxt] << have)
            have += 16
        rows.append(d & ((1 << c) - 1))
    return jnp.stack(rows, axis=0)


def msm_pippenger(gs, P, slimbs, c=12):
    """Full MSM via bucket method. P: projective coords (NL, N); slimbs:
    (SL, N) raw 16-bit scalar limbs. Returns one projective point."""
    from . import pallas_field

    n = slimbs.shape[1]
    nbits = slimbs.shape[0] * 16
    B = 1 << c
    digits = _window_digits(slimbs, c, nbits)  # (W, N) high-first
    iota_n = jnp.arange(n, dtype=jnp.int32)
    iota_b = jnp.arange(B, dtype=jnp.int32)
    use_pallas_buckets = pallas_field.pallas_available() and n >= (1 << 15)

    def window_body(result, dw):
        order = jnp.argsort(dw)
        ds = dw[order].astype(jnp.int32)
        Ps = jax.tree_util.tree_map(lambda t: t[:, order], P)

        is_start = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), ds[1:] != ds[:-1]]
        )
        run_start = jax.lax.cummax(jnp.where(is_start, iota_n, 0))
        rank = iota_n - run_start
        maxrun = jnp.max(rank) + 1

        starts_by_digit = jnp.zeros((B,), jnp.int32).at[ds].set(run_start)
        ends_by_digit = jnp.full((B,), -1, jnp.int32).at[ds].max(iota_n)
        len_by_digit = ends_by_digit - starts_by_digit + 1
        has_digit = ends_by_digit >= 0

        def _accum_loop(_):
            buckets = gs.identity((B,))

            def round_body(state):
                k, buckets = state
                pos = jnp.clip(starts_by_digit + k, 0, n - 1)
                valid = has_digit & (k < len_by_digit) & (iota_b > 0)
                Pk = jax.tree_util.tree_map(lambda t: t[:, pos], Ps)
                cand = gs.add(buckets, Pk)
                buckets = gs.select(valid, cand, buckets)
                return (k + 1, buckets)

            _, buckets = jax.lax.while_loop(
                lambda s: s[0] < maxrun, round_body, (jnp.int32(0), buckets)
            )
            return buckets

        if use_pallas_buckets:
            # one pallas launch streams R rounds of gathered points through a
            # VMEM-resident bucket accumulator; degenerate digit skew (run
            # longer than R_static) falls back to the while_loop path
            R_static = int(min(n, n // B + 129))

            def _accum_pallas(_):
                kcol = jnp.arange(R_static, dtype=jnp.int32)[:, None]
                pos = jnp.clip(starts_by_digit[None, :] + kcol, 0, n - 1)
                valid = (
                    has_digit[None]
                    & (kcol < len_by_digit[None])
                    & (iota_b[None] > 0)
                ).astype(jnp.int32)
                leaves = [
                    jnp.transpose(leaf[:, pos], (1, 0, 2))
                    for leaf in jax.tree_util.tree_leaves(Ps)
                ]
                return pallas_field.bucket_accumulate_pallas(
                    gs, leaves, valid, R_static, B
                )

            buckets = jax.lax.cond(
                maxrun <= R_static, _accum_pallas, _accum_loop, None
            )
        else:
            buckets = _accum_loop(None)

        # weighted reduction: sum_b b*S_b = sum_{b>=1} T_b, T_b = sum_{j>=b} S_j
        def suffix_body(i, T):
            sh = 1 << i
            Q = jax.tree_util.tree_map(lambda t: jnp.roll(t, -sh, axis=-1), T)
            cand = gs.add(T, Q)
            return gs.select(iota_b < B - sh, cand, T)

        T = jax.lax.fori_loop(0, c, suffix_body, buckets)
        # exclude T_0 (it's the total sum, not part of the weighted identity)
        T = gs.select(iota_b > 0, T, gs.identity((B,)))
        wsum = _tree_reduce(gs, T, B)

        # Horner: result <- result * 2^c + wsum
        result = jax.lax.fori_loop(0, c, lambda i, R: gs.double(R), result)
        result = gs.add(result, wsum)
        return result, None

    result, _ = jax.lax.scan(window_body, gs.identity(()), digits)
    return result


def _pick_window(n):
    """Bucket window size minimizing W(c) * (N + (2c + slack) * 2^c):
    the per-window cost of accumulation plus the suffix-scan reduction."""
    if n >= (1 << 18):
        return 12
    if n >= (1 << 14):
        return 10
    if n >= (1 << 10):
        return 8
    return 6


def msm_device(curve, group, points, scalars, point_cls):
    """Full MSM on device from host points/ints; returns a host point."""
    gs = get_group_spec(curve, group)
    fr = FieldSpec.get(curve.r)
    n = len(points)
    slimbs = jnp.asarray(_scalar_limbs(scalars, curve.r, fr.nl))
    nbits = fr.nl * 16

    P = gs.points_to_device(points)
    c = _pick_window(n)
    kernel = _Kernels.pippenger(gs, n, nbits, c)
    result = kernel(P, slimbs)
    result = jax.tree_util.tree_map(lambda t: t[..., None], result)
    return gs.points_from_device(result, point_cls)[0]


def msm_device_raw(gs, P, slimbs):
    """MSM over already-device-resident points/scalar limbs (fused paths).
    P coords (NL, n); slimbs (SL, n). Returns projective limb tensors."""
    n = slimbs.shape[1]
    nbits = slimbs.shape[0] * 16
    c = _pick_window(n)
    return _Kernels.pippenger(gs, n, nbits, c)(P, slimbs)


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
