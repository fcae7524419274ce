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
    slimbs: (SL, N) 16-bit scalar limbs (not Montgomery). Adds are mixed
    (inputs arrive affine from the host; identity lanes masked out)."""
    X, Y, Z = P
    not_inf = ~gs.F.is_zero(Z)

    def body(i, acc):
        b = nbits - 1 - i
        limb = jax.lax.dynamic_index_in_dim(slimbs, b // 16, axis=0, keepdims=False)
        bit = (limb >> (b % 16)) & 1
        acc = gs.double(acc)
        cand = gs.add_affine(acc, (X, Y))
        return gs.select((bit == 1) & not_inf, cand, acc)

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


# minimum batch for the fused pallas window kernel (launch overhead floor);
# module-level so tests can lower it to exercise the kernel on small inputs
PALLAS_MSM_MIN = 1 << 15


class _Kernels:
    """jit-compiled kernels cached per (curve, group, size signature)."""

    _batch = {}
    _pip = {}

    @classmethod
    def pippenger(cls, gs, n, nbits, c):
        from . import pallas_field

        # the traced graph depends on whether the pallas chunked path is
        # active (window group size G) and on the env-selected formulation
        # flags, so key the jit cache on all of them
        import os

        key = (
            gs.curve.name,
            gs.group,
            n,
            nbits,
            c,
            pallas_field.pallas_available() and n >= PALLAS_MSM_MIN,
            os.environ.get("ZKSNAKE_MSM_REMAINDER", MSM_REMAINDER_DEFAULT),
            os.environ.get("ZKSNAKE_MSM_GATHER", MSM_GATHER_DEFAULT),
            os.environ.get("ZKSNAKE_MSM_RSIGMA", ""),
        )
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

    _dna = {}

    @classmethod
    def dna(cls, gs, n, nbits):
        key = (gs.curve.name, gs.group, n, nbits)
        if key not in cls._dna:

            @jax.jit
            def kernel(P, slimbs):
                return _msm_dna(gs, P, slimbs)

            cls._dna[key] = kernel
        return cls._dna[key]


# ------------------------------------------------------------------
# Pippenger bucket MSM (signed digits + mixed additions)
#
# Scatter-adds of group elements don't exist, so bucket accumulation uses a
# sorted, conflict-free striping: sort points by window-digit magnitude,
# compute each element's rank within its run, and in round k add every run's
# rank-k element into its bucket — all magnitudes distinct within a round, so
# a single masked point-add per round accumulates without conflicts. Rounds =
# longest run (~2N/2^c for random scalars; a while_loop handles the
# data-dependent count).
#
# Window digits are SIGNED (balanced representation, |d| <= 2^(c-1)): a
# negative digit contributes -P, and negating a short-Weierstrass point is a
# free Y-negation — so the bucket array halves to 2^(c-1) lanes, which halves
# the suffix-scan + tree-reduction cost per window (the dominant term at
# small-to-mid N) and the Pallas accumulator's VMEM footprint.
#
# Bucket adds are MIXED: MSM inputs arrive affine from the host (Z = 1), so
# the accumulate phase uses the 13-product complete mixed formula and streams
# only (X, Y) per point — 2/3 of the HBM traffic of projective adds.
#
# Bucket reduction computes sum_b (b+1)*S_b as the sum of ALL suffix sums
# (log-depth roll scans) — batched over EVERY window at once after the
# accumulation scan (narrow per-window reductions were dispatch-overhead
# bound); windows then combine by a Horner fori over the window sums. The
# accumulation itself still runs under one lax.scan so the whole MSM
# compiles a single window body.
# ------------------------------------------------------------------


def _extract_digit(slimbs, w, c):
    """Unsigned c-bit digit of window w from (SL, N) 16-bit limbs."""
    sl = slimbs.shape[0]
    bit = w * c
    li = bit // 16
    ofs = bit % 16
    d = slimbs[li] >> ofs
    have = 16 - ofs
    while have < c and li + 1 + (have - (16 - ofs)) // 16 < sl:
        nxt = li + 1 + (have - (16 - ofs)) // 16
        d = d | (slimbs[nxt] << have)
        have += 16
    return d & ((1 << c) - 1)


def _signed_window_digits(slimbs, c, nbits):
    """(SL, N) 16-bit limbs -> (W, N) int32 signed digits, HIGH window first.

    Balanced representation: each digit in [-(2^(c-1)-1), 2^(c-1)], with the
    low-to-high carry chain absorbed by the top window (valid because scalars
    are reduced mod r < 2^(nbits-1), leaving >= 1 bit of headroom)."""
    W_ = -(-nbits // c)
    half = 1 << (c - 1)
    full = 1 << c
    carry = None
    rows = []
    for w in range(W_):
        d = _extract_digit(slimbs, w, c).astype(jnp.int32)
        t = d if carry is None else d + carry
        carry = (t > half).astype(jnp.int32)
        rows.append(t - carry * full)
    return jnp.stack(rows[::-1], axis=0)


# Per-launch lane width for the pallas bucket accumulator. The traced
# mixed-add needs ~4KB/lane of Mosaic scoped VMEM for its temporaries
# (measured: 63MB at 16384 lanes), and spilling that to HBM made the wide
# launch 4x SLOWER than the jnp fallback on hardware (25.8k vs 105k pts/s at
# 2^20) — so the cap keeps the whole working set VMEM-resident. A (16, 4096)
# tile is still 32 full VPU tiles per op; total point-op work is independent
# of the split (G windows per launch merely reshapes it).
import os as _os

# Default G1 cap; module attribute kept patchable for tests. G2's Fq2 lanes
# carry twice the limbs, so its cap is half. Read at call time via
# _lane_cap() so the env var behaves like every other knob in the codebase.
PALLAS_LANE_CAP_G1 = 4096


def _lane_cap(group):
    base = int(_os.environ.get("ZKSNAKE_PALLAS_LANE_CAP", PALLAS_LANE_CAP_G1))
    return base if group == 1 else base // 2


# Formulation defaults (env vars override), promoted from the round-5
# hardware sweep at 2^20/c=13 (PERF.md): cond-formulation baseline
# 368.7k pts/s; remainder sigma sweep on cols peaked at sigma 3.5
# (382.2k @ 1.25 / 395.0k @ 2.5 / 398.6k @ 3.5 / 393.8k @ 4.5 — the
# overflow while_loop rounds are cheap but not free); rows-gather
# composes (+~2%): rows+2.5 = 401.9k, and the promoted combination
# rows+3.5 measured 406.1k pts/s (2.582 s, oracle-checked).
MSM_REMAINDER_DEFAULT = "1"
MSM_GATHER_DEFAULT = "rows"
MSM_RSIGMA_REMAINDER_DEFAULT = "3.5"


def _flag(name, default):
    return _os.environ.get(name, default)


def msm_pippenger(gs, P, slimbs, c=13):
    """Full MSM via bucket method. P: projective coords (NL, N) with affine
    inputs (Z in {0, 1}); slimbs: (SL, N) raw 16-bit scalar limbs. Returns
    one projective point.

    Windows are processed in chunks of G per pallas launch: the bucket
    accumulator covers G*2^(c-1) lanes, so each of the ~N/2^(c-1) rounds runs
    a G-times-wider masked mixed add (profiled: at G=1 the per-round batch of
    2^(c-1) lanes left the VPU starved — argsort and gathers were <20% of the
    MSM; the point kernel dominated)."""
    from . import pallas_field

    n = slimbs.shape[1]
    nbits = slimbs.shape[0] * 16
    use_pallas_buckets = pallas_field.pallas_available() and n >= PALLAS_MSM_MIN
    if use_pallas_buckets:
        cap = _lane_cap(gs.group)
        # one window's bucket array (2^(c-1) lanes) must fit the VMEM lane
        # cap — clamp c rather than silently launching over-cap (the G2 cap
        # was previously a no-op whenever B2 > cap)
        c = min(c, cap.bit_length())
    B2 = 1 << (c - 1)  # bucket lane b holds the sum of points with |d| = b+1
    digits = _signed_window_digits(slimbs, c, nbits)  # (W, N) high-first
    W_total = digits.shape[0]

    # ---- top-window skew fix (sub-bucket spreading) ----
    # Scalars are < min(r, 2^nbits), so the HIGHEST window's |digit| is
    # bounded by V ~ bound >> c*(W-1) — often FAR fewer than B2 distinct
    # values (BN254 at c=13: V ~ 49). Without correction its mean bucket
    # run is n/V (~21k at 2^20), which blows past the static round budget
    # and sent every MSM through the while_loop fallback for that window
    # (measured: the top window alone cost ~5s of a 7.1s MSM). Spread each
    # true bucket across S = B2/next_pow2(V) sub-accumulator lanes by
    # recoding |d| -> (i mod S)*V_cap + |d| (sign untouched): runs shorten
    # to ~n/B2 like every other window, and the sub-accumulators collapse
    # with log2(S) extra point-adds before the weighted reduction.
    bound = min(gs.curve.r, (1 << nbits) - 1)
    V_top = (bound >> (c * (W_total - 1))) + 2 if W_total > 1 else B2
    V_cap = _next_pow2(max(V_top, 2))
    S_top = B2 // V_cap if V_cap < B2 else 1
    if S_top > 1:
        d_top = digits[0]
        j = (jnp.arange(n, dtype=jnp.int32) % S_top) * V_cap
        mag0 = jnp.abs(d_top)
        pseudo = jnp.where(mag0 > 0, j + mag0, 0)
        d_top = jnp.where(d_top < 0, -pseudo, pseudo)
        digits = jnp.concatenate([d_top[None], digits[1:]], axis=0)
    # One window per Pallas launch. Grouping G windows (cap // B2) into one
    # launch crashes the TPU compiler at G > 1 (tpu_compile_helper SIGABRT,
    # "Check failed: limits[i] <= dim(i) (16 vs. 1)", observed at 2^17
    # c=11 G=4) and measured launch overhead at G=1 is negligible
    # (75ms/window kernel vs ~148ms/window whole-MSM at 2^20).
    G = 1
    Wp = -(-W_total // G) * G
    if Wp != W_total:
        # pad with zero windows on the HIGH side: all-zero digits contribute
        # nothing (their runs route to the dropped |d|=0 slot)
        digits = jnp.concatenate(
            [jnp.zeros((Wp - W_total, n), digits.dtype), digits], axis=0
        )
    dchunks = digits.reshape(Wp // G, G, n)
    X, Y, Z = P
    inf = gs.F.is_zero(Z)  # identity inputs (e.g. padding) are masked out

    NLB = gs.fs.nl
    PL = NLB // 2

    def _pack(leaf):
        """(NL, ...) 16-bit-limb planes -> (NL/2, ...) u32-packed planes."""
        return leaf[0::2] | (leaf[1::2] << 16)

    def _unpack(pk):
        """Inverse of _pack: (PL, ...) -> (NL, ...) interleaved limbs."""
        lo = pk & jnp.uint32(0xFFFF)
        hi = pk >> 16
        return jnp.stack([lo, hi], axis=1).reshape((NLB,) + pk.shape[1:])

    # X never changes per window: pack once. Y needs per-window sign
    # selection, so pack both Y and -Y and select on packed planes.
    xpk_leaves = [_pack(l) for l in jax.tree_util.tree_leaves(X)]
    ypk_leaves = [_pack(l) for l in jax.tree_util.tree_leaves(Y)]
    nypk_leaves = [
        _pack(l) for l in jax.tree_util.tree_leaves(gs._neg_coord(Y))
    ]
    x_tdef = jax.tree_util.tree_structure(X)
    y_tdef = jax.tree_util.tree_structure(Y)
    LX, LY = len(xpk_leaves), len(ypk_leaves)

    def chunk_body(_carry, dgroup):
        # Payload sort by |digit| (one lax.sort carrying all packed limb
        # planes: ~17 operands for G1 — measured 30ms at 2^20/33 operands on
        # v5e — vs argsort + two rounds of take_along_axis gathers): after
        # the sort every bucket's points form one contiguous run, Y is
        # pre-negated for negative digits, and infinity inputs ride the
        # dropped |d| = 0 run.
        mag = jnp.abs(dgroup)  # (G, n)
        mag = jnp.where(inf[None], 0, mag)
        neg = dgroup < 0  # (G, n)
        planes = []
        for leaf in xpk_leaves:
            rep = jnp.broadcast_to(leaf[:, None, :], (PL, G, n))
            planes.extend([rep[l] for l in range(PL)])
        for leaf, nleaf in zip(ypk_leaves, nypk_leaves):
            signed = jnp.where(
                neg[None, :, :], nleaf[:, None, :], leaf[:, None, :]
            )
            planes.extend([signed[l] for l in range(PL)])
        sorted_all = jax.lax.sort(
            (mag,) + tuple(planes), dimension=1, num_keys=1
        )
        ms = sorted_all[0]
        sleaves = [
            jnp.stack(sorted_all[1 + i * PL : 1 + (i + 1) * PL], axis=0)
            for i in range(LX + LY)
        ]  # packed (PL, G, n) per coordinate leaf

        # run boundaries per (window, bucket) via binary search on the
        # sorted magnitudes — two vmapped searchsorted calls (log-depth
        # gathers) instead of two 2^20-update scatters (TPU scatters
        # serialize and dominated the non-kernel time)
        bvals = jnp.arange(1, B2 + 1, dtype=ms.dtype)
        lo = jax.vmap(
            lambda row: jnp.searchsorted(row, bvals, side="left")
        )(ms).astype(jnp.int32)
        hi = jax.vmap(
            lambda row: jnp.searchsorted(row, bvals, side="right")
        )(ms).astype(jnp.int32)
        starts_by_digit = lo  # (G, B2)
        len_by_digit = hi - lo
        has_digit = len_by_digit > 0
        # the |d| = 0 run never contributes adds, so it doesn't bound rounds
        maxrun = jnp.max(len_by_digit)

        def _accum_loop(g):
            """while_loop bucket accumulation for window g (fallback path);
            reads the packed sorted planes and unpacks per round."""
            buckets = gs.identity((B2,))
            pk_g = [l[:, g] for l in sleaves]  # (PL, n) each

            def round_body(state):
                k, buckets = state
                pos = jnp.clip(starts_by_digit[g] + k, 0, n - 1)
                valid = has_digit[g] & (k < len_by_digit[g])
                cols = [_unpack(l[:, pos]) for l in pk_g]  # (NL, B2)
                Qx = jax.tree_util.tree_unflatten(x_tdef, cols[:LX])
                Qy = jax.tree_util.tree_unflatten(y_tdef, cols[LX:])
                cand = gs.add_affine(buckets, (Qx, Qy))
                buckets = gs.select(valid, cand, buckets)
                return (k + 1, buckets)

            _, buckets = jax.lax.while_loop(
                lambda s: s[0] < maxrun, round_body, (jnp.int32(0), buckets)
            )
            return buckets

        def _accum_all_slow():
            """(NL, G, B2) bucket leaves via per-window while_loops."""
            per_w = [_accum_loop(g) for g in range(G)]
            return jax.tree_util.tree_map(
                lambda *ts: jnp.stack(ts, axis=1), *per_w
            )

        if use_pallas_buckets:
            # one pallas launch streams R rounds of the packed round table
            # through a VMEM-resident (G*B2)-lane bucket accumulator; the
            # table is built gather-free — one scan of per-run contiguous
            # dynamic slices over ALL packed planes + one XLA transpose
            # (measured 2.7 / 3.2 GB/s on v5e) — and the weighted reduction
            # runs as a compact jnp fori graph. Degenerate digit skew (a run
            # longer than R_static) falls back to the while_loop + jnp path.
            # static round budget: mean run length + a sigma-scaled slack of
            # the per-bucket binomial. In the cond formulation the slack
            # must make overflow RARE (5.5 sigma: p(any bucket overflows)
            # ~ 1e-4 per window at 2^20/c=13, because overflow re-runs the
            # whole window through the while_loop path). The remainder-pass
            # formulation only pays (maxrun - R) extra masked adds on
            # overflow, so it runs a much smaller budget (default 1.25
            # sigma: table gather and kernel rounds — the two dominant MSM
            # stages, PERF.md — both scale with R). Override via
            # ZKSNAKE_MSM_RSIGMA.
            use_remainder = (
                _flag("ZKSNAKE_MSM_REMAINDER", MSM_REMAINDER_DEFAULT) == "1"
                and G == 1
            )
            sigma = float(
                _flag(
                    "ZKSNAKE_MSM_RSIGMA",
                    MSM_RSIGMA_REMAINDER_DEFAULT if use_remainder else "5.5",
                )
            )
            mean_run = max(n // B2, 1)
            R_static = int(min(n, mean_run + max(16, int(sigma * mean_run**0.5) + 1)))
            R_static = -(-R_static // 8) * 8

            def _chunk_pallas(_):
                gofs = jnp.arange(G, dtype=jnp.int32)[:, None] * n
                starts_flat = (starts_by_digit + gofs).reshape(G * B2)
                # one (L*PL, G*n + pad) source holding every packed plane:
                # X then Y leaves in tree order, matching the kernel's
                # unpack layout
                src = jnp.pad(
                    jnp.concatenate(
                        [l.reshape(PL, G * n) for l in sleaves], axis=0
                    ),
                    ((0, 0), (0, R_static)),
                )
                NP = (LX + LY) * PL
                # ONE flat gather builds the whole round table; the earlier
                # scan-of-dynamic-slices ran G*B2 serialized scan steps per
                # window and its per-step overhead dominated the MSM. The
                # round axis MUST lead in the final layout (Mosaic blocks
                # along leading dims only; a second-minor block dim of 1 on
                # a ~350-sized axis is rejected).
                #
                # Two formulations, ZKSNAKE_MSM_GATHER selects (see
                # scripts/bench_sortdma.py take_cols/take_rows):
                #  cols (round-3 default): take along axis=1 of (NP, G*n) —
                #    each index pulls a STRIDED NP-element column (measured
                #    2.9 GB/s end to end).
                #  rows (round-5 default, +2% whole-MSM): transpose the
                #    source once, then take along axis=0 — each index pulls
                #    a CONTIGUOUS 4*NP-byte row, then a cheap (0,2,1) minor
                #    transpose.
                if _flag("ZKSNAKE_MSM_GATHER", MSM_GATHER_DEFAULT) == "rows":
                    srcT = jnp.transpose(src, (1, 0))  # (G*n+R, NP)
                    kcol = jnp.arange(R_static, dtype=jnp.int32)[:, None]
                    pos = (kcol + starts_flat[None, :]).reshape(-1)
                    t = jnp.take(srcT, pos, axis=0).reshape(
                        R_static, G * B2, NP
                    )
                    table = jnp.transpose(t, (0, 2, 1))
                else:
                    kcol = jnp.arange(R_static, dtype=jnp.int32)[None, :]
                    pos = (starts_flat[:, None] + kcol).reshape(-1)
                    t = jnp.take(src, pos, axis=1).reshape(
                        NP, G * B2, R_static
                    )
                    table = jnp.transpose(t, (2, 0, 1))
                kcol = jnp.arange(R_static, dtype=jnp.int32)[:, None]
                valid = (
                    has_digit.reshape(1, G * B2)
                    & (kcol < len_by_digit.reshape(1, G * B2))
                ).astype(jnp.int32)
                buckets = pallas_field.bucket_accumulate_pallas(
                    gs, table, valid, R_static, G * B2
                )
                return jax.tree_util.tree_map(
                    lambda t_: t_.reshape(t_.shape[0], G, B2), buckets
                )

            # The remainder pass assumes one window per launch (the rem
            # while_loop reads window 0 only); G is pinned to 1 above, but
            # if multi-window launches are ever revived the flag degrades
            # to the cond formulation instead of tracing wrong results.
            if use_remainder:
                # Remainder-pass formulation (flag-gated): ALWAYS run the
                # pallas accumulate for ranks < R_static, then finish any
                # over-budget runs with a while_loop that usually executes
                # ZERO iterations (maxrun <= R_static for random scalars).
                # This removes the lax.cond's duplicated full fallback
                # pipeline from the module — halving its size (the G2
                # compile-pathology suspect) — and permits a smaller
                # R_static: overflow now costs only the overflowing rounds
                # instead of a full re-accumulation.
                buckets = _chunk_pallas(None)
                pk_0 = [l[:, 0] for l in sleaves]  # (PL, n) packed planes

                def rem_body(state):
                    k, bk = state
                    pos = jnp.clip(starts_by_digit[0] + k, 0, n - 1)
                    valid = has_digit[0] & (k < len_by_digit[0])
                    cols = [_unpack(l[:, pos]) for l in pk_0]  # (NL, B2)
                    Qx = jax.tree_util.tree_unflatten(x_tdef, cols[:LX])
                    Qy = jax.tree_util.tree_unflatten(y_tdef, cols[LX:])
                    b0 = jax.tree_util.tree_map(lambda t: t[:, 0], bk)
                    cand = gs.add_affine(b0, (Qx, Qy))
                    sel = gs.select(valid, cand, b0)
                    bk = jax.tree_util.tree_map(
                        lambda t: t[:, None, :], sel
                    )
                    return (k + 1, bk)

                _, buckets = jax.lax.while_loop(
                    lambda s: s[0] < maxrun,
                    rem_body,
                    (jnp.int32(R_static), buckets),
                )
            else:
                buckets = jax.lax.cond(
                    maxrun <= R_static, _chunk_pallas,
                    lambda _: _accum_all_slow(), None
                )
        else:
            buckets = _accum_all_slow()
        return None, buckets

    # the scan only ACCUMULATES buckets; the weighted reduction runs ONCE
    # over every window's bucket array at full width below. (Reducing
    # inside the scan ran 20 narrow (NL, G, B2) reductions — per-op
    # dispatch overhead at 4096 lanes dominated the whole MSM: measured
    # ~0.03s/window of pure reduction vs 0.075s/window of bucket kernel,
    # plus the sequential Horner between chunks serialized everything.)
    _, bucket_chunks = jax.lax.scan(chunk_body, None, dchunks)
    # leaves (Wp/G, NL, G, B2) -> (NL, Wp, B2)
    buckets = jax.tree_util.tree_map(
        lambda t: jnp.moveaxis(t, 0, 1).reshape(t.shape[1], Wp, B2),
        bucket_chunks,
    )

    if S_top > 1:
        # collapse the top window's sub-accumulators: lane j*V_cap + (b-1)
        # holds a partial sum of true bucket b; log2(S) point-adds fold the
        # S slots, then identity-padding restores the (B2,) lane layout so
        # the batched weighted reduction's (m+1) weights equal b.
        wt = Wp - W_total

        top = jax.tree_util.tree_map(
            lambda t: jnp.swapaxes(
                t[:, wt].reshape(t.shape[0], S_top, V_cap), 1, 2
            ),
            buckets,
        )
        top = _tree_reduce(gs, top, S_top)  # (NL, V_cap) leaves
        ident = gs.identity((B2 - V_cap,))
        padded = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=-1), top, ident
        )
        buckets = jax.tree_util.tree_map(
            lambda t, pw: jnp.concatenate(
                [t[:, :wt], pw[:, None], t[:, wt + 1 :]], axis=1
            ),
            buckets,
            padded,
        )

    # weighted reduction, batched over ALL windows at once:
    # sum_b (b+1)*S_b = sum_{b>=0} T_b, T_b = sum_{j>=b} S_j —
    # suffix sums via log-depth roll scan on the trailing bucket axis
    iota_b = jnp.arange(B2, dtype=jnp.int32)

    def suffix_body(i, T):
        sh = 1 << i
        Q = jax.tree_util.tree_map(lambda t: jnp.roll(t, -sh, axis=-1), T)
        cand = gs.add(T, Q)
        return gs.select(iota_b < B2 - sh, cand, T)

    T = jax.lax.fori_loop(0, c - 1, suffix_body, buckets)
    wsums = _tree_reduce(gs, T, B2)  # (NL, Wp) leaves

    # Horner across windows (high window first): result <- result * 2^c + w_j
    def horner(j, Rpt):
        Rpt = jax.lax.fori_loop(0, c, lambda i, Q: gs.double(Q), Rpt)
        wj = jax.tree_util.tree_map(
            lambda t: jax.lax.dynamic_index_in_dim(
                t, j, axis=-1, keepdims=False
            ),
            wsums,
        )
        return gs.add(Rpt, wj)

    return jax.lax.fori_loop(0, Wp, horner, gs.identity(()))


def _pick_window(n):
    """Bucket window size minimizing the per-MSM point-add count
    ceil(nbits/c) * (N_accum + (2(c-1) + slack) * 2^(c-1)): accumulation
    rounds plus the suffix-scan + tree reduction over the halved (signed
    digits) bucket array."""
    if n >= (1 << 18):
        return 13
    if n >= (1 << 14):
        return 11
    if n >= (1 << 10):
        return 9
    return 7


def _g2_route_dna(gs, n):
    """True when a G2 MSM should run the double-and-add + tree-reduce graph
    instead of Pippenger. On the XLA-TPU remote compiler the full G2
    Pippenger module — pallas AND jnp formulations, remainder-pass included
    — compiles pathologically (>80 min / compiler-transport EOF at 2^17,
    measured rounds 4-5; every PIECE compiles in 41-235 s alone, so the
    blowup is superlinear in module size for the Fq2 graphs). The
    double-and-add module is two fori bodies and compiles in minutes; its
    runtime (~2·nbits point-ops per lane, fully batched) costs the prover's
    single B2 MSM ~tens of seconds at bench sizes — a measured stopgap
    until a split-phase G2 Pippenger (one jit per stage, dispatched per
    window) lands. Override: ZKSNAKE_G2_MSM=auto|pippenger|dna."""
    mode = _os.environ.get("ZKSNAKE_G2_MSM", "auto")
    if mode == "pippenger":
        return False
    if mode == "dna":
        return True
    if gs.group != 2:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _msm_dna(gs, P, slimbs):
    """MSM via batched double-and-add + log-depth tree reduction (identity-
    padded to a power of two; Z = 0 pad lanes never contribute)."""
    n = slimbs.shape[1]
    nbits = slimbs.shape[0] * 16
    n2 = _next_pow2(n)
    if n2 != n:
        from .sharding import pad_msm_to

        P, slimbs = pad_msm_to(gs, P, slimbs, n2)
    acc = _double_and_add(gs, P, slimbs, nbits)
    return _tree_reduce(gs, acc, n2)


def msm_device(curve, group, points, scalars, point_cls):
    """Full MSM on device from host points/ints; returns a host point."""
    gs = get_group_spec(curve, group)
    fr = FieldSpec.get(curve.r)
    n = len(points)
    slimbs = jnp.asarray(_scalar_limbs(scalars, curve.r, fr.nl))

    P = gs.points_to_device(points)
    result = msm_device_raw(gs, P, slimbs)
    result = jax.tree_util.tree_map(lambda t: t[..., None], result)
    return gs.points_from_device(result, point_cls)[0]


def msm_device_raw(gs, P, slimbs):
    """MSM over already-device-resident points/scalar limbs (fused paths).
    P coords (NL, n); slimbs (SL, n). Returns projective limb tensors."""
    n = slimbs.shape[1]
    nbits = slimbs.shape[0] * 16
    if _g2_route_dna(gs, n):
        return _Kernels.dna(gs, n, nbits)(P, slimbs)
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


# ------------------------------------------------------------------
# Fixed-base batch scalar multiplication (trusted-setup hot path)
#
# Groth16/PlonK setup multiplies ONE generator by 2^k tau-powers
# (reference: batch_multi_scalar over a replicated base, curve.rs:326-354 via
# groth16/protocol.py:81-83). With a shared base, per-lane double-and-add
# (~2*nbits point-ops per scalar) collapses to the windowed table method:
# precompute T[w][d] = d * 2^(cw) * P once per base, then each scalar is
# W = ceil(nbits/c) table gathers + W mixed adds — ~16x fewer point-ops at
# c = 8. Tables are built ON DEVICE (8-bit double-and-add over W*2^c lanes)
# from W host-doubled window bases, then normalized to affine with one
# batched Fermat inversion so the accumulation uses 13-product mixed adds.
# ------------------------------------------------------------------

_FIXED_BASE_C = 8
_FB_TABLES = {}


def _fixed_base_table(gs, base_point):
    """((X, Y) affine leaves (NL, W*2^c), inf mask) for base_point's windows."""
    key = (gs.curve.name, gs.group, base_point)
    if key in _FB_TABLES:
        return _FB_TABLES[key]
    c = _FIXED_BASE_C
    fr = FieldSpec.get(gs.curve.r)
    W_ = (fr.nl * 16 + c - 1) // c
    bases = []
    b = base_point
    for _ in range(W_):
        bases.append(b)
        for _ in range(c):
            b = b + b  # host doubling of the window base (cheap, one lane)
    Pb = gs.points_to_device(bases)  # (NL, W)
    lanes = W_ << c
    base_lanes = jax.tree_util.tree_map(
        lambda t: jnp.repeat(t, 1 << c, axis=-1), Pb
    )
    dvals = jnp.tile(jnp.arange(1 << c, dtype=jnp.uint32), W_)

    @jax.jit
    def build(base_lanes, dlimbs):
        T = _double_and_add(gs, base_lanes, dlimbs, c)
        return gs.to_affine(T)

    (tx, ty), inf = build(base_lanes, dvals[None, :])
    entry = ((tx, ty), inf, W_, lanes)
    _FB_TABLES[key] = entry
    return entry


class _FBKernels:
    _cache = {}

    @classmethod
    def get(cls, gs, n, W_):
        key = (gs.curve.name, gs.group, n, W_)
        if key not in cls._cache:
            c = _FIXED_BASE_C

            @jax.jit
            def kernel(tx, ty, inf, slimbs):
                digits = jnp.stack(
                    [_extract_digit(slimbs, w, c) for w in range(W_)], axis=0
                )  # (W, n) low window first

                def body(w, acc):
                    dw = jax.lax.dynamic_index_in_dim(
                        digits, w, axis=0, keepdims=False
                    )
                    idx = (w << c) + dw.astype(jnp.int32)
                    Qx = jax.tree_util.tree_map(lambda t: t[:, idx], tx)
                    Qy = jax.tree_util.tree_map(lambda t: t[:, idx], ty)
                    cand = gs.add_affine(acc, (Qx, Qy))
                    return gs.select(~inf[idx], cand, acc)

                acc0 = gs.identity((digits.shape[1],))
                return jax.lax.fori_loop(0, W_, body, acc0)

            cls._cache[key] = kernel
        return cls._cache[key]


def batch_mul_fixed_base_raw(gs, base_point, slimbs):
    """Device-resident fixed-base batch mul: raw (non-Montgomery) scalar
    limbs (SL, n) in, projective device point tensors out — no host
    round-trip (the trusted-setup pipeline keeps everything on device)."""
    (tx, ty), inf, W_, _ = _fixed_base_table(gs, base_point)
    kernel = _FBKernels.get(gs, slimbs.shape[1], W_)
    return kernel(tx, ty, inf, slimbs)


def batch_mul_fixed_base(curve, group, base_point, scalars, point_cls):
    """scalars[i] * base_point for all i, via windowed fixed-base tables."""
    gs = get_group_spec(curve, group)
    fr = FieldSpec.get(curve.r)
    slimbs = jnp.asarray(_scalar_limbs(scalars, curve.r, fr.nl))
    result = batch_mul_fixed_base_raw(gs, base_point, slimbs)
    return gs.points_from_device(result, point_cls)
