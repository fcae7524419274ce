"""Multi-chip sharding: MSM and NTT over a jax.sharding.Mesh.

This is the rebuild's scale-out story (the reference has none — SURVEY.md
section 2.1: rayon-only, single process). Design per BASELINE.json:

- MSM: points sharded across the mesh ("dp over points"); each device runs
  the local batched kernel and tree-reduces to one partial point; partials
  are combined with an all_gather + local fold (group addition is not a psum-
  able integer op, but the partials are tiny — 3 coordinates).
- NTT: distributed four-step algorithm. With coefficients viewed as an
  (n1, n2) matrix (j = i1 + n1*i2), stage 1 runs local length-n2 NTTs along
  the unsharded axis, stage 2 applies twiddles, and stage 3's length-n1 NTTs
  along the sharded axis are made local by an all_to_all transpose across the
  ICI — exactly the "butterflies local until the stride exceeds the shard"
  plan from SURVEY.md section 5.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .field import FieldSpec, mont_mul
from .ntt import Domain, _ntt
from .msm import _double_and_add, _tree_reduce, msm_pippenger, _pick_window
from .curve_ops import get_group_spec


def make_mesh(n_devices=None, devices=None, axis="shards"):
    """1-D device mesh. Prefers explicit devices; falls back to the default
    backend's devices (or the CPU backend when it has enough virtual chips)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                cpus = jax.devices("cpu")
                if len(cpus) >= n_devices:
                    devices = cpus
            except RuntimeError:
                pass
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


# ---------------------------------------------------------------- MSM ----


def sharded_msm_fn(gs, mesh, axis="shards"):
    """Returns a jittable fn(P, slimbs) computing the full MSM with points
    and scalars sharded over `axis`. Output is replicated (one point).

    Group-generic: point coordinates are pytrees — (NL, n) arrays for G1,
    pairs of them for G2 (Fq2) — and the P(None, axis) spec applies as a
    pytree prefix to every leaf, so G2's B-MSM (reference curve.rs:375-392
    treats G2 identically) scales out exactly like G1."""

    def local_msm(Pts, slimbs):
        n_local = slimbs.shape[1]
        nbits = slimbs.shape[0] * 16
        if n_local >= 64:
            # per-shard Pippenger (same fused kernel as single-chip)
            partial = msm_pippenger(gs, Pts, slimbs, _pick_window(n_local))
        else:
            acc = _double_and_add(gs, Pts, slimbs, nbits)
            partial = _tree_reduce(gs, acc, n_local)
        # combine partials: all_gather (tiny: one point each) + local fold.
        # fori_loop keeps ONE gs.add call site in the graph — an unrolled
        # D-1-add chain costs minutes of XLA CPU compile (each montmul
        # instantiation compiles separately; see CLAUDE.md kernel rules).
        gathered = jax.lax.all_gather(partial, axis)  # leaves: (D, nl) etc.
        ndev = mesh.shape[axis]

        def fold(d, total):
            nxt = jax.tree_util.tree_map(
                lambda t: jax.lax.dynamic_index_in_dim(t, d, 0, keepdims=False),
                gathered,
            )
            return gs.add(total, nxt)

        return jax.lax.fori_loop(
            1, ndev, fold, jax.tree_util.tree_map(lambda t: t[0], gathered)
        )

    spec = P(None, axis)

    def fn(Pts, slimbs):
        return jax.shard_map(
            local_msm,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=P(),
            check_vma=False,
        )(Pts, slimbs)

    return fn


def pad_msm_to(gs, Pts, slimbs, n_target):
    """Pad an MSM instance to exactly n_target lanes: identity points (Z = 0)
    with zero scalars contribute nothing (the mixed adds mask Z = 0 lanes).

    Besides mesh divisibility, callers use this to EQUALIZE sizes across the
    prover's MSMs (e.g. the K-private MSM up to the domain size n): equal
    shapes share one compiled Pippenger graph instead of costing a fresh
    multi-minute XLA compile per distinct width."""
    n = slimbs.shape[1]
    rem = n_target - n
    if rem == 0:
        return Pts, slimbs
    assert rem > 0, (n, n_target)

    def padp(t):
        return jnp.concatenate(
            [t, jnp.zeros(t.shape[:-1] + (rem,), t.dtype)], axis=-1
        )

    return (
        jax.tree_util.tree_map(padp, Pts),
        jnp.concatenate(
            [slimbs, jnp.zeros((slimbs.shape[0], rem), slimbs.dtype)], axis=1
        ),
    )


def pad_msm_operands(gs, Pts, slimbs, ndev):
    """Pad an MSM instance so n divides the mesh (see pad_msm_to)."""
    n = slimbs.shape[1]
    return pad_msm_to(gs, Pts, slimbs, n + ((-n) % ndev))


# ---------------------------------------------------------------- NTT ----


class _SubDomain:
    """Ad-hoc NTT sub-domain (borrows Domain's cached device tables)."""

    def __init__(self, fs, r, omega, size):
        self.fs = fs
        self.r = r
        self.n = size
        self.omega = omega
        self.omega_inv = pow(omega, -1, r)
        self.n_inv = pow(size, -1, r)
        w = 1
        self.powers_host = []
        for _ in range(max(size // 2, 1)):
            self.powers_host.append(w)
            w = w * omega % r
        self._tw = None
        self._tw_inv = None
        self._bitrev = None

    twiddles = Domain.twiddles
    bitrev = Domain.bitrev
    _cacheable = Domain._cacheable


class FourStepPlan:
    """Static tables for one distributed four-step (i)NTT of size n1 * n2.

    Transform direction is baked in via `omega` (pass dom.omega_inv and
    scale = 1/n for the inverse — the four-step decomposition is identical
    in omega). Layout contract:

      input:  (nl, n1, n2), index j = i1 + n1*i2 at [:, i1, i2], i1 sharded
      output: (nl, n2, n1), index k = k2 + n2*k1 at [:, k2, k1], k2 sharded

    The transposed output is the NEXT transform's input layout when its
    (n1', n2') split starts with n1' = n2 — the sharded QAP pipeline in
    groth16_device chains four of these with zero relayout collectives.
    """

    def __init__(self, fs, r, n1, n2, omega, scale=1):
        self.fs = fs
        self.n1 = n1
        self.n2 = n2
        self.row_dom = _SubDomain(fs, r, pow(omega, n1, r), n2)
        self.col_dom = _SubDomain(fs, r, pow(omega, n2, r), n1)
        # stage-2 twiddles W[i1, k2] = omega^(i1*k2) (n1-axis sharded),
        # with the scalar `scale` (e.g. 1/n for inverses) folded in
        twl = np.zeros((fs.nl, n1, n2), dtype=np.uint32)
        for i1 in range(n1):
            vals = []
            w = scale % r
            base = pow(omega, i1, r)
            for _ in range(n2):
                vals.append(w)
                w = w * base % r
            twl[:, i1, :] = fs.to_mont_host(vals)
        self.tw_host = twl

    def tw_dev(self):
        return jnp.asarray(self.tw_host)

    def local(self, x, tw_local, axis):
        """Local body (composable INSIDE a shard_map over 1-D mesh `axis`).
        x: (nl, [B,] n1/D, n2) local rows (optional leading batch axis
        shares one compiled butterfly graph across B transforms);
        returns (nl, [B,] n2/D, n1)."""
        fs = self.fs
        batched = x.ndim == 4
        B = x.shape[1] if batched else 1
        rows = x.shape[-2]
        # stage 1: length-n2 NTTs along the last axis (batched core)
        x1 = _ntt(
            self.row_dom,
            x.reshape(fs.nl, B * rows, self.n2),
            self.row_dom.twiddles(False),
        )
        # stage 2: twiddle (and scale) multiply
        x2 = mont_mul(
            fs,
            x1.reshape(fs.nl, B, rows, self.n2),
            tw_local[:, None],
        )
        # stage 3: all_to_all transpose across the mesh, then local
        # length-n1 NTTs. split n2 into D chunks, concat on the row axis:
        # (nl, B, n1/D * D, n2/D) = (nl, B, n1, n2/D) -> swap local axes
        xt = jax.lax.all_to_all(
            x2, axis, split_axis=3, concat_axis=2, tiled=True
        )
        xt = jnp.swapaxes(xt, 2, 3)  # (nl, B, n2/D, n1)
        x3 = _ntt(
            self.col_dom,
            xt.reshape(fs.nl, -1, self.n1),
            self.col_dom.twiddles(False),
        )
        x3 = x3.reshape(fs.nl, B, xt.shape[2], self.n1)
        return x3 if batched else x3[:, 0]


def sharded_ntt_fn(dom: Domain, mesh, n1, axis="shards"):
    """Distributed four-step NTT over domain `dom` of size n = n1 * n2
    (layout contract: see FourStepPlan)."""
    fs = dom.fs
    n = dom.n
    n2 = n // n1
    assert n1 * n2 == n
    ndev = mesh.shape[axis]
    assert n1 % ndev == 0 and n2 % ndev == 0
    plan = FourStepPlan(fs, dom.r, n1, n2, dom.omega)
    tw_dev = plan.tw_dev()

    def fn(x):
        return jax.shard_map(
            lambda xl, twl: plan.local(xl, twl, axis),
            mesh=mesh,
            in_specs=(P(None, axis, None), P(None, axis, None)),
            out_specs=P(None, axis, None),
            check_vma=False,
        )(x, tw_dev)

    return fn


def fourstep_input_layout(fs, coeffs_ints, n1, n2):
    """Host: coefficient list -> (nl, n1, n2) Montgomery limbs with
    j = i1 + n1*i2 at [:, i1, i2]."""
    n = n1 * n2
    vals = list(coeffs_ints) + [0] * (n - len(coeffs_ints))
    arr = fs.to_mont_host(vals)  # (nl, n) in index order j
    return np.ascontiguousarray(arr.reshape(fs.nl, n2, n1).swapaxes(1, 2))


def fourstep_output_to_natural(fs, out, n1, n2):
    """Host: (nl, n2, n1) four-step output -> evaluation list in natural
    order (A[k2 + n2*k1] at [:, k2, k1])."""
    arr = np.asarray(out)  # (nl, n2, n1)
    flat = arr.swapaxes(1, 2).reshape(fs.nl, n1 * n2)  # index k2 + n2*k1...
    # [:, k1, k2] after swap; flatten gives index k1*n2 + k2 -> value A[k2 + n2*k1]
    # which IS natural order: A[m] where m = k2 + n2*k1 lives at position k1*n2+k2=m
    return fs.from_mont_host(flat)
