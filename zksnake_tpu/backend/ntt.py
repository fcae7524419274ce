"""Number-theoretic transform (radix-2) over the scalar fields, on device.

Replaces arkworks `GeneralEvaluationDomain::{fft, ifft, coset_fft, coset_ifft}`
(/root/reference/src/bn254/polynomial.rs:535-585) with jit-compiled batched
butterfly stages over limb tensors.

Domain convention matches arkworks Radix2EvaluationDomain:
- size n = next power of two; omega = g^((r-1)/2^s) with 2^s = n, where g is
  the field's 2-adic root (generator^((r-1) >> two_adicity)).
- coset quirk preserved: the reference's `coset_fft` uses offset == omega
  itself (GeneralEvaluationDomain::get_coset(domain, group_gen),
  polynomial.rs:553-556), i.e. it evaluates at omega^(i+1).

Structure: decimation-in-time with a bit-reversal pre-gather, then log2(n)
stages of (n/m, m)-blocked butterflies; twiddles come from one precomputed
power table sliced with static strides. All Montgomery-domain.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .field import FieldSpec, mont_mul, mod_add, mod_sub


def _trace_state_clean():
    try:
        return jax.core.trace_state_clean()
    except Exception:  # pragma: no cover - jax version drift
        return False


class Domain:
    """Radix-2 evaluation domain over Fr with cached device twiddles."""

    _CACHE = {}

    def __init__(self, r: int, n: int, two_adicity: int, generator: int):
        assert n & (n - 1) == 0, "domain size must be a power of two"
        self.r = r
        self.n = n
        self.fs = FieldSpec.get(r)
        root = pow(generator, (r - 1) >> two_adicity, r)
        logn = n.bit_length() - 1
        assert logn <= two_adicity, "domain too large for field 2-adicity"
        self.omega = pow(root, 1 << (two_adicity - logn), r)
        self.omega_inv = pow(self.omega, -1, r)
        self.n_inv = pow(n, -1, r)

        # host-side power tables (plain ints)
        w = 1
        powers = []
        for _ in range(max(n // 2, 1)):
            powers.append(w)
            w = w * self.omega % r
        self.powers_host = powers

        self._tw = None
        self._tw_inv = None
        self._bitrev = None

    @classmethod
    def get(cls, curve_or_field, n):
        """curve_or_field: CurveParams, or (r, two_adicity, generator) tuple."""
        if isinstance(curve_or_field, tuple):
            r, ta, g = curve_or_field
        else:
            r, ta, g = (
                curve_or_field.r,
                curve_or_field.fr_two_adicity,
                curve_or_field.fr_generator,
            )
        key = (r, n)
        if key not in cls._CACHE:
            cls._CACHE[key] = cls(r, n, ta, g)
        return cls._CACHE[key]

    # --- device tables ---
    # Caching rule: inside a jit trace, jnp.asarray returns a TRACER even for
    # host constants; caching one poisons every later trace that reuses this
    # Domain (UnexpectedTracerError). Only cache when the trace state is
    # clean; inside a trace, return an uncached constant for that graph.
    def _cacheable(self):
        return _trace_state_clean()

    def twiddles(self, inverse=False):
        if inverse:
            if self._tw_inv is None:
                r = self.r
                w = 1
                pw = []
                for _ in range(max(self.n // 2, 1)):
                    pw.append(w)
                    w = w * self.omega_inv % r
                val = jnp.asarray(self.fs.to_mont_host(pw))
                if not self._cacheable():
                    return val
                self._tw_inv = val
            return self._tw_inv
        if self._tw is None:
            val = jnp.asarray(self.fs.to_mont_host(self.powers_host))
            if not self._cacheable():
                return val
            self._tw = val
        return self._tw

    def bitrev(self):
        if self._bitrev is None:
            n = self.n
            logn = n.bit_length() - 1
            idx = np.arange(n)
            rev = np.zeros(n, dtype=np.int32)
            for b in range(logn):
                rev |= ((idx >> b) & 1) << (logn - 1 - b)
            val = jnp.asarray(rev)
            if not self._cacheable():
                return val
            self._bitrev = val
        return self._bitrev

    def warm(self):
        """Eagerly build all device tables (call OUTSIDE any trace so later
        jits share the cached device-resident arrays instead of embedding
        per-trace constants)."""
        self.twiddles(False)
        self.twiddles(True)
        self.bitrev()
        return self


def _ntt_core(dom: Domain, x, tw):
    """x: (nl, n) or batched (nl, B, n) Montgomery coeffs -> evaluations
    (natural order, same shape). The batched form runs B transforms through
    ONE set of butterfly stages (the m-blocks of every stage subdivide each
    length-n transform exactly, so batches never mix): one graph, B-times
    wider lanes."""
    fs = dom.fs
    n = dom.n
    if n == 1:
        return x
    logn = n.bit_length() - 1
    batched = x.ndim == 3
    B = x.shape[1] if batched else 1
    x = jnp.take(x, dom.bitrev(), axis=-1)
    if batched:
        x = x.reshape(fs.nl, B * n)
    for s in range(1, logn + 1):
        m = 1 << s
        stride = n // m
        # twiddles for this stage: tw[0::stride][:m/2], shape (nl, m/2)
        w = tw[:, ::stride][:, : m // 2]
        xb = x.reshape(fs.nl, B * n // m, m)
        u = xb[:, :, : m // 2]
        t = mont_mul(fs, xb[:, :, m // 2 :], w[:, None, :])
        x = jnp.concatenate([mod_add(fs, u, t), mod_sub(fs, u, t)], axis=2)
        x = x.reshape(fs.nl, B * n)
    if batched:
        x = x.reshape(fs.nl, B, n)
    return x


def _ntt_core_cg(dom: Domain, x, tw):
    """Constant-geometry (Pease) radix-2 DIF NTT: same result as _ntt_core,
    but the stage loop is a lax.fori_loop whose body contains ONE mont_mul
    instantiation — the whole transform compiles a single butterfly graph.

    Every stage has identical data movement: split halves, butterfly, then
    riffle a/b back together (a static stack+reshape — the "perfect
    shuffle"), so shapes never change across stages and the loop carries a
    fixed-shape tensor. Stage-s twiddle for lane i is tw[(i >> s) << s]
    (low s bits cleared), one dynamic gather per stage. DIF with the
    riffle emits bit-reversed order; a final bitrev take restores natural.

    One montmul instantiation keeps compiles cheap on every backend
    (XLA-CPU compiles each unrolled instantiation in ~10s on the 2-core
    host; remote Mosaic compile time also scales with unrolled op count).
    Selected by _ntt() for 3-D batches with B >= 8; smaller batches use
    _ntt_core_cg_bflat (see _ntt's policy docstring).
    """
    fs = dom.fs
    n = dom.n
    if n == 1:
        return x
    logn = n.bit_length() - 1
    batched = x.ndim == 3
    if not batched:
        x = x[:, None, :]
    B = x.shape[1]
    h = n // 2
    iota = jnp.arange(h, dtype=jnp.int32)

    def body(s, x):
        u = x[..., :h]
        v = x[..., h:]
        idx = jnp.left_shift(jnp.right_shift(iota, s), s)
        w = tw[:, idx]  # (nl, h)
        a = mod_add(fs, u, v)
        b = mont_mul(fs, mod_sub(fs, u, v), w[:, None, :])
        return jnp.stack([a, b], axis=-1).reshape(fs.nl, B, n)

    x = jax.lax.fori_loop(0, logn, body, x)
    x = jnp.take(x, dom.bitrev(), axis=-1)
    return x if batched else x[:, 0, :]


def _ntt_core_cg_flat(dom: Domain, x, tw):
    """2-D constant-geometry variant for a SINGLE transform (x: (nl, n)).

    Identical math to _ntt_core_cg at B == 1, but the loop carry stays
    (nl, n): the 3-D form's (nl, 1, n) carry presents a unit sublane
    dimension to the TPU's (8, 128) vector tiling, wasting 7/8 of every
    VPU tile on each of the logn stage passes (and the unit dim is the
    compiler-crash class BENCH_r03 hit: "Check failed: limits[i] <=
    dim(i) (8 vs 1)"). Keeping the limb axis on the sublane dimension
    makes every elementwise/butterfly op full-width. This is the default
    core for every 2-D transform (see _ntt policy) and the core that
    produced the recorded 148 ms standalone 2^20 NTT (BENCH_r03)."""
    fs = dom.fs
    n = dom.n
    if n == 1:
        return x
    logn = n.bit_length() - 1
    h = n // 2
    iota = jnp.arange(h, dtype=jnp.int32)

    def body(s, x):
        u = x[:, :h]
        v = x[:, h:]
        idx = jnp.left_shift(jnp.right_shift(iota, s), s)
        w = tw[:, idx]  # (nl, h)
        a = mod_add(fs, u, v)
        b = mont_mul(fs, mod_sub(fs, u, v), w)
        return jnp.stack([a, b], axis=-1).reshape(fs.nl, n)

    x = jax.lax.fori_loop(0, logn, body, x)
    return jnp.take(x, dom.bitrev(), axis=-1)


def _ntt_core_cg_bflat(dom: Domain, x, tw):
    """Batched constant-geometry core for SMALL batches (x: (nl, B, n),
    B < 8) that keeps every arithmetic op on a flat 2-D (nl, B*h) carry.

    The plain 3-D core's (nl, B, ·) intermediates put B on the TPU's
    sublane axis, so B < 8 wastes (8-B)/8 of every VPU tile across the
    whole montmul chain of every stage. Here only the split/riffle touch
    a 3-D view; the butterflies run full-width 2-D. Bit-identical to
    _ntt_core_cg (tested in tests/test_algebra.py::test_ntt_core_equiv).

    Flat-riffle identity that makes this work: with each transform
    contiguous in the flattened lane axis (lane l = b*n + i), the global
    interleave stack([a, b], -1).reshape(nl, B*n) lands a[b*h + i] at
    2(b*h + i) = b*n + 2i — exactly the per-transform riffle."""
    fs = dom.fs
    n = dom.n
    if n == 1:
        return x
    logn = n.bit_length() - 1
    B = x.shape[1]
    h = n // 2
    iota = jnp.arange(h, dtype=jnp.int32)

    def body(s, xf):
        xr = xf.reshape(fs.nl, B, 2, h)
        u = xr[:, :, 0, :].reshape(fs.nl, B * h)
        v = xr[:, :, 1, :].reshape(fs.nl, B * h)
        idx = jnp.left_shift(jnp.right_shift(iota, s), s)
        w = jnp.tile(tw[:, idx], (1, B))  # (nl, B*h)
        a = mod_add(fs, u, v)
        b = mont_mul(fs, mod_sub(fs, u, v), w)
        return jnp.stack([a, b], axis=-1).reshape(fs.nl, B * n)

    xf = jax.lax.fori_loop(0, logn, body, x.reshape(fs.nl, B * n))
    return jnp.take(xf.reshape(fs.nl, B, n), dom.bitrev(), axis=-1)


def _ntt(dom: Domain, x, tw, flat=None, core=None):
    """Core-selection policy (single, explicit — `core` or ZKSNAKE_NTT_CORE
    override for experiments; `flat` is accepted for API compatibility and
    ignored):

    - 2-D (nl, n):            _ntt_core_cg_flat  — full-width tiles, one
                              montmul instantiation (cheap compiles on
                              XLA-CPU and remote Mosaic alike).
    - 3-D (nl, B, n), B >= 8: _ntt_core_cg       — B fills the sublane
                              axis; no per-stage relayouts.
    - 3-D (nl, B, n), B < 8:  _ntt_core_cg_bflat — flat 2-D arithmetic,
                              3-D only for the split/riffle views.

    A (nl, 1, n) or small-B carry must NEVER reach XLA-TPU/Mosaic: unit
    sublane dims run at 1/8 tile utilization and are a TPU-compiler crash
    class. _ntt_core (unrolled stages) trades log2(n) montmul
    instantiations (minutes of XLA-CPU compile; cheap pallas launches on
    TPU) for no per-stage twiddle gather — measured 152 ms vs the flat
    core's 207 ms at 2^20 on v5e (2026-08-21) — so the STANDALONE jitted
    kernels select it on the TPU backend (core="unrolled" from
    _NttKernels); the fused provers stay constant-geometry because their
    graphs carry many transforms and compile time dominates their caps.
    """
    import os

    core = core or os.environ.get("ZKSNAKE_NTT_CORE", "auto")
    if core not in ("auto", "flat", "cg", "unrolled"):
        raise ValueError(
            f"ZKSNAKE_NTT_CORE={core!r}: expected auto|flat|cg|unrolled"
        )
    if core == "unrolled":
        return _ntt_core(dom, x, tw)
    if core == "cg":
        return _ntt_core_cg(dom, x, tw)
    if x.ndim == 2:
        return _ntt_core_cg_flat(dom, x, tw)
    if x.shape[1] >= 8 and core != "flat":
        return _ntt_core_cg(dom, x, tw)
    return _ntt_core_cg_bflat(dom, x, tw)


def ntt_device(dom: Domain, x, flat=None, core=None):
    return _ntt(dom, x, dom.twiddles(False), core=core)


def intt_device(dom: Domain, x, flat=None, core=None):
    y = _ntt(dom, x, dom.twiddles(True), core=core)
    scale = dom.fs.const_mont_dev(dom.n_inv, (1,) * (x.ndim - 1))
    return mont_mul(dom.fs, y, scale)


def coset_scale(dom: Domain, x, inverse=False):
    """Multiply element i by offset^i (offset = omega, the reference quirk)."""
    fs = dom.fs
    r = dom.r
    g = dom.omega_inv if inverse else dom.omega
    pw = []
    w = 1
    for _ in range(dom.n):
        pw.append(w)
        w = w * g % r
    table = jnp.asarray(fs.to_mont_host(pw))
    return mont_mul(fs, x, table)


class _NttKernels:
    _cache = {}

    @staticmethod
    def _core():
        """Standalone single-transform kernels: unrolled on the TPU backend
        (its stage montmuls are one shared pallas launch shape, so the
        log2(n) instantiations compile cheaply there, and it avoids the CG
        core's per-stage twiddle gather — 152 vs 207 ms at 2^20); the
        policy default (constant-geometry flat) elsewhere."""
        try:
            return "unrolled" if jax.default_backend() == "tpu" else None
        except Exception:  # pragma: no cover
            return None

    @classmethod
    def get(cls, dom: Domain, kind: str):
        key = (dom.r, dom.n, kind)
        if key not in cls._cache:
            core = cls._core()
            if kind == "fft":
                fn = lambda x: ntt_device(dom, x, core=core)
            elif kind == "ifft":
                fn = lambda x: intt_device(dom, x, core=core)
            elif kind == "coset_fft":
                fn = lambda x: ntt_device(dom, coset_scale(dom, x, False), core=core)
            elif kind == "coset_ifft":
                fn = lambda x: coset_scale(dom, intt_device(dom, x, core=core), True)
            else:
                raise ValueError(kind)
            cls._cache[key] = jax.jit(fn)
        return cls._cache[key]


def _resize(vals, n):
    """arkworks semantics: Vec::resize — pad with zeros or truncate."""
    if len(vals) >= n:
        return vals[:n]
    return list(vals) + [0] * (n - len(vals))


def transform_host(curve_or_field, vals, size, kind):
    """Host entry: list of ints -> list of ints via the device NTT."""
    from ..utils import next_power_of_two

    n = next_power_of_two(size) if size > 1 else 1
    dom = Domain.get(curve_or_field, n)
    vals = _resize([int(v) % dom.r for v in vals], n)
    x = jnp.asarray(dom.fs.to_mont_host(vals))
    y = _NttKernels.get(dom, kind)(x)
    return dom.fs.from_mont_host(np.asarray(y))
