"""Batched elliptic-curve point arithmetic on device.

Replaces arkworks' projective group ops + `VariableBaseMSM` backend
(/root/reference/src/bn254/curve.rs:326-392) with branch-free kernels:

- Points are homogeneous projective (X:Y:Z) limb tensors; identity = (0:1:0).
- Coordinates use the limbs-first (NL, *batch) layout of backend.field.
- Addition uses the Renes-Costello-Batina *complete* formulas for a=0 short
  Weierstrass curves (eprint 2015/1060, Algorithm 7): one straight-line
  formula valid for doubling, identity and inverse inputs — no data-dependent
  branching, so every VPU lane does identical work (the TPU-native answer to
  the reference's per-point branchy Jacobian arithmetic).
- G2 uses the same formulas over Fq2 limb pairs.
"""

import numpy as np
import jax.numpy as jnp

from .field import FieldSpec, mont_mul, mod_add, mod_sub


def _expand(x, nl, batch_shape):
    """Broadcast a (nl, *some_batch) limb tensor to (nl, *batch_shape),
    right-aligning the batch dims (so (nl,) constants broadcast)."""
    extra = len(batch_shape) - (x.ndim - 1)
    x = x.reshape((nl,) + (1,) * extra + x.shape[1:])
    return jnp.broadcast_to(x, (nl,) + tuple(batch_shape))


class DevFq:
    """Device adapter for prime-field coordinate arithmetic on (NL, ...) limbs."""

    def __init__(self, fs: FieldSpec):
        self.fs = fs

    def mul(self, a, b):
        return mont_mul(self.fs, a, b)

    def mul_many(self, pairs):
        """Batch k independent products into ONE stacked mont_mul: the unrolled
        CIOS graph is instantiated once instead of k times (compile time) and
        the VPU sees k-times-wider batches (throughput)."""
        k = len(pairs)
        if k == 1:
            return [self.mul(*pairs[0])]
        nl = self.fs.nl
        batch = jnp.broadcast_shapes(*[x.shape[1:] for x, _ in pairs],
                                     *[y.shape[1:] for _, y in pairs])
        xs = jnp.stack([_expand(x, nl, batch) for x, _ in pairs], axis=1)
        ys = jnp.stack([_expand(y, nl, batch) for _, y in pairs], axis=1)
        prod = mont_mul(self.fs, xs, ys)
        return [prod[:, i] for i in range(k)]

    def add(self, a, b):
        return mod_add(self.fs, a, b)

    def sub(self, a, b):
        return mod_sub(self.fs, a, b)

    def zeros(self, shape):
        return jnp.zeros((self.fs.nl,) + shape, dtype=jnp.uint32)

    def one(self, shape):
        return self.fs.one_mont_dev(shape)

    def select(self, cond, a, b):
        return jnp.where(cond[None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def const(self, v: int):
        """Host int -> Montgomery limb constant, shape (NL,) (broadcasts)."""
        return self.fs.const_mont_dev(v)


class DevFq2:
    """Device adapter for Fq2 arithmetic on pairs of (NL, ...) limb tensors."""

    def __init__(self, fs: FieldSpec):
        self.fs = fs

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    def mul_many(self, pairs):
        """Karatsuba Fq2 products for all pairs fused into one stacked
        mont_mul (3 limbs-level products per pair, batched across pairs).

        Inside Pallas kernel bodies the products stay PER-PAIR 2-D: the
        stacked (nl, 3k, B) chains in the G2 add_affine formula SIGABRT
        the TPU compiler ("Check failed: limits[i] <= dim(i) (8 vs 1)",
        the BENCH_r03/r04 groth16 crash — bisected 2026-08-21 with
        scripts/debug_g2_mosaic.py: bare stacked products of width
        3/5/6/15/18 all compile, the chained formula only compiles
        unstacked). Compile cost is bounded: the bucket kernel carries
        ONE add_affine, so ~39 small 2-D montmul instantiations."""
        fs = self.fs
        nl = fs.nl
        k = len(pairs)
        from . import pallas_field

        if pallas_field._STATE["in_kernel"]:
            out = []
            for (a0, a1), (b0, b1) in pairs:
                t0 = mont_mul(fs, a0, b0)
                t1 = mont_mul(fs, a1, b1)
                t2 = mont_mul(fs, mod_add(fs, a0, a1), mod_add(fs, b0, b1))
                out.append(
                    (mod_sub(fs, t0, t1), mod_sub(fs, mod_sub(fs, t2, t0), t1))
                )
            return out
        batch = jnp.broadcast_shapes(
            *[a[0].shape[1:] for a, _ in pairs], *[b[0].shape[1:] for _, b in pairs]
        )
        xs, ys = [], []
        for (a0, a1), (b0, b1) in pairs:
            a0 = _expand(a0, nl, batch)
            a1 = _expand(a1, nl, batch)
            b0 = _expand(b0, nl, batch)
            b1 = _expand(b1, nl, batch)
            xs.extend([a0, a1, mod_add(fs, a0, a1)])
            ys.extend([b0, b1, mod_add(fs, b0, b1)])
        prod = mont_mul(fs, jnp.stack(xs, axis=1), jnp.stack(ys, axis=1))
        out = []
        for i in range(k):
            t0 = prod[:, 3 * i]
            t1 = prod[:, 3 * i + 1]
            t2 = prod[:, 3 * i + 2]
            c0 = mod_sub(fs, t0, t1)
            c1 = mod_sub(fs, mod_sub(fs, t2, t0), t1)
            out.append((c0, c1))
        return out

    def add(self, a, b):
        fs = self.fs
        return (mod_add(fs, a[0], b[0]), mod_add(fs, a[1], b[1]))

    def sub(self, a, b):
        fs = self.fs
        return (mod_sub(fs, a[0], b[0]), mod_sub(fs, a[1], b[1]))

    def zeros(self, shape):
        z = jnp.zeros((self.fs.nl,) + shape, dtype=jnp.uint32)
        return (z, z)

    def one(self, shape):
        return (self.fs.one_mont_dev(shape), jnp.zeros((self.fs.nl,) + shape, jnp.uint32))

    def select(self, cond, a, b):
        c = cond[None]
        return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]))

    def is_zero(self, a):
        return jnp.all(a[0] == 0, axis=0) & jnp.all(a[1] == 0, axis=0)

    def const(self, v):
        """Host (c0, c1) tuple -> Montgomery limb constants, shape (NL,)."""
        return (self.fs.const_mont_dev(v[0]), self.fs.const_mont_dev(v[1]))


class GroupSpec:
    """Static description of one curve group's device arithmetic."""

    def __init__(self, curve, group):
        self.curve = curve
        self.group = group
        self.fs = FieldSpec.get(curve.p)
        if group == 1:
            self.F = DevFq(self.fs)
            self._b3_val = 3 * curve.b
        else:
            self.F = DevFq2(self.fs)
            b2 = curve.b2
            self._b3_val = (3 * b2[0] % curve.p, 3 * b2[1] % curve.p)

    @property
    def b3(self):
        # rebuilt per trace from scalar literals: a concrete array attribute
        # would be a captured constant inside Pallas kernel bodies
        return self.F.const(self._b3_val)

    def identity(self, shape=()):
        F = self.F
        return (F.zeros(shape), F.one(shape), F.zeros(shape))

    def add(self, P, Q):
        """Complete projective addition (RCB15 Algorithm 7, a=0).

        The 14 field products are batched into 3 stacked mont_mul calls by
        dependency level (6 + 2 + 6) — smaller graphs, wider batches."""
        F = self.F
        b3 = self.b3
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        t0, t1, t2, s3, s4, s5 = F.mul_many(
            [
                (X1, X2),
                (Y1, Y2),
                (Z1, Z2),
                (F.add(X1, Y1), F.add(X2, Y2)),
                (F.add(Y1, Z1), F.add(Y2, Z2)),
                (F.add(X1, Z1), F.add(X2, Z2)),
            ]
        )
        t3 = F.sub(s3, F.add(t0, t1))  # X1Y2 + X2Y1
        t4 = F.sub(s4, F.add(t1, t2))  # Y1Z2 + Y2Z1
        t5 = F.sub(s5, F.add(t0, t2))  # X1Z2 + X2Z1
        t0_3 = F.add(F.add(t0, t0), t0)  # 3 X1X2
        t2b, y3p = F.mul_many([(b3, t2), (b3, t5)])
        z3s = F.add(t1, t2b)
        t1m = F.sub(t1, t2b)
        x3a, x3b, y3a, y3b, z3a, z3b = F.mul_many(
            [
                (t3, t1m),
                (t4, y3p),
                (y3p, t0_3),
                (t1m, z3s),
                (z3s, t4),
                (t0_3, t3),
            ]
        )
        x3 = F.sub(x3a, x3b)
        y3 = F.add(y3a, y3b)
        z3 = F.add(z3a, z3b)
        return (x3, y3, z3)

    def double(self, P):
        """Complete doubling (RCB15 Algorithm 9, a=0); products batched by
        dependency level (3 + 1 + 3 + 2 stacked mont_mul calls)."""
        F = self.F
        b3 = self.b3
        X, Y, Z = P
        t0, t1, t2 = F.mul_many([(Y, Y), (Y, Z), (Z, Z)])
        z3 = F.add(F.add(t0, t0), F.add(t0, t0))
        z3 = F.add(z3, z3)  # 8 Y^2
        (t2b,) = F.mul_many([(b3, t2)])
        x3, z3, txy = F.mul_many([(t2b, z3), (t1, z3), (X, Y)])
        y3 = F.add(t0, t2b)
        tt = F.add(F.add(t2b, t2b), t2b)
        t0 = F.sub(t0, tt)
        y3m, x3m = F.mul_many([(t0, y3), (t0, txy)])
        y3 = F.add(x3, y3m)
        x3 = F.add(x3m, x3m)
        return (x3, y3, z3)

    def add_affine(self, P, Q):
        """Complete mixed addition (RCB15 Algorithm 8, a=0): Q = (X2, Y2)
        affine with Z2 = 1 implied. 13 field products vs full add's 14, and
        callers stream one fewer coordinate from HBM. Q MUST NOT be the point
        at infinity (fold an infinity mask into the caller's select instead);
        P may be anything, including identity, Q, or -Q."""
        F = self.F
        b3 = self.b3
        X1, Y1, Z1 = P
        X2, Y2 = Q
        t0, t1, s3, y2z1, x2z1 = F.mul_many(
            [
                (X1, X2),
                (Y1, Y2),
                (F.add(X1, Y1), F.add(X2, Y2)),
                (Y2, Z1),
                (X2, Z1),
            ]
        )
        t3 = F.sub(s3, F.add(t0, t1))  # X1Y2 + X2Y1
        t4 = F.add(y2z1, Y1)  # Y1Z2 + Y2Z1 (Z2 = 1)
        t5 = F.add(x2z1, X1)  # X1Z2 + X2Z1
        t0_3 = F.add(F.add(t0, t0), t0)  # 3 X1X2
        t2b, y3p = F.mul_many([(b3, Z1), (b3, t5)])
        z3s = F.add(t1, t2b)
        t1m = F.sub(t1, t2b)
        x3a, x3b, y3a, y3b, z3a, z3b = F.mul_many(
            [
                (t3, t1m),
                (t4, y3p),
                (y3p, t0_3),
                (t1m, z3s),
                (z3s, t4),
                (t0_3, t3),
            ]
        )
        x3 = F.sub(x3a, x3b)
        y3 = F.add(y3a, y3b)
        z3 = F.add(z3a, z3b)
        return (x3, y3, z3)

    def to_affine(self, P):
        """Normalize projective points to ((X/Z, Y/Z), inf_mask) on device.
        Uses one batched inversion (Z = 0 lanes invert to 0 and are
        reported in the mask; their coordinates are garbage by contract).
        Flat batches use the Montgomery-trick scan inversion (~2 log n
        mont_muls total vs ~500 per-lane for Fermat)."""
        from .field import mont_inv, mont_inv_batch, mod_add, mod_neg

        def _inv(x):
            if x.ndim == 2 and x.shape[1] > 1:
                return mont_inv_batch(self.fs, x)
            return mont_inv(self.fs, x)

        X, Y, Z = P
        fs = self.fs
        if self.group == 1:
            inf = self.F.is_zero(Z)
            zi = _inv(jnp.where(inf[None], fs.one_mont_dev(Z.shape[1:]), Z))
            ax, ay = self.F.mul_many([(X, zi), (Y, zi)])
            return (ax, ay), inf
        z0, z1 = Z
        inf = self.F.is_zero(Z)
        norm = mod_add(fs, mont_mul(fs, z0, z0), mont_mul(fs, z1, z1))
        ninv = _inv(jnp.where(inf[None], fs.one_mont_dev(z0.shape[1:]), norm))
        zi = (mont_mul(fs, z0, ninv), mont_mul(fs, mod_neg(fs, z1), ninv))
        ax, ay = self.F.mul_many([(X, zi), (Y, zi)])
        return (ax, ay), inf

    def negate_y(self, Y, cond):
        """Y coordinate of -P where cond (batch-shaped bool) selects negation."""
        negY = self._neg_coord(Y)
        return self.F.select(cond, negY, Y)

    def _neg_coord(self, Y):
        from .field import mod_neg

        if self.group == 1:
            return mod_neg(self.fs, Y)
        return (mod_neg(self.fs, Y[0]), mod_neg(self.fs, Y[1]))

    def select(self, cond, P, Q):
        F = self.F
        return tuple(F.select(cond, a, b) for a, b in zip(P, Q))

    def is_identity(self, P):
        return self.F.is_zero(P[2])

    # ---------- host <-> device conversion ----------
    def _batch_affine(self, points):
        """Affine coords for a list of host points via ONE batched inversion
        (the per-point `pow` inversions dominate host->device conversion
        otherwise). Returns list of affine tuples or None (infinity)."""
        from ..utils import batch_modinv
        from ..curves.tower import Fq2Ops

        p = self.fs.p
        # collect z values of points lacking an affine cache
        idxs = []
        zs = []
        for i, pt in enumerate(points):
            if pt._affine_cache is None:
                z = pt._jac[2]
                if self.group == 1:
                    if z != 0:
                        idxs.append(i)
                        zs.append(z)
                else:
                    if z != (0, 0):
                        idxs.append(i)
                        # Fq2 norm trick: 1/z = conj(z) / (z0^2 + z1^2)
                        zs.append((z[0] * z[0] + z[1] * z[1]) % p)
        if idxs:
            invs = batch_modinv(zs, p)
            if self.group == 1:
                for i, zinv in zip(idxs, invs):
                    X, Y, Z = points[i]._jac
                    zi2 = zinv * zinv % p
                    points[i]._affine_cache = (
                        (X * zi2 % p, Y * zi2 % p * zinv % p),
                    )
            else:
                f2 = Fq2Ops(p)
                for i, ninv in zip(idxs, invs):
                    X, Y, Z = points[i]._jac
                    zinv = (Z[0] * ninv % p, -Z[1] * ninv % p)
                    zi2 = f2.sqr(zinv)
                    points[i]._affine_cache = (
                        (f2.mul(X, zi2), f2.mul(Y, f2.mul(zi2, zinv))),
                    )
        return [pt._affine() for pt in points]

    def points_to_device(self, points):
        """List of host PointG1/PointG2 -> projective Montgomery limb tensors
        of shape (NL, n) per coordinate (Fq2 coords are limb-tensor pairs)."""
        fs = self.fs
        n = len(points)
        affs = self._batch_affine(points)
        inf = np.array([a is None for a in affs])

        def zcol():
            z = np.where(
                inf[None, :],
                np.zeros((fs.nl, n), np.uint32),
                np.broadcast_to(fs.one_mont[:, None], (fs.nl, n)),
            ).astype(np.uint32)
            return jnp.asarray(z)

        if self.group == 1:
            xs = [0 if a is None else a[0] for a in affs]
            ys = [1 if a is None else a[1] for a in affs]
            X = jnp.asarray(fs.to_mont_host(xs))
            Y = jnp.asarray(fs.to_mont_host(ys))
            return (X, Y, zcol())
        else:
            x0 = [0 if a is None else a[0][0] for a in affs]
            x1 = [0 if a is None else a[0][1] for a in affs]
            y0 = [1 if a is None else a[1][0] for a in affs]
            y1 = [0 if a is None else a[1][1] for a in affs]
            X = (jnp.asarray(fs.to_mont_host(x0)), jnp.asarray(fs.to_mont_host(x1)))
            Y = (jnp.asarray(fs.to_mont_host(y0)), jnp.asarray(fs.to_mont_host(y1)))
            Z = (zcol(), jnp.asarray(np.zeros((fs.nl, n), np.uint32)))
            return (X, Y, Z)

    def points_from_device(self, P, point_cls):
        """Projective limb tensors -> list of host points (affine math on host)."""
        fs = self.fs
        X, Y, Z = P
        p = fs.p
        if self.group == 1:
            xs = fs.from_mont_host(np.asarray(X).reshape(fs.nl, -1))
            ys = fs.from_mont_host(np.asarray(Y).reshape(fs.nl, -1))
            zs = fs.from_mont_host(np.asarray(Z).reshape(fs.nl, -1))
            out = []
            for x, y, z in zip(xs, ys, zs):
                if z == 0:
                    out.append(point_cls.identity())
                else:
                    # homogeneous (X:Y:Z) -> Jacobian (X*Z, Y*Z^2, Z)
                    out.append(point_cls._from_jac((x * z % p, y * z % p * z % p, z)))
            return out
        else:
            x0 = fs.from_mont_host(np.asarray(X[0]).reshape(fs.nl, -1))
            x1 = fs.from_mont_host(np.asarray(X[1]).reshape(fs.nl, -1))
            y0 = fs.from_mont_host(np.asarray(Y[0]).reshape(fs.nl, -1))
            y1 = fs.from_mont_host(np.asarray(Y[1]).reshape(fs.nl, -1))
            z0 = fs.from_mont_host(np.asarray(Z[0]).reshape(fs.nl, -1))
            z1 = fs.from_mont_host(np.asarray(Z[1]).reshape(fs.nl, -1))
            from ..curves.tower import Fq2Ops

            f2 = Fq2Ops(p)
            out = []
            for i in range(len(x0)):
                z = (z0[i], z1[i])
                if z == (0, 0):
                    out.append(point_cls.identity())
                else:
                    x = (x0[i], x1[i])
                    y = (y0[i], y1[i])
                    xj = f2.mul(x, z)
                    yj = f2.mul(y, f2.sqr(z))
                    out.append(point_cls._from_jac((xj, yj, z)))
            return out


_GROUP_SPECS = {}


def get_group_spec(curve, group):
    key = (curve.name, group)
    if key not in _GROUP_SPECS:
        _GROUP_SPECS[key] = GroupSpec(curve, group)
    return _GROUP_SPECS[key]
