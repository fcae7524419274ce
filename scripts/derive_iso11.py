"""Derive the 11-isogeny map E' -> E for BLS12-381 G1 (Wahby-Boneh / RFC 9380
section 8.8.1) from first principles, so hash2curve.py can carry the SSWU/WB
suite the reference uses (arkworks MapToCurveBasedHasher<.., WBMap<Config>>,
/root/reference/src/bls12_381/curve.rs:163-171) without copying constant
tables from anywhere.

Method:
  1. E': y^2 = x^3 + A'x + B' (the SSWU-friendly curve, RFC 9380 8.8.1) has
     the same order as E: y^2 = x^3 + 4 (isogenous curves share the trace).
     #E = h * r with h = 0x396C8C005555E1568C00AAAB0000AAAB; 11 | h, so E'
     has a rational 11-torsion subgroup — the kernel of the isogeny to E.
  2. Take a random point P on E', compute Q = (h*r//11) * P until Q != O.
     Kernel polynomial K(x) = prod_{i=1..5} (x - x([i]Q)).
  3. Velu/Kohel in polynomial form (no root extraction):
       N(x) = (11x - 2*s1)*K^2 - 2*(3x^2 + A')*K'*K - 4*(x^3 + A'x + B')*(K''K - K'^2)
       phi_x = N / K^2,  phi_y = y * (N'K - 2NK') / K^3
     Codomain y^2 = x^3 + a''x + b'' solved from two mapped points; a'' must
     be 0 (codomain ~ E).
  4. Normalize by the isomorphism (x, y) -> (u^2 x, u^3 y) with u^6 = 4/b''.
     The 6 sixth-roots (x automorphisms of E, j = 0) give 6 candidate maps;
     the one matching the RFC 9380 BLS12381G1_XMD:SHA-256_SSWU_RO_ test
     vectors is the standard map (arkworks tests against the same vectors).

Output: the polynomial coefficient tables (x_num, x_den, y_num, y_den) in
ascending-degree order, printed as Python literals for curves/hash2curve.py.

Run: python scripts/derive_iso11.py   (takes a few seconds, host-only)
"""

import random

Q = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
H = 0x396C8C005555E1568C00AAAB0000AAAB  # G1 cofactor
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001  # subgroup order
# SSWU isogenous curve constants (RFC 9380 8.8.1); validated below by the
# group-order check (h*r)*P == O which fails for a wrong curve.
A_P = 0x144698A3B8E9433D693A02C96D4982B0EA985383EE66A8D8E8981AEFD881AC98936F8DA0E0F97F5CF428082D584C1D
B_P = 0x12E2908D11688030018B12E8753EEE3B2016C1F0F24F4070A0B9C14FCEF35EF55A23215A316CEAA5D1CC48E98E172BE0
A_E, B_E = 0, 4


def inv(a):
    return pow(a, Q - 2, Q)


def legendre(a):
    return pow(a, (Q - 1) // 2, Q)


def sqrt_fq(a):
    # q = 3 mod 4
    r = pow(a, (Q + 1) // 4, Q)
    return r if r * r % Q == a % Q else None


# ---- affine point ops on y^2 = x^3 + ax + b over Fq ----
def pt_add(P1, P2, a):
    if P1 is None:
        return P2
    if P2 is None:
        return P1
    x1, y1 = P1
    x2, y2 = P2
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return None
        lam = (3 * x1 * x1 + a) * inv(2 * y1) % Q
    else:
        lam = (y2 - y1) * inv(x2 - x1) % Q
    x3 = (lam * lam - x1 - x2) % Q
    return (x3, (lam * (x1 - x3) - y1) % Q)


def pt_mul(k, P, a):
    acc = None
    while k:
        if k & 1:
            acc = pt_add(acc, P, a)
        P = pt_add(P, P, a)
        k >>= 1
    return acc


def random_point(a, b, rng):
    while True:
        x = rng.randrange(Q)
        rhs = (x * x * x + a * x + b) % Q
        y = sqrt_fq(rhs)
        if y is not None:
            return (x, y)


# ---- dense polynomials over Fq, ascending coefficients ----
def ptrim(p):
    while p and p[-1] == 0:
        p.pop()
    return p


def pmul(p, q):
    out = [0] * (len(p) + len(q) - 1) if p and q else []
    for i, a in enumerate(p):
        if a:
            for j, b in enumerate(q):
                out[i + j] = (out[i + j] + a * b) % Q
    return ptrim(out)


def padd(p, q):
    out = [0] * max(len(p), len(q))
    for i, a in enumerate(p):
        out[i] = a
    for i, b in enumerate(q):
        out[i] = (out[i] + b) % Q
    return ptrim(out)


def pscale(p, c):
    return ptrim([a * c % Q for a in p])


def pdiff(p):
    return ptrim([(i * a) % Q for i, a in enumerate(p)][1:])


def peval(p, x):
    acc = 0
    for a in reversed(p):
        acc = (acc * x + a) % Q
    return acc


def main():
    rng = random.Random(0xB15B)
    n = H * R
    assert n % 11 == 0, "11 must divide #E'(Fq) for a rational kernel"

    # kernel generator of the 11-torsion on E'
    while True:
        P = random_point(A_P, B_P, rng)
        assert pt_mul(n, P, A_P) is None, "A'/B' wrong: group order mismatch"
        Kgen = pt_mul(n // 11, P, A_P)
        if Kgen is not None:
            break
    assert pt_mul(11, Kgen, A_P) is None

    xs = []
    Qi = Kgen
    for _ in range(5):
        xs.append(Qi[0])
        Qi = pt_add(Qi, Kgen, A_P)

    # kernel polynomial K(x), degree 5 monic
    K = [1]
    for xi in xs:
        K = pmul(K, [(-xi) % Q, 1])
    s1 = sum(xs) % Q

    K1, K2 = pdiff(K), pdiff(pdiff(K))
    KK = pmul(K, K)
    # N(x) per Kohel (derived in module docstring)
    N = padd(
        pmul([(-2 * s1) % Q, 11], KK),
        padd(
            pscale(pmul(pmul([A_P, 0, 3], K1), K), Q - 2),
            pscale(pmul([B_P, A_P, 0, 1], padd(pmul(K2, K), pscale(pmul(K1, K1), Q - 1))), Q - 4),
        ),
    )
    # y-map numerator (pre-normalization): y * (N'K - 2NK') / K^3
    Ynum = padd(pmul(pdiff(N), K), pscale(pmul(N, K1), Q - 2))
    Yden = pmul(KK, K)

    def phi(pt):
        x, y = pt
        d = peval(KK, x)
        if d == 0:
            return None
        xx = peval(N, x) * inv(d) % Q
        yy = y * peval(Ynum, x) % Q * inv(peval(Yden, x)) % Q
        return (xx, yy)

    # codomain from two mapped points: y^2 - x^3 = a''x + b''
    pts = [phi(random_point(A_P, B_P, rng)) for _ in range(2)]
    (x1, y1), (x2, y2) = pts
    c1 = (y1 * y1 - x1 * x1 * x1) % Q
    c2 = (y2 * y2 - x2 * x2 * x2) % Q
    a2 = (c1 - c2) * inv(x1 - x2) % Q
    b2 = (c1 - a2 * x1) % Q
    assert a2 == 0, f"codomain not j=0-compatible: a''={a2:#x}"
    print(f"# codomain: y^2 = x^3 + {b2:#x}")

    # u^6 = 4 / b'': find all sixth roots by CZ-free search using the
    # group structure: one square root, one cube root, then multiply by mu_6.
    s = 4 * inv(b2) % Q
    t = sqrt_fq(s)
    assert t is not None, "4/b'' must be a square"

    # cube root via gcd(x^q - x, x^3 - t) equal-degree splitting
    def cube_root(v):
        # roots of x^3 - v over Fq; q = 1 mod 3 so 0 or 3 rational roots
        def polmod_mul(p, q2, m):
            return pdivmod(pmul(p, q2), m)

        def pdivmod(p, m):
            p = list(p)
            dm = len(m) - 1
            lead_inv = inv(m[-1])
            while len(p) - 1 >= dm and p:
                c = p[-1] * lead_inv % Q
                off = len(p) - 1 - dm
                for i, a in enumerate(m):
                    p[off + i] = (p[off + i] - c * a) % Q
                ptrim(p)
            return p

        m = [(-v) % Q, 0, 0, 1]
        # x^q mod m
        acc, base, e = [1], [0, 1], Q
        while e:
            if e & 1:
                acc = pdivmod(pmul(acc, base), m)
            base = pdivmod(pmul(base, base), m)
            e >>= 1
        # gcd(acc - x, m)
        def pgcd(a, b):
            a, b = list(a), list(b)
            while b:
                a = pdivmod(a, b)
                a, b = b, a
            return a

        g = pgcd(m, padd(acc, [0, Q - 1]))
        if len(g) < 2:
            return None  # v is not a cube in Fq
        if len(g) == 2:  # linear: single rational root
            return (-g[0]) * inv(g[1]) % Q
        # all three roots rational: split with random gcds
        while len(g) > 2:
            r = rng.randrange(Q)
            # (x + r)^((q-1)/2) - 1 mod g
            acc2, base2, e2 = [1], [r, 1], (Q - 1) // 2
            while e2:
                if e2 & 1:
                    acc2 = pdivmod(pmul(acc2, base2), g)
                base2 = pdivmod(pmul(base2, base2), g)
                e2 >>= 1
            h2 = pgcd(g, padd(acc2, [Q - 1]))
            if 2 <= len(h2) < len(g):
                g = h2
        return (-g[0]) * inv(g[1]) % Q

    c = cube_root(t)  # c^3 = t, so c^6 = t^2 = s -> u = c is one sixth root
    if c is None:
        c = cube_root((Q - t) % Q)
    assert c is not None and pow(c, 6, Q) == s, "4/b'' must be a sixth power"

    # mu_6 = {(-z3)^i}: z3 from x^2 + x + 1
    z3 = (-1 + sqrt_fq(Q - 3)) * inv(2) % Q
    assert pow(z3, 3, Q) == 1 and z3 != 1
    zeta6 = (-z3) % Q
    us = [c * pow(zeta6, i, Q) % Q for i in range(6)]

    # candidate normalized maps; validate each against RFC 9380 RO vectors
    import hashlib

    def expand_xmd(msg, dst, n_bytes):
        b_in_bytes = 32
        ell = -(-n_bytes // b_in_bytes)
        dst_prime = dst + bytes([len(dst)])
        z_pad = b"\x00" * 64
        l_i_b = n_bytes.to_bytes(2, "big")
        b0 = hashlib.sha256(z_pad + msg + l_i_b + b"\x00" + dst_prime).digest()
        bi = hashlib.sha256(b0 + b"\x01" + dst_prime).digest()
        out = bi
        for i in range(2, ell + 1):
            tmp = bytes(a ^ b for a, b in zip(b0, bi))
            bi = hashlib.sha256(tmp + bytes([i]) + dst_prime).digest()
            out += bi
        return out[:n_bytes]

    def hash_to_field(msg, dst, count):
        L = 64
        u = expand_xmd(msg, dst, count * L)
        return [int.from_bytes(u[i * L : (i + 1) * L], "big") % Q for i in range(count)]

    def sgn0(x):
        return x & 1

    def sswu(u):
        Z = 11
        t1 = Z * u * u % Q
        t2 = (t1 * t1 + t1) % Q
        # simplified SSWU (RFC 9380 F.2): x1 = (-B/A)(1 + 1/(Z^2 u^4 + Z u^2))
        if t2 == 0:
            x1 = B_P * inv(Z * A_P % Q) % Q
        else:
            x1 = (Q - B_P) * inv(A_P) % Q * (1 + inv(t2)) % Q
        gx1 = (pow(x1, 3, Q) + A_P * x1 + B_P) % Q
        x2 = t1 * x1 % Q
        gx2 = (pow(x2, 3, Q) + A_P * x2 + B_P) % Q
        if legendre(gx1) != Q - 1:
            x, y = x1, sqrt_fq(gx1)
        else:
            x, y = x2, sqrt_fq(gx2)
        if sgn0(u) != sgn0(y):
            y = (Q - y) % Q
        return (x, y)

    DST = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_"
    VEC = {
        b"": (
            0x052926ADD2207B76CA4FA57A8734416C8DC95E24501772C814278700EED6D1E4E8CF62D9C09DB0FAC349612B759E79A1,
            0x08BA738453BFED09CB546DBB0783DBB3A5F1F566ED67BB6BE0E8C67E2E81A4CC68EE29813BB7994998F3EAE0C9C6A265,
        ),
        b"abc": (
            0x03567BC5EF9C690C2AB2ECDF6A96EF1C139CC0B2F284DCA0A9A7943388A49A3AEE664BA5379A7655D3C68900BE2F6903,
            0x0B9C15F3FE6E5CF4211F346271D7B01C8F3B28BE689C8429C85B67AF215533311F0B8DFAAA154FA6B88176C229F2885D,
        ),
    }

    def full_hash(msg, u):
        uu = hash_to_field(msg, DST, 2)
        pts = []
        for ui in uu:
            x, y = sswu(ui)
            xx, yy = phi((x, y))
            pts.append((u * u % Q * xx % Q, pow(u, 3, Q) * yy % Q))
        S = pt_add(pts[0], pts[1], 0)
        h_eff = 0xD201000000010001
        return pt_mul(h_eff, S, 0)

    winner = None
    for u in us:
        ok = all(full_hash(m, u) == VEC[m] for m in VEC)
        if ok:
            winner = u
            break
    assert winner is not None, (
        "no sixth-root candidate reproduced the RFC 9380 vectors - "
        "either the remembered vectors or the derivation is wrong"
    )
    u = winner
    print(f"# u = {u:#x}")

    x_num = pscale(N, u * u % Q)
    x_den = list(KK)
    y_num = pscale(Ynum, pow(u, 3, Q))
    y_den = list(Yden)

    for name, tab in (("ISO11_X_NUM", x_num), ("ISO11_X_DEN", x_den), ("ISO11_Y_NUM", y_num), ("ISO11_Y_DEN", y_den)):
        print(f"{name} = [")
        for cfc in tab:
            print(f"    {cfc:#x},")
        print("]")


if __name__ == "__main__":
    main()
