"""Groth16 circuit-specific setup (reference src/zkey_new.js:36-181).

Two entry points:

* ``setup_from_secrets(r1cs, tau, alpha, beta, ...)`` — generates the zkey
  directly from toxic-waste secrets, computing the Lagrange values
  L_c(tau) in Fr on host and all point sections with one batched same-base
  scalar-mul kernel on device.  Used by tests and as the semantic reference;
  equivalent to running a 1-participant ptau ceremony + newZKey.
* ``setup_from_ptau(r1cs, ptau)`` — the production path composing points
  from a prepared powers-of-tau file's Lagrange sections exactly like the
  reference (A_s = sum coef * [L_c(tau)]G1 via MSM per signal; H_i =
  odd-index Lagrange points of the 2n domain, src/zkey_new.js:182-201).
  (Implemented in the ceremony milestone.)

Key structural facts mirrored from the reference:
  - gamma = delta = 1 in a fresh zkey (vk gamma2/delta2 are the generators,
    src/zkey_new.js:127-129); phase-2 contributions later rescale delta.
  - Extra rows nConstraints+s bind each public signal s: A gets +L_{nCon+s},
    IC gets +beta*L_{nCon+s} (src/zkey_new.js:290-300), and the coefficient
    list gains [0, nCon+s, s, 1].
  - Coefficient section values are stored as value*R^2.
"""

from __future__ import annotations

import functools

import numpy as np

from ..curves import host_curve as hc
from ..curves import jac
from ..curves.gops import FqOps, Fq2Ops
from ..fields import fjnp
from ..formats import points as pcodec
from ..formats import zkey as zkey_fmt
from ..formats.r1cs import R1cs


def _floor_log2(x: int) -> int:
    return x.bit_length() - 1


def domain_size_for(r1cs: R1cs) -> int:
    """reference src/zkey_new.js:59: log2(nCon + nPub + 1 - 1) + 1."""
    return 2 ** (_floor_log2(r1cs.n_constraints + r1cs.n_public) + 1)


def lagrange_at(fr, tau: int, n: int):
    """[L_i(tau)]_{i<n} over the 2^k domain, ffjavascript root convention."""
    k = n.bit_length() - 1
    w = fr.w[k]
    p = fr.p
    zn = (pow(tau, n, p) - 1) % p
    if zn == 0:
        raise ValueError("tau lies in the evaluation domain")
    n_inv = pow(n, p - 2, p)
    out = []
    wi = 1
    for _ in range(n):
        out.append(zn * n_inv % p * wi % p * pow((tau - wi) % p, p - 2, p) % p)
        wi = wi * w % p
    return out


def _points_from_scalars(cv, scalars, g2=False, msm_c=None):
    """[k_i]G as (x, y, inf) Montgomery limb arrays, via one device kernel.

    Tiny batches go through host bigints instead — the 256-bit
    double-and-add device program costs minutes of XLA compile on CPU,
    which dwarfs a few hundred host scalar multiplications."""
    fr, fq = cv.fr, cv.fq
    fqctx = fjnp.get_ctx(fq.name)
    n = len(scalars)
    if n <= 512:
        from ..curves import host_curve as hc

        gen = cv.g2 if g2 else cv.g1
        mul = hc.g2_mul if g2 else hc.g1_mul
        pts = [mul(cv, gen, int(k) % fr.p) for k in scalars]
        if g2:
            id_pt = ((0, 0), (1, 0))
            xs = tuple(fjnp.np_from_ints(
                fq, [fq.to_mont((id_pt if p is None else p)[0][i])
                     for p in pts]) for i in (0, 1))
            ys = tuple(fjnp.np_from_ints(
                fq, [fq.to_mont((id_pt if p is None else p)[1][i])
                     for p in pts]) for i in (0, 1))
        else:
            xs = fjnp.np_from_ints(
                fq, [fq.to_mont(0 if p is None else p[0]) for p in pts])
            ys = fjnp.np_from_ints(
                fq, [fq.to_mont(1 if p is None else p[1]) for p in pts])
        inf = np.array([p is None for p in pts], dtype=bool)
        return xs, ys, inf
    sl = fjnp.np_from_ints(fr, scalars)
    bits = jac.scalar_bits_from_limbs(sl, fr.n8 * 8)
    if not g2:
        f = FqOps(fqctx)
        gx = fjnp.np_from_ints(fq, [fq.to_mont(cv.g1[0])] * n)
        gy = fjnp.np_from_ints(fq, [fq.to_mont(cv.g1[1])] * n)
        P = jac.from_affine(f, gx, gy)
    else:
        f = Fq2Ops(fqctx)
        gx = tuple(fjnp.np_from_ints(fq, [fq.to_mont(cv.g2[0][i])] * n) for i in (0, 1))
        gy = tuple(fjnp.np_from_ints(fq, [fq.to_mont(cv.g2[1][i])] * n) for i in (0, 1))
        P = jac.from_affine(f, gx, gy)
    import jax

    @jax.jit
    def kern(bits, P):
        acc = jac.batch_scalar_mul(f, P, bits)
        return jac.to_affine_batch(f, acc, f.batch_inv)

    x, y, inf = kern(bits, P)
    return jax.tree.map(np.asarray, (x, y, inf))


def setup_from_secrets(r1cs: R1cs, tau: int, alpha: int, beta: int,
                       gamma: int = 1, delta: int = 1) -> zkey_fmt.Groth16Zkey:
    from ..curves.host_curve import BN254, BLS12_381

    if r1cs.prime == BN254.fr.p:
        cv = BN254
    elif r1cs.prime == BLS12_381.fr.p:
        cv = BLS12_381
    else:
        raise ValueError("unknown curve for r1cs prime")
    fr, fq = cv.fr, cv.fq
    p = fr.p

    n_public = r1cs.n_public
    n_vars = r1cs.n_wires
    domain = domain_size_for(r1cs)
    power = domain.bit_length() - 1

    L = lagrange_at(fr, tau, domain)
    L2 = lagrange_at(fr, tau, 2 * domain)

    vals = fjnp.np_to_ints(fr, r1cs.vals)

    u = [0] * n_vars
    v = [0] * n_vars
    wv = [0] * n_vars
    for mi, ci, si, val in zip(r1cs.m, r1cs.c, r1cs.s, vals):
        t = val * L[int(ci)] % p
        if mi == 0:
            u[int(si)] = (u[int(si)] + t) % p
        elif mi == 1:
            v[int(si)] = (v[int(si)] + t) % p
        else:
            wv[int(si)] = (wv[int(si)] + t) % p
    for s in range(n_public + 1):
        u[s] = (u[s] + L[r1cs.n_constraints + s]) % p

    gamma_inv = pow(gamma, p - 2, p)
    delta_inv = pow(delta, p - 2, p)

    ic_scal, c_scal = [], []
    for s in range(n_vars):
        comp = (beta * u[s] + alpha * v[s] + wv[s]) % p
        if s <= n_public:
            ic_scal.append(comp * gamma_inv % p)
        else:
            c_scal.append(comp * delta_inv % p)

    h_scal = [L2[2 * i + 1] * delta_inv % p for i in range(domain)]

    a_pts = _points_from_scalars(cv, u)
    b1_pts = _points_from_scalars(cv, v)
    b2_pts = _points_from_scalars(cv, v, g2=True)
    c_pts = _points_from_scalars(cv, c_scal)
    h_pts = _points_from_scalars(cv, h_scal)
    ic_pts_dev = _points_from_scalars(cv, ic_scal)
    ic_bytes = pcodec.g1_lem_to_bytes(fq, *ic_pts_dev)
    ic = pcodec.g1_lem_to_ints(fq, ic_bytes, n_public + 1)

    # coefficient list: m<2 entries + the public-binding rows
    keep = r1cs.m < 2
    ms = np.concatenate([r1cs.m[keep],
                         np.zeros(n_public + 1, dtype=np.int32)])
    cs = np.concatenate([r1cs.c[keep],
                         (r1cs.n_constraints
                          + np.arange(n_public + 1)).astype(np.int32)])
    ss = np.concatenate([r1cs.s[keep],
                         np.arange(n_public + 1).astype(np.int32)])
    plain = fjnp.np_to_ints(fr, r1cs.vals[:, keep]) + [1] * (n_public + 1)
    stored = [x * fr.R2 % p for x in plain]  # value * R^2 convention
    order = np.argsort(cs, kind="stable")
    coeffs = {
        "m": ms[order],
        "c": cs[order],
        "s": ss[order],
        "val": fjnp.np_from_ints(fr, [stored[i] for i in order]),
    }

    g1 = cv.g1
    g2 = cv.g2
    return zkey_fmt.Groth16Zkey(
        curve=cv, n8q=fq.n8, n8r=fr.n8, n_vars=n_vars, n_public=n_public,
        domain_size=domain, power=power,
        vk_alpha_1=hc.g1_mul(cv, g1, alpha),
        vk_beta_1=hc.g1_mul(cv, g1, beta),
        vk_beta_2=hc.g2_mul(cv, g2, beta),
        vk_gamma_2=hc.g2_mul(cv, g2, gamma),
        vk_delta_1=hc.g1_mul(cv, g1, delta),
        vk_delta_2=hc.g2_mul(cv, g2, delta),
        ic=ic, coeffs=coeffs,
        a_points=a_pts, b1_points=b1_pts, b2_points=b2_pts,
        c_points=c_pts, h_points=h_pts, raw=None,
    )


def _hash_u32_be(hasher, n: int):
    hasher.update(int(n).to_bytes(4, "big"))


def setup_from_ptau(r1cs: R1cs, ptau, logger=None) -> bytes:
    """`zkey new`: compose the Groth16 proving key from a prepared
    powers-of-tau file (reference src/zkey_new.js:36-181).

    Per-signal QAP point composition A[s] = sum_c a_{c,s}[L_c(tau)]G etc.
    (reference :203-336) runs as ONE device batch scalar-mul + segmented
    jacobian reduction per section (snarkjs_tpu.curves.msm.segmented_msm)
    instead of the reference's per-signal worker-thread MSM fan-out
    (:338-501).  Returns the .zkey file bytes; the blake2b circuit hash
    (csHash, :166-173) lands in section 10.
    """
    import jax
    from ..ceremony import ptau_ops
    from ..curves import msm as msm_mod
    from ..formats.binfile import BinFileWriter
    from ..utils.blake2b import Blake2b

    cv = ptau.curve
    fr, fq = cv.fr, cv.fq
    p = fr.p
    if r1cs.prime != fr.p:
        raise ValueError("r1cs curve does not match powers of tau ceremony "
                         "curve")
    n_public = r1cs.n_public
    n_vars = r1cs.n_wires
    n_con = r1cs.n_constraints
    domain = domain_size_for(r1cs)
    power = domain.bit_length() - 1
    if power > ptau.power:
        raise ValueError(
            f"circuit too big for this power of tau ceremony. "
            f"{n_con}*2 > 2**{ptau.power}")
    if 12 not in ptau.sections:
        raise ValueError("Powers of tau is not prepared.")

    s_g1, s_g2 = 2 * fq.n8, 4 * fq.n8
    # Lagrange blocks for the circuit power start at point (domain-1)
    off1 = (domain - 1) * s_g1
    off2 = (domain - 1) * s_g2
    ltau1 = ptau.sections[12][off1:off1 + domain * s_g1]
    ltau2 = ptau.sections[13][off2:off2 + domain * s_g2]
    lalpha = ptau.sections[14][off1:off1 + domain * s_g1]
    lbeta = ptau.sections[15][off1:off1 + domain * s_g1]

    cs = Blake2b(64)
    alpha1 = ptau.sections[4][:s_g1]
    beta1 = ptau.sections[5][:s_g1]
    beta2 = ptau.sections[6][:s_g2]
    g1b = pcodec.g1_lem_from_ints(fq, [cv.g1])
    g2b = pcodec.g2_lem_from_ints(fq, [cv.g2])
    for b, g2_ in ((alpha1, False), (beta1, False), (beta2, True),
                   (g2b, True), (g1b, False), (g2b, True)):
        cs.update(ptau_ops.lem_to_u(cv, b, 1, g2_))

    # ---- entry lists (constraint-order traversal, reference :203-300) ----
    vals_plain = fjnp.np_to_ints(fr, r1cs.vals)
    m_np, c_np, s_np = r1cs.m, r1cs.c, r1cs.s

    def entries(mask_m, base_lem, seg_of, extra=()):
        """(seg_sorted, base_idx, scalar_ints) for entries matching mask."""
        idx = np.nonzero(mask_m)[0]
        segs = np.array([seg_of(int(s_np[i])) for i in idx], dtype=np.int64)
        keep = segs >= 0
        idx, segs = idx[keep], segs[keep]
        basei = c_np[idx].astype(np.int64)
        scal = [vals_plain[i] for i in idx]
        srcs = [base_lem] * len(idx)
        for (seg_e, base_e, src_e, scal_e) in extra:
            segs = np.append(segs, seg_e)
            basei = np.append(basei, base_e)
            srcs.append(src_e)
            scal.append(scal_e)
        order = np.argsort(segs, kind="stable")
        return (segs[order], basei[order], [scal[i] for i in order],
                [srcs[i] for i in order])

    fqctx = fjnp.get_ctx(fq.name)
    from ..curves.gops import FqOps, Fq2Ops
    f1 = FqOps(fqctx)
    f2 = Fq2Ops(fqctx)
    nbits = fr.p.bit_length()

    def compose_g1(segs, basei, scals, srcs, n_out):
        """Gather bases from LEM sources, run segmented MSM, return LEM."""
        n = len(segs)
        if n == 0:
            return b"\0" * (n_out * s_g1)
        xs = np.empty((fq.nl, n), dtype=np.uint32)
        ys = np.empty((fq.nl, n), dtype=np.uint32)
        infs = np.empty(n, dtype=bool)
        for j, (src, bi) in enumerate(zip(srcs, basei)):
            x1, y1, i1 = pcodec.g1_lem_from_bytes(
                fq, src[int(bi) * s_g1:(int(bi) + 1) * s_g1], 1)
            xs[:, j], ys[:, j], infs[j] = x1[:, 0], y1[:, 0], i1[0]
        R = 64
        pad = (-n) % R
        if pad:
            xs = np.pad(xs, ((0, 0), (0, pad)))
            ys = np.pad(ys, ((0, 0), (0, pad)))
            infs = np.pad(infs, (0, pad), constant_values=True)
            segs = np.append(segs, [n_out] * pad)
            scals = scals + [0] * pad
        sc = fjnp.np_from_ints(fr, scals)
        out = _seg_fn(f1, fq.name, fr.name, 1, len(segs), n_out, nbits)(
            xs, ys, infs, sc, segs.astype(np.int32))
        x, y, inf = jax.tree.map(np.asarray, out)
        return pcodec.g1_lem_to_bytes(fq, x, y, inf)

    def compose_g2(segs, basei, scals, srcs, n_out):
        n = len(segs)
        if n == 0:
            return b"\0" * (n_out * s_g2)
        xs = [np.empty((fq.nl, n), dtype=np.uint32) for _ in range(2)]
        ys = [np.empty((fq.nl, n), dtype=np.uint32) for _ in range(2)]
        infs = np.empty(n, dtype=bool)
        for j, (src, bi) in enumerate(zip(srcs, basei)):
            (x0, x1), (y0, y1), i1 = pcodec.g2_lem_from_bytes(
                fq, src[int(bi) * s_g2:(int(bi) + 1) * s_g2], 1)
            xs[0][:, j], xs[1][:, j] = x0[:, 0], x1[:, 0]
            ys[0][:, j], ys[1][:, j] = y0[:, 0], y1[:, 0]
            infs[j] = i1[0]
        R = 64
        pad = (-n) % R
        if pad:
            xs = [np.pad(a, ((0, 0), (0, pad))) for a in xs]
            ys = [np.pad(a, ((0, 0), (0, pad))) for a in ys]
            infs = np.pad(infs, (0, pad), constant_values=True)
            segs = np.append(segs, [n_out] * pad)
            scals = scals + [0] * pad
        sc = fjnp.np_from_ints(fr, scals)
        out = _seg_fn(f2, fq.name, fr.name, 2, len(segs), n_out, nbits)(
            tuple(xs), tuple(ys), infs, sc, segs.astype(np.int32))
        x, y, inf = jax.tree.map(np.asarray, out)
        return pcodec.g2_lem_to_bytes(fq, (x[0], x[1]), (y[0], y[1]), inf)

    # A (m=0) + public bindings rows
    pub_extra = [(s, n_con + s, ltau1, 1) for s in range(n_public + 1)]
    A_lem = compose_g1(*entries(m_np == 0, ltau1, lambda s: s,
                                extra=pub_extra), n_vars)
    B1_lem = compose_g1(*entries(m_np == 1, ltau1, lambda s: s), n_vars)
    B2_lem = compose_g2(*entries(m_np == 1, ltau2, lambda s: s), n_vars)

    # C: s>nPublic; sources depend on m (A-side -> beta, B-side -> alpha,
    # C-side -> tau); IC: s<=nPublic of the same composition + binding rows
    def c_seg(s):
        return s - n_public - 1 if s > n_public else -1

    def ic_seg(s):
        return s if s <= n_public else -1

    def c_entries(seg_of, extra):
        idx = np.arange(len(m_np))
        segs, basei, scal, srcs = [], [], [], []
        for i in idx:
            sg = seg_of(int(s_np[i]))
            if sg < 0:
                continue
            segs.append(sg)
            basei.append(int(c_np[i]))
            scal.append(vals_plain[i])
            srcs.append({0: lbeta, 1: lalpha, 2: ltau1}[int(m_np[i])])
        for (seg_e, base_e, src_e, scal_e) in extra:
            segs.append(seg_e)
            basei.append(base_e)
            srcs.append(src_e)
            scal.append(scal_e)
        order = np.argsort(np.asarray(segs, dtype=np.int64), kind="stable")
        return (np.asarray(segs, dtype=np.int64)[order],
                np.asarray(basei, dtype=np.int64)[order],
                [scal[i] for i in order], [srcs[i] for i in order])

    C_lem = compose_g1(*c_entries(c_seg, []), n_vars - n_public - 1)
    ic_extra = [(s, n_con + s, lbeta, 1) for s in range(n_public + 1)]
    IC_lem = compose_g1(*c_entries(ic_seg, ic_extra), n_public + 1)

    # H points: odd Lagrange points of the 2n domain (writeHs, :182-201)
    off_h = (2 * domain - 1) * s_g1
    block2n = ptau.sections[12][off_h:off_h + 2 * domain * s_g1]
    H_lem = b"".join(block2n[(2 * i + 1) * s_g1:(2 * i + 2) * s_g1]
                     for i in range(domain))

    # csHash: section hashes in write order (:338-343, :504-577)
    _hash_u32_be(cs, n_public + 1)
    cs.update(ptau_ops.lem_to_u(cv, IC_lem, n_public + 1, False))
    _hash_u32_be(cs, domain - 1)
    tau_pts = pcodec.g1_lem_to_ints(fq, ptau.sections[2], 2 * domain - 1)
    for i in range(domain - 1):
        d = hc.g1_add(cv, tau_pts[domain + i], hc.g1_neg(cv, tau_pts[i]))
        cs.update(pcodec.g1_uncompressed_be(fq, d))
    _hash_u32_be(cs, n_vars - n_public - 1)
    cs.update(ptau_ops.lem_to_u(cv, C_lem, n_vars - n_public - 1, False))
    _hash_u32_be(cs, n_vars)
    cs.update(ptau_ops.lem_to_u(cv, A_lem, n_vars, False))
    _hash_u32_be(cs, n_vars)
    cs.update(ptau_ops.lem_to_u(cv, B1_lem, n_vars, False))
    _hash_u32_be(cs, n_vars)
    cs.update(ptau_ops.lem_to_u(cv, B2_lem, n_vars, True))
    cs_hash = cs.digest()

    # ---- serialize ----
    from ..formats.binfile import SectionWriter

    w = BinFileWriter("zkey", 1)
    s1 = SectionWriter()
    s1.u32(zkey_fmt.GROTH16_PROTOCOL_ID)
    w.add_section(1, s1.tobytes())

    h = SectionWriter()
    h.u32(fq.n8)
    h.big(fq.p, fq.n8)
    h.u32(fr.n8)
    h.big(fr.p, fr.n8)
    h.u32(n_vars)
    h.u32(n_public)
    h.u32(domain)
    h.raw(alpha1)
    h.raw(beta1)
    h.raw(beta2)
    h.raw(g2b)   # gamma2 = G2
    h.raw(g1b)   # delta1 = G1
    h.raw(g2b)   # delta2 = G2
    w.add_section(2, h.tobytes())
    w.add_section(3, IC_lem)

    # coefficient section (m<2 entries in constraint order + public rows)
    keep = m_np < 2
    sc = SectionWriter()
    idxs = np.nonzero(keep)[0]
    sc.u32(len(idxs) + n_public + 1)
    items = [(int(c_np[i]), 0, (int(m_np[i]), int(c_np[i]), int(s_np[i]),
                                vals_plain[i])) for i in idxs]
    items += [(n_con + s, 1, (0, n_con + s, s, 1))
              for s in range(n_public + 1)]
    # reference emits A/B entries per constraint then all public rows;
    # entries are already grouped by constraint in the r1cs stream
    for _, _, (mi, ci, si, v) in items:
        sc.u32(mi)
        sc.u32(ci)
        sc.u32(si)
        sc.big(v * fr.R2 % p, fr.n8)  # double-Montgomery storage
    w.add_section(4, sc.tobytes())

    w.add_section(5, A_lem)
    w.add_section(6, B1_lem)
    w.add_section(7, B2_lem)
    w.add_section(8, C_lem)
    w.add_section(9, H_lem)

    s10 = SectionWriter()
    s10.raw(cs_hash)
    s10.u32(0)
    w.add_section(10, s10.tobytes())
    return w.tobytes()


@functools.lru_cache(maxsize=None)
def _seg_fn_cache():
    return {}


def _seg_fn(f, fq_name, fr_name, ext, n, n_out, nbits):
    """Jitted segmented-MSM + to-affine for one shape."""
    import jax
    from ..curves import msm as msm_mod

    cache = _seg_fn_cache()
    key = (fq_name, fr_name, ext, n, n_out, nbits)
    if key not in cache:
        @jax.jit
        def fn(px, py, pinf, scalars, seg):
            out = msm_mod.segmented_msm(f, px, py, pinf, scalars, seg,
                                        n_out, nbits, R=min(64, n))
            return jac.to_affine_batch(f, out, f.batch_inv)

        cache[key] = fn
    return cache[key]


def write_groth16_zkey(zk: zkey_fmt.Groth16Zkey) -> bytes:
    """Serialize to the reference .zkey byte format (sections 1-10)."""
    from ..formats.binfile import BinFileWriter, SectionWriter

    cv = zk.curve
    fq, fr = cv.fq, cv.fr
    w = BinFileWriter("zkey", 1)

    s1 = SectionWriter()
    s1.u32(zkey_fmt.GROTH16_PROTOCOL_ID)
    w.add_section(1, s1.tobytes())

    h = SectionWriter()
    h.u32(fq.n8)
    h.big(fq.p, fq.n8)
    h.u32(fr.n8)
    h.big(fr.p, fr.n8)
    h.u32(zk.n_vars)
    h.u32(zk.n_public)
    h.u32(zk.domain_size)
    h.raw(pcodec.g1_lem_from_ints(fq, [zk.vk_alpha_1, zk.vk_beta_1]))
    h.raw(pcodec.g2_lem_from_ints(fq, [zk.vk_beta_2, zk.vk_gamma_2]))
    h.raw(pcodec.g1_lem_from_ints(fq, [zk.vk_delta_1]))
    h.raw(pcodec.g2_lem_from_ints(fq, [zk.vk_delta_2]))
    w.add_section(2, h.tobytes())

    w.add_section(3, pcodec.g1_lem_from_ints(fq, zk.ic))

    co = zk.coeffs
    sc = SectionWriter()
    sc.u32(len(co["m"]))
    vals_b = pcodec.frs_to_bytes(fr, co["val"])
    for i in range(len(co["m"])):
        sc.u32(int(co["m"][i]))
        sc.u32(int(co["c"][i]))
        sc.u32(int(co["s"][i]))
        sc.raw(vals_b[i * fr.n8:(i + 1) * fr.n8])
    w.add_section(4, sc.tobytes())

    w.add_section(5, pcodec.g1_lem_to_bytes(fq, *zk.a_points))
    w.add_section(6, pcodec.g1_lem_to_bytes(fq, *zk.b1_points))
    w.add_section(7, pcodec.g2_lem_to_bytes(fq, *zk.b2_points))
    w.add_section(8, pcodec.g1_lem_to_bytes(fq, *zk.c_points))
    w.add_section(9, pcodec.g1_lem_to_bytes(fq, *zk.h_points))

    s10 = SectionWriter()
    s10.raw(b"\0" * 64)  # circuit hash placeholder (filled by MPC tooling)
    s10.u32(0)
    w.add_section(10, s10.tobytes())
    return w.tobytes()
