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
    """[k_i]G as (x, y, inf) Montgomery limb arrays, via one device kernel."""
    fr, fq = cv.fr, cv.fq
    fqctx = fjnp.get_ctx(fq.name)
    n = len(scalars)
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
