"""PLONK prover and verifier — reference src/plonk_prove.js /
src/plonk_verify.js, implementing eprint 2019/953.

Prover (5 rounds, reference :222-888), redesigned for whole-array execution:
  - additions + wire gathers: vectorized gather + Montgomery multiply
  - grand product Z: elementwise num/den, batch inverse, log-depth prefix
    product scan (replaces the serial n-loop :373-429)
  - quotient T: one fused elementwise pass over the 4n domain with the MulZ
    blinding-correction tables (reference src/mul_z.js) as tiled constants
  - divZh: block cumsum (4 steps); opening quotients Wxi/Wxiw: synthetic
    division as an affine-composition scan (poly/fops.py)
  - commitments: Pippenger MSM over the zkey's embedded SRS.

The verifier is O(1) host work: Fiat-Shamir challenge recomputation
(Keccak256 transcript, reference src/Keccak256Transcript.js byte layout:
G1 commitments as big-endian uncompressed x||y, scalars as big-endian Fr),
Lagrange evaluations, the r0/D/F/E combination, and one pairing equation.
"""

from __future__ import annotations

import secrets

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import host_curve as hc
from ..curves import msm as msm_mod
from ..fields import fjnp
from ..formats import wtns as wtns_fmt
from ..formats import zkey as zkey_fmt
from ..ntt import ntt as nttmod
from ..poly import fops
from ..utils.keccak import keccak256


class Transcript:
    """Keccak256 Fiat-Shamir transcript (reference src/Keccak256Transcript.js)."""

    def __init__(self, cv):
        self.cv = cv
        self.data = []

    def reset(self):
        self.data = []

    def add_poly(self, P):
        self.data.append(("g1", P))

    def add_scalar(self, s):
        self.data.append(("fr", s % self.cv.fr.p))

    def challenge(self) -> int:
        if not self.data:
            raise ValueError("no data to generate a transcript")
        fq, fr = self.cv.fq, self.cv.fr
        buf = b""
        for kind, v in self.data:
            if kind == "g1":
                if v is None:
                    buf += b"\0" * (2 * fq.n8)
                else:
                    buf += int(v[0]).to_bytes(fq.n8, "big")
                    buf += int(v[1]).to_bytes(fq.n8, "big")
            else:
                buf += int(v).to_bytes(fr.n8, "big")
        return int.from_bytes(keccak256(buf), "big") % fr.p


def _g1_from_obj(o):
    x, y, z = int(o[0]), int(o[1]), int(o[2])
    if z == 0:
        return None
    if z != 1:
        # projective: normalize (snarkjs always emits z=1 in JSON)
        raise ValueError("non-affine G1 object")
    return (x, y)


def _g2_from_obj(o):
    z = (int(o[2][0]), int(o[2][1]))
    if z == (0, 0):
        return None
    return ((int(o[0][0]), int(o[0][1])), (int(o[1][0]), int(o[1][1])))


def compute_challenges(cv, vk, publics, proof_pts, proof_evals):
    """Rounds 2-5 challenges (reference src/plonk_verify.js:208-273)."""
    fr = cv.fr
    t = Transcript(cv)
    for key in ("Qm", "Ql", "Qr", "Qo", "Qc", "S1", "S2", "S3"):
        t.add_poly(vk[key])
    for w in publics:
        t.add_scalar(w)
    t.add_poly(proof_pts["A"])
    t.add_poly(proof_pts["B"])
    t.add_poly(proof_pts["C"])
    ch = {}
    ch["beta"] = t.challenge()

    t.reset()
    t.add_scalar(ch["beta"])
    ch["gamma"] = t.challenge()

    t.reset()
    t.add_scalar(ch["beta"])
    t.add_scalar(ch["gamma"])
    t.add_poly(proof_pts["Z"])
    ch["alpha"] = t.challenge()

    t.reset()
    t.add_scalar(ch["alpha"])
    t.add_poly(proof_pts["T1"])
    t.add_poly(proof_pts["T2"])
    t.add_poly(proof_pts["T3"])
    ch["xi"] = t.challenge()

    t.reset()
    t.add_scalar(ch["xi"])
    for k in ("eval_a", "eval_b", "eval_c", "eval_s1", "eval_s2", "eval_zw"):
        t.add_scalar(proof_evals[k])
    v = [None] * 6
    v[1] = t.challenge()
    for i in range(2, 6):
        v[i] = v[i - 1] * v[1] % fr.p
    ch["v"] = v

    t.reset()
    t.add_poly(proof_pts["Wxi"])
    t.add_poly(proof_pts["Wxiw"])
    ch["u"] = t.challenge()
    return ch


def verify(vk_obj: dict, publics, proof_obj: dict, logger=None) -> bool:
    cv = hc.get_curve(vk_obj["curve"])
    fr = cv.fr
    p = fr.p

    publics = [int(x) for x in publics]
    if len(publics) != vk_obj["nPublic"]:
        return False
    if any(not (0 <= x < p) for x in publics):
        return False

    try:
        pts = {k: _g1_from_obj(proof_obj[k])
               for k in ("A", "B", "C", "Z", "T1", "T2", "T3", "Wxi", "Wxiw")}
        evals = {k: int(proof_obj[k]) for k in
                 ("eval_a", "eval_b", "eval_c", "eval_zw", "eval_s1", "eval_s2")}
        vk = {k: _g1_from_obj(vk_obj[k])
              for k in ("Qm", "Ql", "Qr", "Qo", "Qc", "S1", "S2", "S3")}
        vk["X_2"] = _g2_from_obj(vk_obj["X_2"])
        k1 = int(vk_obj["k1"])
        k2 = int(vk_obj["k2"])
        power = int(vk_obj["power"])
    except (KeyError, ValueError):
        return False

    for P in pts.values():
        if not hc.g1_is_on_curve(cv, P):
            return False
    if any(not (0 <= e < p) for e in evals.values()):
        return False

    ch = compute_challenges(cv, vk, publics, pts, evals)
    beta, gamma, alpha, xi, u, v = (ch["beta"], ch["gamma"], ch["alpha"],
                                    ch["xi"], ch["u"], ch["v"])

    # Lagrange evaluations L_1..L_max(1,nPublic) at xi
    n = 1 << power
    xin = pow(xi, n, p)
    zh = (xin - 1) % p
    w = 1
    L = [None]
    root = fr.w[power]
    for _ in range(max(1, len(publics))):
        L.append(w * zh % p * pow(n * (xi - w) % p, p - 2, p) % p)
        w = w * root % p

    pi = 0
    for i, x in enumerate(publics):
        pi = (pi - x * L[i + 1]) % p

    # r0
    e3a = (evals["eval_a"] + beta * evals["eval_s1"] + gamma) % p
    e3b = (evals["eval_b"] + beta * evals["eval_s2"] + gamma) % p
    e3c = (evals["eval_c"] + gamma) % p
    e3 = e3a * e3b % p * e3c % p * evals["eval_zw"] % p * alpha % p
    r0 = (pi - L[1] * alpha % p * alpha - e3) % p

    # D
    g1m, g1a, g1s = (lambda P, k: hc.g1_mul(cv, P, k)), \
                    (lambda P, Q: hc.g1_add(cv, P, Q)), \
                    (lambda P, Q: hc.g1_add(cv, P, hc.g1_neg(cv, Q)))
    d1 = g1m(vk["Qm"], evals["eval_a"] * evals["eval_b"] % p)
    d1 = g1a(d1, g1m(vk["Ql"], evals["eval_a"]))
    d1 = g1a(d1, g1m(vk["Qr"], evals["eval_b"]))
    d1 = g1a(d1, g1m(vk["Qo"], evals["eval_c"]))
    d1 = g1a(d1, vk["Qc"])

    betaxi = beta * xi % p
    d2a = ((evals["eval_a"] + betaxi + gamma)
           * (evals["eval_b"] + betaxi * k1 + gamma)
           * (evals["eval_c"] + betaxi * k2 + gamma)) % p * alpha % p
    d2b = L[1] * alpha % p * alpha % p
    d2 = g1m(pts["Z"], (d2a + d2b + u) % p)

    d3a = (evals["eval_a"] + beta * evals["eval_s1"] + gamma) % p
    d3b = (evals["eval_b"] + beta * evals["eval_s2"] + gamma) % p
    d3c = alpha * beta % p * evals["eval_zw"] % p
    d3 = g1m(vk["S3"], d3a * d3b % p * d3c % p)

    d4 = g1a(pts["T1"], g1a(g1m(pts["T2"], xin), g1m(pts["T3"], xin * xin % p)))
    d4 = g1m(d4, zh)

    D = g1s(g1s(g1a(d1, d2), d3), d4)

    F = g1a(D, g1m(pts["A"], v[1]))
    F = g1a(F, g1m(pts["B"], v[2]))
    F = g1a(F, g1m(pts["C"], v[3]))
    F = g1a(F, g1m(vk["S1"], v[4]))
    F = g1a(F, g1m(vk["S2"], v[5]))

    e = ((-r0) % p + v[1] * evals["eval_a"] + v[2] * evals["eval_b"]
         + v[3] * evals["eval_c"] + v[4] * evals["eval_s1"]
         + v[5] * evals["eval_s2"] + u * evals["eval_zw"]) % p
    E = g1m(cv.g1, e)

    A1 = g1a(pts["Wxi"], g1m(pts["Wxiw"], u))
    B1 = g1m(pts["Wxi"], xi)
    s = u * xi % p * fr.w[power] % p
    B1 = g1a(B1, g1m(pts["Wxiw"], s))
    B1 = g1a(B1, F)
    B1 = g1s(B1, E)

    return hc.pairing_eq(cv, [
        (hc.g1_neg(cv, A1), vk["X_2"]),
        (B1, cv.g2),
    ])


# =====================================================================
# Prover
# =====================================================================

def _g1_obj(P):
    if P is None:
        return ["0", "1", "0"]
    return [str(P[0]), str(P[1]), "1"]


def export_verification_key(zk: zkey_fmt.PlonkZkey) -> dict:
    return {
        "protocol": "plonk",
        "curve": zk.curve.name,
        "nPublic": zk.n_public,
        "power": zk.power,
        "k1": str(zk.k1),
        "k2": str(zk.k2),
        "Qm": _g1_obj(zk.qm), "Ql": _g1_obj(zk.ql), "Qr": _g1_obj(zk.qr),
        "Qo": _g1_obj(zk.qo), "Qc": _g1_obj(zk.qc),
        "S1": _g1_obj(zk.s1), "S2": _g1_obj(zk.s2), "S3": _g1_obj(zk.s3),
        "X_2": [[str(zk.x_2[0][0]), str(zk.x_2[0][1])],
                [str(zk.x_2[1][0]), str(zk.x_2[1][1])],
                ["1", "0"]],
        "w": str(zk.curve.fr.w[zk.power]),
    }


def _mulz_tables(fp):
    """Z1/Z2/Z3 correction constants (reference src/mul_z.js:21-47), plain."""
    p = fp.p
    w4 = fp.w[2]  # 4th root of unity
    z1 = [0, (-1 + w4) % p, -2 % p, (-1 - w4) % p]
    z2 = [0, (-2 * w4) % p, 4 % p, (2 * w4) % p]
    z3 = [0, (2 + 2 * w4) % p, -8 % p, (2 - 2 * w4) % p]
    return z1, z2, z3


def prove(zk: zkey_fmt.PlonkZkey, witness: wtns_fmt.Witness, b=None,
          logger=None, mesh=None, msm_c: int = 8, msm_cw: int = 16):
    """Generate a PLONK proof.  b: optional list of 11 blinding ints (tests).

    mesh: optional jax.sharding.Mesh with axis 'd' — shards the nine
    commitment MSMs over SRS points (SURVEY 2.10 axis 1); msm_cw selects
    the fused-MSM window width on the TPU/mesh path."""
    cv = zk.curve
    fr = cv.fr
    p = fr.p
    ctx = fjnp.get_ctx(fr.name)
    n = zk.domain_size
    nl = fr.nl

    if witness.q != p:
        raise ValueError("witness curve does not match proving key")
    if witness.n != zk.n_vars - zk.n_additions:
        raise ValueError("invalid witness length")

    if b is None:
        b = [secrets.randbelow(p) for _ in range(12)]  # b[1..11] used
    bm = [None] + [fops.scalar_arr(ctx, x) for x in b[1:12]]

    # --- witness incl. additions (reference calculateAdditions :174-204) ---
    wit = jnp.asarray(witness.values)
    wit = wit.at[:, 0].set(0)  # first element forced to zero (:96)
    if zk.n_additions:
        ad = zk.additions
        base = jnp.concatenate(
            [wit, jnp.zeros((nl, zk.n_additions + 1), jnp.uint32)], axis=1)
        # additions can reference earlier additions -> sequential scan
        af, bfac = jnp.asarray(ad["af"]), jnp.asarray(ad["bf"])
        ia, ib = jnp.asarray(ad["a"]), jnp.asarray(ad["b"])
        nw = witness.n

        def body(k, buf):
            w1 = buf[:, ia[k]]
            w2 = buf[:, ib[k]]
            r = fjnp.add(ctx,
                         fjnp.mont_mul(ctx, af[:, k], w1),
                         fjnp.mont_mul(ctx, bfac[:, k], w2))
            return buf.at[:, nw + k].set(r)

        base = jax.lax.fori_loop(0, zk.n_additions, body, base)
        full_wit = base[:, :zk.n_vars]
    else:
        full_wit = wit

    publics = fjnp.np_to_ints(fr, np.asarray(full_wit[:, 1:zk.n_public + 1]))

    # --- round 1: wire polynomials -------------------------------------
    if logger:
        logger.debug("Round 1: wire polynomials + commitments")
    a_map = jnp.asarray(zk.a_map)
    b_map = jnp.asarray(zk.b_map)
    c_map = jnp.asarray(zk.c_map)

    def gather_wires(full_wit, amap):
        # signals >= nVars read as zero; map arrays are nConstraints long,
        # pad to domain size with wire 0 (witness[0] == 0)
        vals = full_wit[:, amap]
        pad = n - amap.shape[0]
        if pad:
            vals = jnp.concatenate([vals, jnp.zeros((nl, pad), jnp.uint32)],
                                   axis=1)
        return fjnp.to_mont(ctx, vals)

    buffA = gather_wires(full_wit, a_map)
    buffB = gather_wires(full_wit, b_map)
    buffC = gather_wires(full_wit, c_map)

    polA = nttmod.intt(ctx, buffA)
    polB = nttmod.intt(ctx, buffB)
    polC = nttmod.intt(ctx, buffC)
    evalA = nttmod.extend_evaluations(ctx, polA, 4)
    evalB = nttmod.extend_evaluations(ctx, polB, 4)
    evalC = nttmod.extend_evaluations(ctx, polC, 4)

    def blind2(pol, b_hi, b_lo):
        # blindCoefficients([b_lo_coef...]): appends factors at X^n, X^{n+1}
        # and subtracts at X^0, X^1 (reference polynomial.js:67-91)
        ext = jnp.concatenate([pol, jnp.zeros((nl, 2), jnp.uint32)], axis=1)
        ext = ext.at[:, n].set(fjnp.add(ctx, ext[:, n], b_hi[:, 0]))
        ext = ext.at[:, 0].set(fjnp.sub(ctx, ext[:, 0], b_hi[:, 0]))
        ext = ext.at[:, n + 1].set(fjnp.add(ctx, ext[:, n + 1], b_lo[:, 0]))
        ext = ext.at[:, 1].set(fjnp.sub(ctx, ext[:, 1], b_lo[:, 0]))
        return ext

    polA_b = blind2(polA, bm[2], bm[1])
    polB_b = blind2(polB, bm[4], bm[3])
    polC_b = blind2(polC, bm[6], bm[5])

    fqctx = fjnp.get_ctx(cv.fq.name)
    g1m = msm_mod.MSMContext(fqctx, cv.fq, extension=1)

    # every commitment is padded to ONE length (the longest, T3's n+6) so a
    # single MSM program serves all nine, and the SRS prefix uploads to the
    # device once per zkey (mirrors groth16.py's _dev_points caching; the
    # per-commitment re-slice/re-upload + from-Montgomery host round trip
    # was the r4 transfer bug, VERDICT weak 4)
    M = min(n + 6, zk.ptau[2].shape[0])
    if getattr(zk, "_dev_ptau_m", None) != M:
        ptx, pty, ptinf = zk.ptau
        object.__setattr__(zk, "_dev_ptau", (
            jnp.asarray(ptx[:, :M]), jnp.asarray(pty[:, :M]),
            jnp.asarray(ptinf[:M])))
        object.__setattr__(zk, "_dev_ptau_m", M)
    dptx, dpty, dptinf = zk._dev_ptau
    mk = dict(c=msm_c, nbits=fr.n8 * 8, mesh=mesh, cw=msm_cw)

    def commit(coefs, label=""):
        m = coefs.shape[1]
        assert m <= M, f"commitment degree {m} exceeds SRS length {M}"
        scal = fjnp.from_mont(ctx, coefs)           # stays on device
        if m < M:
            scal = jnp.concatenate(
                [scal, jnp.zeros((nl, M - m), jnp.uint32)], axis=1)
        res = g1m.run(dptx, dpty, dptinf, scal, **mk)
        return msm_mod.host_jac_to_affine(cv.fq, res, 1)

    commitA = commit(polA_b)
    commitB = commit(polB_b)
    commitC = commit(polC_b)

    # --- round 2: permutation grand product ----------------------------
    if logger:
        logger.debug("Round 2: permutation grand product Z")
    vk_pts = {"Qm": zk.qm, "Ql": zk.ql, "Qr": zk.qr, "Qo": zk.qo, "Qc": zk.qc,
              "S1": zk.s1, "S2": zk.s2, "S3": zk.s3}
    t = Transcript(cv)
    for key in ("Qm", "Ql", "Qr", "Qo", "Qc", "S1", "S2", "S3"):
        t.add_poly(vk_pts[key])
    for w in publics:
        t.add_scalar(w)
    t.add_poly(commitA)
    t.add_poly(commitB)
    t.add_poly(commitC)
    beta = t.challenge()
    t.reset()
    t.add_scalar(beta)
    gamma = t.challenge()

    sig1c = jnp.asarray(zk.sigma1_p4[0])
    sig2c = jnp.asarray(zk.sigma2_p4[0])
    sig3c = jnp.asarray(zk.sigma3_p4[0])
    sig1e = jnp.asarray(zk.sigma1_p4[1])
    sig2e = jnp.asarray(zk.sigma2_p4[1])
    sig3e = jnp.asarray(zk.sigma3_p4[1])

    beta_m = fops.scalar_arr(ctx, beta)
    gamma_m = fops.scalar_arr(ctx, gamma)
    k1_m = fops.scalar_arr(ctx, zk.k1)
    k2_m = fops.scalar_arr(ctx, zk.k2)
    wpow = fops.powers_of(ctx, fops.scalar_arr(ctx, fr.w[zk.power]), n)

    betaw = fjnp.mont_mul(ctx, beta_m, wpow)
    num = fjnp.add(ctx, fjnp.add(ctx, buffA, betaw), gamma_m)
    num = fjnp.mont_mul(ctx, num, fjnp.add(ctx, fjnp.add(
        ctx, buffB, fjnp.mont_mul(ctx, k1_m, betaw)), gamma_m))
    num = fjnp.mont_mul(ctx, num, fjnp.add(ctx, fjnp.add(
        ctx, buffC, fjnp.mont_mul(ctx, k2_m, betaw)), gamma_m))

    den = fjnp.add(ctx, fjnp.add(
        ctx, buffA, fjnp.mont_mul(ctx, sig1e[:, ::4], beta_m)), gamma_m)
    den = fjnp.mont_mul(ctx, den, fjnp.add(ctx, fjnp.add(
        ctx, buffB, fjnp.mont_mul(ctx, sig2e[:, ::4], beta_m)), gamma_m))
    den = fjnp.mont_mul(ctx, den, fjnp.add(ctx, fjnp.add(
        ctx, buffC, fjnp.mont_mul(ctx, sig3e[:, ::4], beta_m)), gamma_m))

    ratio = fjnp.mont_mul(ctx, num, fjnp.batch_inverse(ctx, den, axis=1))
    zprod = jax.lax.associative_scan(
        lambda a, bb: fjnp.mont_mul(ctx, a, bb), ratio, axis=1)
    buffZ = jnp.concatenate([ctx.one((1,)), zprod[:, :-1]], axis=1)
    # copy-constraint check: full product must be 1 (reference :434-436)
    total = np.asarray(fjnp.from_mont(ctx, zprod[:, -1:]))
    if fjnp.np_to_ints(fr, total)[0] != 1:
        raise RuntimeError("Copy constraints do not match")

    polZ = nttmod.intt(ctx, buffZ)
    evalZ = nttmod.extend_evaluations(ctx, polZ, 4)

    def blind3(pol, b7, b8, b9):
        ext = jnp.concatenate([pol, jnp.zeros((nl, 3), jnp.uint32)], axis=1)
        for i, bb in enumerate((b9, b8, b7)):
            ext = ext.at[:, n + i].set(fjnp.add(ctx, ext[:, n + i], bb[:, 0]))
            ext = ext.at[:, i].set(fjnp.sub(ctx, ext[:, i], bb[:, 0]))
        return ext

    polZ_b = blind3(polZ, bm[7], bm[8], bm[9])
    commitZ = commit(polZ_b)

    # --- round 3: quotient ---------------------------------------------
    if logger:
        logger.debug("Round 3: quotient T1/T2/T3")
    t.reset()
    t.add_scalar(beta)
    t.add_scalar(gamma)
    t.add_poly(commitZ)
    alpha = t.challenge()
    alpha_m = fops.scalar_arr(ctx, alpha)
    alpha2_m = fops.scalar_arr(ctx, alpha * alpha % p)

    qle = jnp.asarray(zk.ql_p4[1])
    qre = jnp.asarray(zk.qr_p4[1])
    qme = jnp.asarray(zk.qm_p4[1])
    qoe = jnp.asarray(zk.qo_p4[1])
    qce = jnp.asarray(zk.qc_p4[1])

    n4 = 4 * n
    w4pow = fops.powers_of(ctx, fops.scalar_arr(ctx, fr.w[zk.power + 2]), n4)
    zw4 = jnp.roll(evalZ, -4, axis=1)

    # Lagrange evaluations blocks: zk.lagrange is nPublic x (n + 4n)
    lag_all = jnp.asarray(zk.lagrange)
    lag4 = [lag_all[:, i * 5 * n + n:(i + 1) * 5 * n] for i in range(zk.n_public)]
    lag1_4n = (lag4[0] if zk.n_public > 0
               else nttmod.extend_evaluations(
                   ctx, nttmod.intt(ctx, jnp.concatenate(
                       [ctx.one((1,)), jnp.zeros((nl, n - 1), jnp.uint32)],
                       axis=1)), 4))

    ap = fjnp.add(ctx, bm[2], fjnp.mont_mul(ctx, bm[1], w4pow))
    bp = fjnp.add(ctx, bm[4], fjnp.mont_mul(ctx, bm[3], w4pow))
    cp = fjnp.add(ctx, bm[6], fjnp.mont_mul(ctx, bm[5], w4pow))
    w2 = fjnp.mont_mul(ctx, w4pow, w4pow)
    zp = fjnp.add(ctx, fjnp.add(ctx, fjnp.mont_mul(ctx, bm[7], w2),
                                fjnp.mont_mul(ctx, bm[8], w4pow)), bm[9])
    wW = fjnp.mont_mul(ctx, w4pow, fops.scalar_arr(ctx, fr.w[zk.power]))
    wW2 = fjnp.mont_mul(ctx, wW, wW)
    zWp = fjnp.add(ctx, fjnp.add(ctx, fjnp.mont_mul(ctx, bm[7], wW2),
                                 fjnp.mont_mul(ctx, bm[8], wW)), bm[9])

    z1t, z2t, z3t = _mulz_tables(fr)
    tile = lambda tab: jnp.asarray(
        fjnp.np_from_ints(fr, [fr.to_mont(x) for x in tab]))[:, jnp.tile(
            jnp.arange(4), n)]
    Z1 = tile(z1t)
    Z2 = tile(z2t)
    Z3 = tile(z3t)

    mul = lambda a, bb: fjnp.mont_mul(ctx, a, bb)
    add = lambda a, bb: fjnp.add(ctx, a, bb)
    sub = lambda a, bb: fjnp.sub(ctx, a, bb)

    def mulz2(a, bb, apx, bpx):
        a_b = mul(a, bb)
        a0 = add(mul(a, bpx), mul(apx, bb))
        a1 = mul(apx, bpx)
        rz = add(a0, mul(Z1, a1))
        return a_b, rz

    def mulz4(a, bb, c, d, apx, bpx, cpx, dpx):
        a_b = mul(a, bb)
        a_bp = mul(a, bpx)
        ap_b = mul(apx, bb)
        ap_bp = mul(apx, bpx)
        c_d = mul(c, d)
        c_dp = mul(c, dpx)
        cp_d = mul(cpx, d)
        cp_dp = mul(cpx, dpx)
        r = mul(a_b, c_d)
        a0 = add(add(mul(ap_b, c_d), mul(a_bp, c_d)),
                 add(mul(a_b, cp_d), mul(a_b, c_dp)))
        a1 = add(add(add(mul(ap_bp, c_d), mul(ap_b, cp_d)),
                     add(mul(ap_b, c_dp), mul(a_bp, cp_d))),
                 add(mul(a_bp, c_dp), mul(a_b, cp_dp)))
        a2 = add(add(mul(a_bp, cp_dp), mul(ap_b, cp_dp)),
                 add(mul(ap_bp, c_dp), mul(ap_bp, cp_d)))
        a3 = mul(ap_bp, cp_dp)
        rz = add(add(a0, mul(Z1, a1)), add(mul(Z2, a2), mul(Z3, a3)))
        return r, rz

    # PI evaluations over 4n
    pi4 = None
    for j in range(zk.n_public):
        aval = fops.scalar_arr(ctx, 0)
        aval = buffA[:, j:j + 1]
        term = fjnp.mont_mul(ctx, lag4[j], aval)
        pi4 = fjnp.neg(ctx, term) if pi4 is None else fjnp.sub(ctx, pi4, term)
    if pi4 is None:
        pi4 = jnp.zeros((nl, n4), jnp.uint32)

    e1, e1z = mulz2(evalA, evalB, ap, bp)
    e1 = mul(e1, qme)
    e1z = mul(e1z, qme)
    e1 = add(e1, mul(evalA, qle))
    e1z = add(e1z, mul(ap, qle))
    e1 = add(e1, mul(evalB, qre))
    e1z = add(e1z, mul(bp, qre))
    e1 = add(e1, mul(evalC, qoe))
    e1z = add(e1z, mul(cp, qoe))
    e1 = add(e1, pi4)
    e1 = add(e1, qce)

    betaw4 = mul(beta_m, w4pow)
    e2a = add(add(evalA, betaw4), gamma_m)
    e2b = add(add(evalB, mul(betaw4, k1_m)), gamma_m)
    e2c = add(add(evalC, mul(betaw4, k2_m)), gamma_m)
    e2, e2z = mulz4(e2a, e2b, e2c, evalZ, ap, bp, cp, zp)
    e2 = mul(e2, alpha_m)
    e2z = mul(e2z, alpha_m)

    e3a = add(add(evalA, mul(beta_m, sig1e)), gamma_m)
    e3b = add(add(evalB, mul(beta_m, sig2e)), gamma_m)
    e3c = add(add(evalC, mul(beta_m, sig3e)), gamma_m)
    e3, e3z = mulz4(e3a, e3b, e3c, zw4, ap, bp, cp, zWp)
    e3 = mul(e3, alpha_m)
    e3z = mul(e3z, alpha_m)

    e4 = mul(mul(sub(evalZ, ctx.one((1,))), lag1_4n), alpha2_m)
    e4z = mul(mul(zp, lag1_4n), alpha2_m)

    tEv = add(sub(add(e1, e2), e3), e4)
    tzEv = add(sub(add(e1z, e2z), e3z), e4z)

    polT = nttmod.intt(ctx, tEv)
    polT = fops.div_zh(ctx, polT, n)
    polTz = nttmod.intt(ctx, tzEv)
    polT = fjnp.add(ctx, polT, polTz)

    # split T into T1 (n+1), T2 (n+1), T3 (n+6) with b10/b11 tweaks
    T1 = jnp.concatenate([polT[:, :n], jnp.zeros((nl, 1), jnp.uint32)], axis=1)
    T1 = T1.at[:, n].set(bm[10][:, 0])
    T2 = jnp.concatenate([polT[:, n:2 * n], jnp.zeros((nl, 1), jnp.uint32)],
                         axis=1)
    T2 = T2.at[:, 0].set(fjnp.sub(ctx, T2[:, 0], bm[10][:, 0]))
    T2 = T2.at[:, n].set(bm[11][:, 0])
    T3 = fops.pad_to(polT[:, 2 * n:], n + 6)
    T3 = T3.at[:, 0].set(fjnp.sub(ctx, T3[:, 0], bm[11][:, 0]))

    commitT1 = commit(T1)
    commitT2 = commit(T2)
    commitT3 = commit(T3)

    # --- round 4: evaluations ------------------------------------------
    if logger:
        logger.debug("Round 4: evaluations")
    t.reset()
    t.add_scalar(alpha)
    t.add_poly(commitT1)
    t.add_poly(commitT2)
    t.add_poly(commitT3)
    xi = t.challenge()
    xiw = xi * fr.w[zk.power] % p

    eval_a = fops.poly_eval(ctx, polA_b, xi)
    eval_b = fops.poly_eval(ctx, polB_b, xi)
    eval_c = fops.poly_eval(ctx, polC_b, xi)
    eval_s1 = fops.poly_eval(ctx, sig1c, xi)
    eval_s2 = fops.poly_eval(ctx, sig2c, xi)
    eval_zw = fops.poly_eval(ctx, polZ_b, xiw)

    # --- round 5: linearisation + openings ------------------------------
    if logger:
        logger.debug("Round 5: linearisation + openings")
    t.reset()
    t.add_scalar(xi)
    for e in (eval_a, eval_b, eval_c, eval_s1, eval_s2, eval_zw):
        t.add_scalar(e)
    v1 = t.challenge()
    v = [None, v1]
    for i in range(2, 6):
        v.append(v[i - 1] * v1 % p)

    xin = pow(xi, n, p)
    zh = (xin - 1) % p
    eval_l1 = (xin - 1) * pow(n * (xi - 1) % p, p - 2, p) % p

    L = [None]
    wv = 1
    for i in range(1, max(1, zk.n_public) + 1):
        L.append(wv * zh % p * pow(n * (xi - wv) % p, p - 2, p) % p)
        wv = wv * fr.w[zk.power] % p
    eval_pi = 0
    for i, x in enumerate(publics):
        eval_pi = (eval_pi - x * L[i + 1]) % p

    coef_ab = eval_a * eval_b % p
    betaxi = beta * xi % p
    e2v = ((eval_a + betaxi + gamma) * (eval_b + betaxi * zk.k1 + gamma)
           * (eval_c + betaxi * zk.k2 + gamma)) % p * alpha % p
    e3v = ((eval_a + beta * eval_s1 + gamma)
           * (eval_b + beta * eval_s2 + gamma)) % p * eval_zw % p * alpha % p
    e4v = eval_l1 * alpha % p * alpha % p

    qlc = jnp.asarray(zk.ql_p4[0])
    qrc = jnp.asarray(zk.qr_p4[0])
    qmc = jnp.asarray(zk.qm_p4[0])
    qoc = jnp.asarray(zk.qo_p4[0])
    qcc = jnp.asarray(zk.qc_p4[0])

    lenR = n + 6
    R = fops.add_many(ctx, [
        (qmc, fops.scalar_arr(ctx, coef_ab)),
        (qlc, fops.scalar_arr(ctx, eval_a)),
        (qrc, fops.scalar_arr(ctx, eval_b)),
        (qoc, fops.scalar_arr(ctx, eval_c)),
        (qcc, None),
        (polZ_b, fops.scalar_arr(ctx, (e2v + e4v) % p)),
    ], lenR)
    R = fjnp.sub(ctx, R, fjnp.mont_mul(
        ctx, fops.pad_to(sig3c, lenR),
        fops.scalar_arr(ctx, e3v * beta % p)))
    tmp = fops.add_many(ctx, [
        (T3, fops.scalar_arr(ctx, xin * xin % p)),
        (T2, fops.scalar_arr(ctx, xin)),
        (T1, None),
    ], lenR)
    R = fjnp.sub(ctx, R, fjnp.mont_mul(ctx, tmp, fops.scalar_arr(ctx, zh)))
    r0 = (eval_pi - e3v * (eval_c + gamma) - e4v) % p
    R = R.at[:, 0].set(fjnp.add(ctx, R[:, 0],
                                fops.scalar_arr(ctx, r0)[:, 0]))

    Wxi = fops.add_many(ctx, [
        (R, None),
        (polA_b, fops.scalar_arr(ctx, v[1])),
        (polB_b, fops.scalar_arr(ctx, v[2])),
        (polC_b, fops.scalar_arr(ctx, v[3])),
        (fops.pad_to(sig1c, lenR), fops.scalar_arr(ctx, v[4])),
        (fops.pad_to(sig2c, lenR), fops.scalar_arr(ctx, v[5])),
    ], lenR)
    sub_const = (v[1] * eval_a + v[2] * eval_b + v[3] * eval_c
                 + v[4] * eval_s1 + v[5] * eval_s2) % p
    Wxi = Wxi.at[:, 0].set(fjnp.sub(ctx, Wxi[:, 0],
                                    fops.scalar_arr(ctx, sub_const)[:, 0]))
    Wxi_q, rem = fops.div_by_x_minus(ctx, Wxi, fops.scalar_arr(ctx, xi))
    if fjnp.np_to_ints(fr, np.asarray(rem))[0] != 0:
        raise RuntimeError("Wxi polynomial is not divisible")

    Wxiw = fops.pad_to(polZ_b, n + 3)
    Wxiw = Wxiw.at[:, 0].set(
        fjnp.sub(ctx, Wxiw[:, 0], fops.scalar_arr(ctx, eval_zw)[:, 0]))
    Wxiw_q, rem2 = fops.div_by_x_minus(ctx, Wxiw, fops.scalar_arr(ctx, xiw))
    if fjnp.np_to_ints(fr, np.asarray(rem2))[0] != 0:
        raise RuntimeError("Wxiw polynomial is not divisible")

    commitWxi = commit(Wxi_q)
    commitWxiw = commit(Wxiw_q)

    proof = {
        "A": _g1_obj(commitA), "B": _g1_obj(commitB), "C": _g1_obj(commitC),
        "Z": _g1_obj(commitZ),
        "T1": _g1_obj(commitT1), "T2": _g1_obj(commitT2),
        "T3": _g1_obj(commitT3),
        "Wxi": _g1_obj(commitWxi), "Wxiw": _g1_obj(commitWxiw),
        "eval_a": str(eval_a), "eval_b": str(eval_b), "eval_c": str(eval_c),
        "eval_zw": str(eval_zw), "eval_s1": str(eval_s1),
        "eval_s2": str(eval_s2),
        "protocol": "plonk", "curve": cv.name,
    }
    return proof, [str(x) for x in publics]


def prove_files(zkey_path: str, wtns_path: str, **kw):
    zk = zkey_fmt.read_plonk_zkey(zkey_path)
    witness = wtns_fmt.read_wtns(wtns_path)
    return prove(zk, witness, **kw)


def export_solidity_calldata(proof: dict, publics) -> str:
    """reference src/plonk_exportsoliditycalldata.js:35-65."""
    def p256(n):
        return '"0x' + format(int(n), "064x") + '"'

    parts = []
    for key in ("A", "B", "C", "Z", "T1", "T2", "T3", "Wxi", "Wxiw"):
        parts += [p256(proof[key][0]), p256(proof[key][1])]
    for key in ("eval_a", "eval_b", "eval_c", "eval_s1", "eval_s2",
                "eval_zw"):
        parts.append(p256(proof[key]))
    inputs = ",".join(p256(x) for x in publics)
    return "[" + ",".join(parts) + "]" + f"[{inputs}]"
