"""FFLONK circuit-specific setup (reference src/fflonk_setup.js).

Shares the r1cs -> plonkish lowering with the PLONK setup (the reference
factored it into src/r1cs_constraint_processor.js; gate column order is
[a, b, c, ql, qr, qm, qo, qc] — same values as PLONK's
[sl, sr, so, qm, ql, qr, qo, qc] relabelled).  Differences from PLONK:

  * cirPower covers nConstraints + 2 blinding rows, min power 3
    (FF_T_POL_DEG_MIN, fflonk_setup.js:124).
  * sigma: rows in [nConstraints, n-2) use wire 0; the LAST TWO rows carry
    identity values outside every permutation cycle (fflonk_setup.js:345-358).
  * the zkey embeds the monomial SRS (9n+18 G1 points from ptau section 2)
    and the combined commitment C0 of the 8 preprocessed polynomials,
    interleaved with degree stride 8 (cpolynomial.js:53-73).
"""

from __future__ import annotations

import numpy as np

from ..curves import host_curve as hc
from ..fields import fjnp
from ..formats import points as pcodec
from ..formats import zkey as zkey_fmt
from ..formats.binfile import BinFileWriter, SectionWriter
from ..formats.r1cs import R1cs
from ..ntt import ntt as nttmod
from .plonk_setup import K1, K2, process_constraints, _p4_blocks
from .groth16_setup import _points_from_scalars


# w3 generator and the hardcoded cubic root of w[28] (fflonk_setup.js:510-537)
_W3_GEN = 31624
_ORDER_R_SUB1_BN254 = 3648040478639879203707734290876212514758060733402672390616367364429301415936
_WR_ROOT_BN254 = 467799165886069610036046866799264026481344299079011762026774533774345988080


def fflonk_roots(fr, power: int):
    """(w3, w4, w8, wr) for the given circuit power (bn254 constants,
    fflonk_setup.js:510-537)."""
    p = fr.p
    w3 = pow(_W3_GEN, _ORDER_R_SUB1_BN254 // 3, p)
    w4 = fr.w[2]
    w8 = fr.w[3]
    wr = pow(_WR_ROOT_BN254, 1 << (28 - power), p)
    return w3, w4, w8, wr


def _build_sigma_fflonk(fr, con, domain):
    """Sigma slot values with the 2-row identity tail (fflonk variant)."""
    p = fr.p
    n = domain
    k = n.bit_length() - 1
    w = fr.w[k]

    ws = np.empty(n, dtype=object)
    wi = 1
    for i in range(n):
        ws[i] = wi
        wi = wi * w % p
    val_at = np.concatenate([ws, [x * K1 % p for x in ws],
                             [x * K2 % p for x in ws]])

    n_vis = n - 2  # rows participating in the permutation
    vid = np.zeros(3 * n_vis, dtype=np.int64)
    for i in range(min(len(con), n_vis)):
        vid[3 * i + 0] = con[i][0]
        vid[3 * i + 1] = con[i][1]
        vid[3 * i + 2] = con[i][2]
    q = np.arange(3 * n_vis)
    pos = (q % 3) * n + q // 3

    order = np.argsort(vid, kind="stable")
    sv = vid[order]
    starts = np.flatnonzero(np.r_[True, sv[1:] != sv[:-1]])
    ends = np.r_[starts[1:], len(sv)] - 1
    src = np.arange(len(sv)) - 1
    src[starts] = ends
    sigma = np.empty(3 * n, dtype=object)
    sigma[pos[order]] = val_at[pos[order[src]]]
    # identity tail rows
    for i in (n - 2, n - 1):
        sigma[i] = val_at[i]
        sigma[n + i] = val_at[n + i]
        sigma[2 * n + i] = val_at[2 * n + i]
    return sigma


def combine_polys(frctx, polys, m: int):
    """CPolynomial.getPolynomial: C(X) = sum_i X^i P_i(X^m) by coefficient
    interleaving (reference src/polynomial/cpolynomial.js:53-73).  Inputs may
    have different lengths; each is zero-padded to the longest one (trailing
    zero coefficients are commitment/evaluation-neutral)."""
    import jax.numpy as jnp

    n = max(P.shape[1] for P in polys if P is not None)
    full = []
    for P in polys:
        if P is None:
            full.append(jnp.zeros((frctx.nl, n), jnp.uint32))
        else:
            P = jnp.asarray(P)
            pad = n - P.shape[1]
            if pad:
                P = jnp.concatenate(
                    [P, jnp.zeros((frctx.nl, pad), jnp.uint32)], axis=1)
            full.append(P)
    while len(full) < m:
        full.append(jnp.zeros((frctx.nl, n), jnp.uint32))
    stacked = jnp.stack(full, axis=2)      # (NL, n, m)
    return stacked.reshape(frctx.nl, n * m)


def setup_from_srs(r1cs: R1cs, srs_lem: bytes, x_2, logger=None) -> bytes:
    """fflonk zkey bytes from a monomial G1 SRS (LEM, >= 9n+18 points) and
    X_2 = tau*G2 (reference fflonk_setup.js writeZkeyFile)."""
    from ..curves.host_curve import BLS12_381, BN254
    from ..curves import msm as msm_mod

    cv = BN254 if r1cs.prime == BN254.fr.p else BLS12_381
    if r1cs.prime != cv.fr.p:
        raise ValueError("unknown curve for r1cs prime")
    if cv is not BN254:
        raise NotImplementedError("fflonk root constants are bn254-only "
                                  "(as in the reference)")
    fr, fq = cv.fr, cv.fq
    p = fr.p
    frctx = fjnp.get_ctx(fr.name)
    n_public = r1cs.n_public

    con, adds, n_vars = process_constraints(fr, r1cs)
    cir_power = max(3, (len(con) + 1).bit_length())
    domain = 1 << cir_power
    n_srs = domain * 9 + 18
    if len(srs_lem) < n_srs * 2 * fq.n8:
        raise ValueError("Powers of Tau is not big enough for this circuit "
                         "size. Section 2 too small.")
    srs_lem = srs_lem[:n_srs * 2 * fq.n8]

    w3, w4, w8, wr = fflonk_roots(fr, cir_power)

    w = BinFileWriter("zkey", 1)
    s1 = SectionWriter()
    s1.u32(zkey_fmt.FFLONK_PROTOCOL_ID)
    w.add_section(1, s1.tobytes())

    # additions (sec 3)
    sa = SectionWriter()
    for a, b, afv, bfv in adds:
        sa.u32(a)
        sa.u32(b)
        sa.big(fr.to_mont(afv), fr.n8)
        sa.big(fr.to_mont(bfv), fr.n8)
    w.add_section(zkey_fmt.FF_ADDITIONS, sa.tobytes())

    # witness maps (secs 4-6)
    for col in range(3):
        sm = SectionWriter()
        for g in con:
            sm.u32(g[col])
        w.add_section(zkey_fmt.FF_A_MAP + col, sm.tobytes())

    # Q polynomials (secs 7-11): fflonk order QL, QR, QM, QO, QC;
    # gate columns in `con` are [a,b,c, qm, ql, qr, qo, qc]
    polys = {}
    q_sections = [("QL", 4, zkey_fmt.FF_QL), ("QR", 5, zkey_fmt.FF_QR),
                  ("QM", 3, zkey_fmt.FF_QM), ("QO", 6, zkey_fmt.FF_QO),
                  ("QC", 7, zkey_fmt.FF_QC)]
    for name, col, sec in q_sections:
        plain = [g[col] % p for g in con]
        mont = fjnp.np_from_ints(fr, [fr.to_mont(v) for v in plain])
        cb, eb, coefs = _p4_blocks(fr, frctx, mont, domain)
        w.add_section(sec, cb + eb)
        polys[name] = coefs

    # sigma (secs 12-14)
    sigma = _build_sigma_fflonk(fr, con, domain)
    for blk in range(3):
        vals = sigma[blk * domain:(blk + 1) * domain]
        mont = fjnp.np_from_ints(fr, [fr.to_mont(int(v)) for v in vals])
        cb, eb, coefs = _p4_blocks(fr, frctx, mont, domain)
        w.add_section(zkey_fmt.FF_SIGMA1 + blk, cb + eb)
        polys[f"S{blk + 1}"] = coefs

    # Lagrange (sec 15)
    lag_payload = b""
    for i in range(max(n_public, 1)):
        mont = np.zeros((fr.nl, domain), dtype=np.uint32)
        mont[:, i:i + 1] = fjnp.np_from_ints(fr, [fr.to_mont(1)])
        cb, eb, _ = _p4_blocks(fr, frctx, mont, domain)
        lag_payload += cb + eb
    w.add_section(zkey_fmt.FF_LAGRANGE, lag_payload)

    # PTau (sec 16)
    w.add_section(zkey_fmt.FF_PTAU, srs_lem)

    # C0 (sec 17): interleave QL,QR,QO,QM,QC,S1,S2,S3 with stride 8
    import jax.numpy as jnp

    c0_coefs = combine_polys(frctx, [
        jnp.asarray(polys["QL"]), jnp.asarray(polys["QR"]),
        jnp.asarray(polys["QO"]), jnp.asarray(polys["QM"]),
        jnp.asarray(polys["QC"]), jnp.asarray(polys["S1"]),
        jnp.asarray(polys["S2"]), jnp.asarray(polys["S3"])], 8)
    c0_np = np.asarray(c0_coefs)
    w.add_section(zkey_fmt.FF_C0, pcodec.frs_to_bytes(fr, c0_np))

    # C0 commitment over the SRS
    fqctx = fjnp.get_ctx(fq.name)
    g1m = msm_mod.MSMContext(fqctx, fq, extension=1)
    px, py, pinf = pcodec.g1_lem_from_bytes(fq, srs_lem, 8 * domain)
    scal = np.asarray(fjnp.from_mont(frctx, jnp.asarray(c0_np)))
    res = g1m.run(jnp.asarray(px), jnp.asarray(py), jnp.asarray(pinf),
                  jnp.asarray(scal), c=8, nbits=fr.n8 * 8)
    commit_c0 = msm_mod.host_jac_to_affine(fq, res, 1)

    # header (sec 2)
    h = SectionWriter()
    h.u32(fq.n8)
    h.big(fq.p, fq.n8)
    h.u32(fr.n8)
    h.big(fr.p, fr.n8)
    h.u32(n_vars)
    h.u32(n_public)
    h.u32(domain)
    h.u32(len(adds))
    h.u32(len(con))
    for v in (K1, K2, w3, w4, w8, wr):
        h.big(fr.to_mont(v), fr.n8)
    h.raw(pcodec.g2_lem_from_ints(fq, [x_2]))
    h.raw(pcodec.g1_lem_from_ints(fq, [commit_c0]))
    w.add_section(zkey_fmt.FF_HEADER, h.tobytes())

    return w.tobytes()


def setup_from_ptau(r1cs: R1cs, ptau, logger=None) -> bytes:
    """`fflonk setup` from a prepared .ptau (reference fflonk_setup.js:36)."""
    if 12 not in ptau.sections:
        raise ValueError("Powers of Tau is not well prepared. "
                         "Section 12 missing.")
    fq = ptau.curve.fq
    x_2 = pcodec.g2_lem_to_ints(
        fq, ptau.sections[3][4 * fq.n8:8 * fq.n8], 1)[0]
    return setup_from_srs(r1cs, ptau.sections[2], x_2, logger=logger)


def setup_from_secrets(r1cs: R1cs, tau: int, logger=None) -> bytes:
    """Test path: synthesize the SRS from a secret tau directly."""
    from ..curves.host_curve import BN254

    cv = BN254
    fr, fq = cv.fr, cv.fq
    con, _, _ = process_constraints(fr, r1cs)
    cir_power = max(3, (len(con) + 1).bit_length())
    n_srs = (1 << cir_power) * 9 + 18
    taui, t = [], 1
    for _ in range(n_srs):
        taui.append(t)
        t = t * tau % fr.p
    pts = _points_from_scalars(cv, taui)
    srs_lem = pcodec.g1_lem_to_bytes(fq, *pts)
    return setup_from_srs(r1cs, srs_lem, hc.g2_mul(cv, cv.g2, tau),
                          logger=logger)
