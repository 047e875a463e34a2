"""Groth16 prover / verifier (reference src/groth16_prove.js, _verify.js).

Prover pipeline (TPU-first redesign of reference src/groth16_prove.js:28-144):

  1. buildABC — the reference's serial JS scatter loop (:147-186) becomes a
     vectorized gather + Montgomery multiply + `segment_sum` over constraint
     ids (conflict-free: limb-wise uint32 sums of <=2^16 terms cannot
     overflow, followed by one wide reduction).
  2. QAP: intt -> coset shift (w[power+1] / Fr.shift, :64-67) -> ntt for each
     of A, B, C; P_odd = A_odd*B_odd - C_odd, converted to plain form
     (:320-357 joinABC semantics).
  3. Five MSMs (A, B1, B2, C, H) on the Pippenger engine (:85-101).
  4. Blinding r,s adjustments on host bigints (O(1) point ops, :103-120).

The device part is one jitted program per (domain, nVars) shape; MSMs are
jitted per shape as well.
"""

from __future__ import annotations

import functools
import json
import secrets

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import host_curve as hc
from ..curves import msm as msm_mod
from ..fields import fjnp
from ..formats import zkey as zkey_fmt
from ..formats import wtns as wtns_fmt
from ..ntt import ntt as nttmod


def _fr_ctx(cv):
    return fjnp.get_ctx(cv.fr.name)


def _fq_ctx(cv):
    return fjnp.get_ctx(cv.fq.name)


def reduce_wide(ctx, limbs, carry):
    """(carry * R + limbs) mod p for limbs < R, carry < 2^16 (as (B,) u32)."""
    lo_mod = fjnp.from_mont(ctx, fjnp.to_mont(ctx, limbs))
    carry_elem = jnp.zeros_like(limbs).at[0].set(carry)
    hi_mod = fjnp.to_mont(ctx, carry_elem)  # carry * R mod p
    return fjnp.add(ctx, hi_mod, lo_mod)


def _segment_field_sum(ctx, values, ids, num_segments):
    """Sum Montgomery field elements by segment id; conflict-free.

    values: (NL, N); ids: (N,) int32 in [0, num_segments] (== num_segments
    drops the entry).  Limb-wise uint32 sums stay exact for < 2^16 terms per
    segment, then one wide reduction maps back to [0, p).
    """
    sums = jax.ops.segment_sum(values.T, ids, num_segments=num_segments + 1)
    sums = sums[:num_segments].T  # (NL, num_segments)
    limbs, carry = fjnp._carry_prop(sums)
    return reduce_wide(ctx, limbs, carry)


@functools.lru_cache(maxsize=None)
def _qap_fn_cache():
    return {}


def _get_qap_fn(ctx, domain_size, n_coefs, n_vars, mesh=None):
    cache = _qap_fn_cache()
    key = (id(ctx), domain_size, n_coefs, n_vars, id(mesh))
    if key not in cache:
        fp = ctx.fp
        k = domain_size.bit_length() - 1
        inc = fp.w[k + 1] if k < fp.s else fp.shift

        @jax.jit
        def fn(coef_val, coef_m, coef_c, coef_s, witness):
            w_s = witness[:, coef_s]
            prod = fjnp.mont_mul(ctx, coef_val, w_s)  # Montgomery(coef * w)
            ids_a = jnp.where(coef_m == 0, coef_c, domain_size)
            ids_b = jnp.where(coef_m == 1, coef_c, domain_size)
            A_T = _segment_field_sum(ctx, prod, ids_a, domain_size)
            B_T = _segment_field_sum(ctx, prod, ids_b, domain_size)
            C_T = fjnp.mont_mul(ctx, A_T, B_T)

            def odd_evals(X):
                if mesh is not None:
                    from ..parallel import sharded

                    coeffs = sharded.ntt_sharded(mesh, ctx, X, inverse=True)
                    shifted = nttmod.apply_powers(ctx, coeffs, 1, inc)
                    return sharded.ntt_sharded(mesh, ctx, shifted)
                coeffs = nttmod.intt(ctx, X)
                shifted = nttmod.apply_powers(ctx, coeffs, 1, inc)
                return nttmod.ntt(ctx, shifted)

            Ao, Bo, Co = odd_evals(A_T), odd_evals(B_T), odd_evals(C_T)
            P = fjnp.sub(ctx, fjnp.mont_mul(ctx, Ao, Bo), Co)
            return fjnp.from_mont(ctx, P)  # plain-form scalars for the H MSM

        cache[key] = fn
    return cache[key]


def prove(zkey: zkey_fmt.Groth16Zkey, witness: wtns_fmt.Witness,
          r: int | None = None, s: int | None = None, msm_c: int = 8,
          mesh=None, msm_cw: int = 16, logger=None):
    """Groth16 prover (reference src/groth16_prove.js:28-144).

    mesh: optional jax.sharding.Mesh with axis 'd' — shards the five MSMs
    over points and the six QAP NTTs four-step across chips (SURVEY 2.10).
    msm_cw: Pippenger window width for the fused TPU MSM (16 = production).
    """
    cv = zkey.curve
    fr, fq = cv.fr, cv.fq
    if witness.q != fr.p:
        raise ValueError("witness curve does not match proving key")
    if witness.n != zkey.n_vars:
        raise ValueError(
            f"invalid witness length. Circuit: {zkey.n_vars}, witness: {witness.n}")

    def _log(msg):
        if logger:
            logger.debug(msg)

    ctx = _fr_ctx(cv)
    co = zkey.coeffs
    qap = _get_qap_fn(ctx, zkey.domain_size, len(co["m"]), zkey.n_vars,
                      mesh=mesh)
    _log("QAP: buildABC + 6 NTTs")
    p_odd = qap(co["val"], co["m"], co["c"], co["s"], witness.values)

    fqctx = _fq_ctx(cv)
    g1m = msm_mod.MSMContext(fqctx, fq, extension=1)
    g2m = msm_mod.MSMContext(fqctx, fq, extension=2)
    nbits = fr.n8 * 8
    mk = dict(c=msm_c, nbits=nbits, mesh=mesh, cw=msm_cw)

    # upload the static MSM bases once per zkey (re-uploading ~600MB of
    # points per proof dominated wall-clock through the device tunnel)
    if not hasattr(zkey, "_dev_points"):
        import jax as _jax

        put = _jax.tree.map(lambda a: jnp.asarray(a), (
            zkey.a_points, zkey.b1_points, zkey.b2_points,
            zkey.c_points, zkey.h_points))
        object.__setattr__(zkey, "_dev_points", put)
    (a_pts, b1_pts, b2_pts, c_pts, h_pts) = zkey._dev_points

    wit = witness.values
    _log("Multiexp A")
    pi_a = g1m.run(a_pts[0], a_pts[1], a_pts[2], wit, **mk)
    _log("Multiexp B1")
    pi_b1 = g1m.run(b1_pts[0], b1_pts[1], b1_pts[2], wit, **mk)
    _log("Multiexp B2")
    pi_b = g2m.run(b2_pts[0], b2_pts[1], b2_pts[2], wit, **mk)
    wit_c = wit[:, zkey.n_public + 1:]
    _log("Multiexp C")
    pi_c = g1m.run(c_pts[0], c_pts[1], c_pts[2], wit_c, **mk)
    _log("Multiexp H")
    res_h = g1m.run(h_pts[0], h_pts[1], h_pts[2], p_odd, **mk)

    # host affine conversions + blinding (reference :103-120)
    A = msm_mod.host_jac_to_affine(fq, pi_a, 1)
    B1 = msm_mod.host_jac_to_affine(fq, pi_b1, 1)
    B2 = msm_mod.host_jac_to_affine(fq, pi_b, 2)
    C = msm_mod.host_jac_to_affine(fq, pi_c, 1)
    H = msm_mod.host_jac_to_affine(fq, res_h, 1)

    if r is None:
        r = secrets.randbelow(fr.p)
    if s is None:
        s = secrets.randbelow(fr.p)

    A = hc.g1_add(cv, A, zkey.vk_alpha_1)
    A = hc.g1_add(cv, A, hc.g1_mul(cv, zkey.vk_delta_1, r))

    B2 = hc.g2_add(cv, B2, zkey.vk_beta_2)
    B2 = hc.g2_add(cv, B2, hc.g2_mul(cv, zkey.vk_delta_2, s))

    B1 = hc.g1_add(cv, B1, zkey.vk_beta_1)
    B1 = hc.g1_add(cv, B1, hc.g1_mul(cv, zkey.vk_delta_1, s))

    C = hc.g1_add(cv, C, H)
    C = hc.g1_add(cv, C, hc.g1_mul(cv, A, s))
    C = hc.g1_add(cv, C, hc.g1_mul(cv, B1, r))
    C = hc.g1_add(cv, C, hc.g1_mul(cv, zkey.vk_delta_1, (-r * s) % fr.p))

    publics = fjnp.np_to_ints(fr, witness.values[:, 1:zkey.n_public + 1])

    proof = {
        "pi_a": _g1_obj(A),
        "pi_b": _g2_obj(B2),
        "pi_c": _g1_obj(C),
        "protocol": "groth16",
        "curve": cv.name,
    }
    return proof, [str(x) for x in publics]


def _g1_obj(P):
    if P is None:
        return ["0", "1", "0"]
    return [str(P[0]), str(P[1]), "1"]


def _g2_obj(P):
    if P is None:
        return [["0", "0"], ["1", "0"], ["0", "0"]]
    return [[str(P[0][0]), str(P[0][1])],
            [str(P[1][0]), str(P[1][1])],
            ["1", "0"]]


def _g1_from_obj(o):
    x, y, z = (int(v) for v in o)
    if z == 0:
        return None
    assert z == 1
    return (x, y)


def _g2_from_obj(o):
    z = (int(o[2][0]), int(o[2][1]))
    if z == (0, 0):
        return None
    assert z == (1, 0)
    return ((int(o[0][0]), int(o[0][1])), (int(o[1][0]), int(o[1][1])))


def _gt_obj(f12):
    """Fp12 -> [2][3][2] decimal-string nesting (Gt.toObject layout,
    reference src/zkey_export_verificationkey.js:59-72)."""
    return [[[str(c) for c in f2] for f2 in f6] for f6 in f12]


def export_verification_key(zkey: zkey_fmt.Groth16Zkey) -> dict:
    """vkey JSON object (reference src/zkey_export_verificationkey.js:28-77).

    vk_alphabeta_12 = e(alpha_1, beta_2) as a Gt element, computed with the
    reduced optimal-ate pairing (curves/host_curve.py) — the same canonical
    value ffjavascript's engine produces, so the exported Fp12 coordinates
    are byte-identical to the reference's
    (src/zkey_export_verificationkey.js:59).
    """
    return {
        "protocol": "groth16",
        "curve": zkey.curve.name,
        "nPublic": zkey.n_public,
        "vk_alpha_1": _g1_obj(zkey.vk_alpha_1),
        "vk_beta_2": _g2_obj(zkey.vk_beta_2),
        "vk_gamma_2": _g2_obj(zkey.vk_gamma_2),
        "vk_delta_2": _g2_obj(zkey.vk_delta_2),
        "vk_alphabeta_12": _gt_obj(
            hc.pairing(zkey.curve, zkey.vk_alpha_1, zkey.vk_beta_2)),
        "IC": [_g1_obj(p) for p in zkey.ic],
    }


def verify(vk: dict, publics, proof: dict, logger=None) -> bool:
    """Pairing-equation verification (reference src/groth16_verify.js:26-87)."""
    cv = hc.get_curve(vk["curve"])
    publics = [int(x) for x in publics]
    if len(publics) != vk["nPublic"]:
        return False
    if any(not (0 <= x < cv.fr.p) for x in publics):
        return False

    try:
        pi_a = _g1_from_obj(proof["pi_a"])
        pi_b = _g2_from_obj(proof["pi_b"])
        pi_c = _g1_from_obj(proof["pi_c"])
        ic = [_g1_from_obj(p) for p in vk["IC"]]
        vk_alpha_1 = _g1_from_obj(vk["vk_alpha_1"])
        vk_beta_2 = _g2_from_obj(vk["vk_beta_2"])
        vk_gamma_2 = _g2_from_obj(vk["vk_gamma_2"])
        vk_delta_2 = _g2_from_obj(vk["vk_delta_2"])
    except (AssertionError, ValueError, KeyError):
        return False

    for P in (pi_a, pi_c):
        if not hc.g1_is_on_curve(cv, P):
            return False
    if not hc.g2_is_on_curve(cv, pi_b):
        return False

    cpub = ic[0]
    for w, P in zip(publics, ic[1:]):
        cpub = hc.g1_add(cv, cpub, hc.g1_mul(cv, P, w))

    return hc.pairing_eq(cv, [
        (hc.g1_neg(cv, pi_a), pi_b),
        (cpub, vk_gamma_2),
        (pi_c, vk_delta_2),
        (vk_alpha_1, vk_beta_2),
    ])


def prove_files(zkey_path: str, wtns_path: str, **kw):
    zkey = zkey_fmt.read_groth16_zkey(zkey_path)
    witness = wtns_fmt.read_wtns(wtns_path)
    return prove(zkey, witness, **kw)


def export_solidity_calldata(proof: dict, publics) -> str:
    """Hex calldata string (reference src/groth16_exportsoliditycalldata.js)."""
    def p256(n):
        return "0x" + format(int(n), "064x")

    a = proof["pi_a"]
    b = proof["pi_b"]
    c = proof["pi_c"]
    parts = [
        f"[{p256(a[0])}, {p256(a[1])}]",
        f"[[{p256(b[0][1])}, {p256(b[0][0])}],[{p256(b[1][1])}, {p256(b[1][0])}]]",
        f"[{p256(c[0])}, {p256(c[1])}]",
        "[" + ",".join(p256(x) for x in publics) + "]",
    ]
    return ",".join(parts)
