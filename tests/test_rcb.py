"""RCB complete-addition formulas vs the host bigint curve.

Covers the cases the formulas must be complete for (random add, doubling,
inverse pair -> identity, identity operands) on both G1 (Fq) and G2 (Fq2),
matching the behavior of the reference's jacobian WASM engine
(g1m_add/g1m_double, driven from reference src/groth16_prove.js:106-120).
"""

import numpy as np
import jax.numpy as jnp

from snarkjs_tpu.curves import host_curve as hc
from snarkjs_tpu.curves import rcb
from snarkjs_tpu.curves.gops import FqOps, Fq2Ops
from snarkjs_tpu.fields import fjnp


def _fq_elems(fp, vals):
    return jnp.asarray(fjnp.np_from_ints(fp, [fp.to_mont(v) for v in vals]))


def _from_proj(fp, X, Y, Z, i):
    """Device projective lane i -> host affine (or None)."""
    x = fp.from_mont(fjnp.np_to_ints(fp, np.asarray(X[:, i:i + 1]))[0])
    y = fp.from_mont(fjnp.np_to_ints(fp, np.asarray(Y[:, i:i + 1]))[0])
    z = fp.from_mont(fjnp.np_to_ints(fp, np.asarray(Z[:, i:i + 1]))[0])
    if z == 0:
        return None
    zi = pow(z, fp.p - 2, fp.p)
    return (x * zi % fp.p, y * zi % fp.p)


def test_rcb_g1_complete_bn254():
    cv = hc.BN254
    fp = cv.fq
    f = FqOps(fjnp.get_ctx(fp.name))
    b3 = _fq_elems(fp, [3 * cv.b % fp.p])

    rng = np.random.default_rng(7)
    ks = [int(rng.integers(1, 1 << 60)) for _ in range(6)]
    pts = [hc.g1_mul(cv, cv.g1, k) for k in ks]

    # pairs: random+random, doubling, P + (-P), identity + P, P + identity
    neg0 = hc.g1_neg(cv, pts[0])
    cases = [(pts[0], pts[1]), (pts[2], pts[2]), (pts[0], neg0),
             (None, pts[3]), (pts[4], None), (None, None), (pts[5], pts[0])]

    def load(P):
        if P is None:
            return (0, 1, 0)
        return (P[0], P[1], 1)

    X1 = _fq_elems(fp, [load(a)[0] for a, _ in cases])
    Y1 = _fq_elems(fp, [load(a)[1] for a, _ in cases])
    Z1 = _fq_elems(fp, [load(a)[2] for a, _ in cases])
    X2 = _fq_elems(fp, [load(b)[0] for _, b in cases])
    Y2 = _fq_elems(fp, [load(b)[1] for _, b in cases])
    Z2 = _fq_elems(fp, [load(b)[2] for _, b in cases])

    X3, Y3, Z3 = rcb.rcb_add(f, (X1, Y1, Z1), (X2, Y2, Z2), b3)
    for i, (a, b) in enumerate(cases):
        want = hc.g1_add(cv, a, b)
        got = _from_proj(fp, X3, Y3, Z3, i)
        assert got == want, f"case {i}: {got} != {want}"

    # mixed add (second operand affine, never identity)
    mcases = [(pts[0], pts[1]), (pts[2], pts[2]), (pts[0], neg0),
              (None, pts[3])]
    X1 = _fq_elems(fp, [load(a)[0] for a, _ in mcases])
    Y1 = _fq_elems(fp, [load(a)[1] for a, _ in mcases])
    Z1 = _fq_elems(fp, [load(a)[2] for a, _ in mcases])
    x2 = _fq_elems(fp, [b[0] for _, b in mcases])
    y2 = _fq_elems(fp, [b[1] for _, b in mcases])
    X3, Y3, Z3 = rcb.rcb_madd(f, (X1, Y1, Z1), x2, y2, b3)
    for i, (a, b) in enumerate(mcases):
        want = hc.g1_add(cv, a, b)
        got = _from_proj(fp, X3, Y3, Z3, i)
        assert got == want, f"mixed case {i}: {got} != {want}"


def test_rcb_g2_bn254():
    cv = hc.BN254
    fp = cv.fq
    f2 = Fq2Ops(fjnp.get_ctx(fp.name))
    b3h = hc.tw.f2_mul((3, 0), cv.b2, fp.p)
    b3 = (_fq_elems(fp, [b3h[0]]), _fq_elems(fp, [b3h[1]]))

    rng = np.random.default_rng(9)
    ks = [int(rng.integers(1, 1 << 60)) for _ in range(4)]
    pts = [hc.g2_mul_any(cv, cv.g2, k) for k in ks]
    cases = [(pts[0], pts[1]), (pts[2], pts[2]), (pts[0], hc.g2_neg(cv, pts[0]))]

    def col(P, coord, part):
        return P[coord][part]

    def mk(Ps, coord, part, default):
        return _fq_elems(fp, [default if P is None else P[coord][part]
                              for P in Ps])

    A = [a for a, _ in cases]
    B = [b for _, b in cases]
    # Z1 = 1 for all (no identity among A)
    one = _fq_elems(fp, [1] * len(cases))
    zero = _fq_elems(fp, [0] * len(cases))
    P1 = ((mk(A, 0, 0, 0), mk(A, 0, 1, 0)),
          (mk(A, 1, 0, 1), mk(A, 1, 1, 0)),
          (one, zero))
    P2 = ((mk(B, 0, 0, 0), mk(B, 0, 1, 0)),
          (mk(B, 1, 0, 1), mk(B, 1, 1, 0)),
          (one, zero))
    X3, Y3, Z3 = rcb.rcb_add(f2, P1, P2, b3)
    for i, (a, b) in enumerate(cases):
        want = hc.g2_add(cv, a, b)
        gx = (_from2(fp, X3, i), _from2(fp, Y3, i), _from2(fp, Z3, i))
        if gx[2] == (0, 0):
            got = None
        else:
            zi = hc.tw.f2_inv(gx[2], fp.p)
            got = (hc.tw.f2_mul(gx[0], zi, fp.p), hc.tw.f2_mul(gx[1], zi, fp.p))
        assert got == want, f"g2 case {i}: {got} != {want}"


def _from2(fp, E, i):
    return (fp.from_mont(fjnp.np_to_ints(fp, np.asarray(E[0][:, i:i + 1]))[0]),
            fp.from_mont(fjnp.np_to_ints(fp, np.asarray(E[1][:, i:i + 1]))[0]))
