"""Jacobian kernels and Pippenger MSM vs host bigint ground truth."""

import random

import numpy as np
import pytest

from snarkjs_tpu.curves import host_curve as hc
from snarkjs_tpu.curves import jac, msm
from snarkjs_tpu.curves.gops import FqOps, Fq2Ops
from snarkjs_tpu.fields import fjnp


def _g1_points(cv, ks):
    return [hc.g1_mul(cv, cv.g1, k) for k in ks]


def _to_device_g1(cv, pts):
    fp = cv.fq
    xs = [fp.to_mont(p[0]) if p else 0 for p in pts]
    ys = [fp.to_mont(p[1]) if p else 0 for p in pts]
    inf = np.array([p is None for p in pts])
    return (fjnp.np_from_ints(fp, xs), fjnp.np_from_ints(fp, ys), inf)


def _to_device_g2(cv, pts):
    fp = cv.fq
    def c(i, j):
        return [fp.to_mont(p[i][j]) if p else 0 for p in pts]
    px = (fjnp.np_from_ints(fp, c(0, 0)), fjnp.np_from_ints(fp, c(0, 1)))
    py = (fjnp.np_from_ints(fp, c(1, 0)), fjnp.np_from_ints(fp, c(1, 1)))
    inf = np.array([p is None for p in pts])
    return px, py, inf


def test_jac_add_dbl_vs_host():
    cv = hc.BN254
    fp = cv.fq
    ctx = fjnp.get_ctx("bn254_fq")
    f = FqOps(ctx)
    rng = random.Random(5)
    ks = [rng.randrange(1, cv.fr.p) for _ in range(6)]
    A = _g1_points(cv, ks)
    B = _g1_points(cv, ks[::-1])
    # include special cases: equal points, inverses, infinity
    A += [A[0], A[1], None, A[2], None]
    B += [A[0], hc.g1_neg(cv, A[1]), A[3], None, None]
    ax, ay, ainf = _to_device_g1(cv, A)
    bx, by, binf = _to_device_g1(cv, B)
    P = jac.from_affine(f, ax, ay, ainf)
    Q = jac.from_affine(f, bx, by, binf)
    R = jac.jac_add(f, P, Q)
    X, Y, Z = (np.asarray(t) for t in R)
    for i, (pa, pb) in enumerate(zip(A, B)):
        want = hc.g1_add(cv, pa, pb)
        zi = fp.from_mont(fjnp.np_to_ints(fp, X[:, i])[0]), \
             fp.from_mont(fjnp.np_to_ints(fp, Y[:, i])[0]), \
             fp.from_mont(fjnp.np_to_ints(fp, Z[:, i])[0])
        got = msm.host_jac_to_affine(fp, zi, 1)
        assert got == want, f"lane {i}"
    # doubling
    D = jac.jac_dbl(f, P)
    X, Y, Z = (np.asarray(t) for t in D)
    for i, pa in enumerate(A):
        want = hc.g1_add(cv, pa, pa)
        zi = tuple(fp.from_mont(fjnp.np_to_ints(fp, arr[:, i])[0]) for arr in (X, Y, Z))
        got = msm.host_jac_to_affine(fp, zi, 1)
        assert got == want, f"dbl lane {i}"


@pytest.mark.parametrize("c", [8, 16])
def test_msm_g1(c):
    cv = hc.BN254
    rng = random.Random(11)
    n = 33
    ks = [rng.randrange(1, cv.fr.p) for _ in range(n)]
    pts = _g1_points(cv, ks)
    pts[3] = None           # infinity base
    pts[5] = pts[4]         # duplicate point
    scal = [rng.randrange(cv.fr.p) for _ in range(n)]
    scal[7] = 0             # zero scalar
    scal[8] = cv.fr.p - 1   # max scalar
    px, py, inf = _to_device_g1(cv, pts)
    s = fjnp.np_from_ints(cv.fr, scal)
    mctx = msm.MSMContext(fjnp.get_ctx("bn254_fq"), cv.fq, extension=1)
    got = msm.host_jac_to_affine(cv.fq, mctx.run(px, py, inf, s, c=c), 1)
    want = None
    for p, k in zip(pts, scal):
        want = hc.g1_add(cv, want, hc.g1_mul(cv, p, k) if p else None)
    assert got == want


def test_msm_g2():
    cv = hc.BN254
    rng = random.Random(13)
    n = 17
    ks = [rng.randrange(1, cv.fr.p) for _ in range(n)]
    pts = [hc.g2_mul(cv, cv.g2, k) for k in ks]
    pts[2] = None
    scal = [rng.randrange(cv.fr.p) for _ in range(n)]
    scal[5] = 0
    px, py, inf = _to_device_g2(cv, pts)
    s = fjnp.np_from_ints(cv.fr, scal)
    mctx = msm.MSMContext(fjnp.get_ctx("bn254_fq"), cv.fq, extension=2)
    got = msm.host_jac_to_affine(cv.fq, mctx.run(px, py, inf, s, c=8), 2)
    want = None
    for p, k in zip(pts, scal):
        want = hc.g2_add(cv, want, hc.g2_mul(cv, p, k) if p else None)
    assert got == want


def test_msm_bls_g1():
    cv = hc.BLS12_381
    rng = random.Random(17)
    n = 9
    pts = [hc.g1_mul(cv, cv.g1, rng.randrange(1, cv.fr.p)) for _ in range(n)]
    scal = [rng.randrange(cv.fr.p) for _ in range(n)]
    px, py, inf = _to_device_g1(cv, pts)
    s = fjnp.np_from_ints(cv.fr, scal)
    mctx = msm.MSMContext(fjnp.get_ctx("bls12_381_fq"), cv.fq, extension=1)
    got = msm.host_jac_to_affine(cv.fq, mctx.run(px, py, inf, s, c=8, nbits=256), 1)
    want = None
    for p, k in zip(pts, scal):
        want = hc.g1_add(cv, want, hc.g1_mul(cv, p, k))
    assert got == want
