"""Pallas-path MSM tests (interpret mode on CPU).

The production TPU MSM (curves/msm_tpu.py) used to be exercised only by
bench.py on hardware; these tests run the same kernels under the Pallas
interpreter so kernel regressions surface off-chip (VERDICT r3 item 5).

The full pipeline is heavy to compile on CPU, so the always-on test uses a
reduced window width (cw=8 -> 129 signed-digit buckets, one scan chunk) and
a small point set; G2 and bls12-381 variants are also always-on since the
signed-digit rewrite (they share the compile-light XLA fallback path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snarkjs_tpu.curves import host_curve as hc
from snarkjs_tpu.curves import msm as msm_mod
from snarkjs_tpu.curves import msm_tpu
from snarkjs_tpu.fields import fjnp


def _g1_points(cv, n):
    pts = []
    acc = cv.g1
    for _ in range(n):
        pts.append(acc)
        acc = hc.g1_add(cv, acc, cv.g1)
    fq = cv.fq
    px = jnp.asarray(fjnp.np_from_ints(fq, [fq.to_mont(p[0]) for p in pts]))
    py = jnp.asarray(fjnp.np_from_ints(fq, [fq.to_mont(p[1]) for p in pts]))
    return pts, px, py


def _g2_points(cv, n):
    pts = []
    acc = cv.g2
    for _ in range(n):
        pts.append(acc)
        acc = hc.g2_add(cv, acc, cv.g2)
    fq = cv.fq

    def coords(idx, part):
        return jnp.asarray(
            fjnp.np_from_ints(fq, [fq.to_mont(p[idx][part]) for p in pts]))

    return pts, (coords(0, 0), coords(0, 1)), (coords(1, 0), coords(1, 1))


def _scalars(rng, n, nw, cw, specials=True):
    ints = [int(rng.integers(0, 1 << (cw * nw))) for _ in range(n)]
    if specials:
        ints[0] = 0                      # zero scalar drops the point
        ints[1] = 1
        ints[2] = 1 << cw                # zero low digit
        ints[3] = ints[4] = ints[5]      # duplicate digits
    scal = np.zeros((nw, n), dtype=np.uint32)
    for j, v in enumerate(ints):
        for w in range(nw):
            scal[w, j] = (v >> (cw * w)) & ((1 << cw) - 1)
    return ints, jnp.asarray(scal)


def _host_msm_g1(cv, pts, ints, pinf):
    want = None
    for i, v in enumerate(ints):
        if pinf[i] or v == 0:
            continue
        p = hc.g1_mul(cv, pts[i], v)
        want = p if want is None else hc.g1_add(cv, want, p)
    return want


def test_msm_pipeline_g1_bn254():
    cv = hc.BN254
    rng = np.random.default_rng(11)
    n, nw, cw = 150, 2, 8
    pts, px, py = _g1_points(cv, n)
    ints, scal = _scalars(rng, n, nw, cw)
    pinf = np.zeros(n, dtype=bool)
    pinf[6] = True
    m = msm_tpu.TpuMSM(cv.fq, cv.fr, cv.b, cv.g1, ext=1, cw=cw)
    got = msm_mod.host_jac_to_affine(cv.fq, m.run(px, py, pinf, scal))
    assert got == _host_msm_g1(cv, pts, ints, pinf)


def test_msm_pipeline_g2_bn254():
    cv = hc.BN254
    rng = np.random.default_rng(12)
    n, nw, cw = 60, 2, 8
    pts, px, py = _g2_points(cv, n)
    ints, scal = _scalars(rng, n, nw, cw)
    pinf = np.zeros(n, dtype=bool)
    m = msm_tpu.TpuMSM(cv.fq, cv.fr, cv.b2, cv.g2, ext=2, cw=cw)
    got = msm_mod.host_jac_to_affine(cv.fq, m.run(px, py, pinf, scal), 2)
    want = None
    for i, v in enumerate(ints):
        if v == 0:
            continue
        p = hc.g2_mul(cv, pts[i], v)
        want = p if want is None else hc.g2_add(cv, want, p)
    assert got == want


def test_msm_pipeline_g1_bls():
    cv = hc.BLS12_381
    rng = np.random.default_rng(13)
    n, nw, cw = 100, 2, 8
    pts, px, py = _g1_points(cv, n)
    ints, scal = _scalars(rng, n, nw, cw)
    pinf = np.zeros(n, dtype=bool)
    m = msm_tpu.TpuMSM(cv.fq, cv.fr, cv.b, cv.g1, ext=1, cw=cw)
    got = msm_mod.host_jac_to_affine(cv.fq, m.run(px, py, pinf, scal))
    assert got == _host_msm_g1(cv, pts, ints, pinf)
