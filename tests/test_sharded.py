"""Multi-device sharded MSM / NTT vs single-device results (8 virtual CPUs)."""

import random

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from snarkjs_tpu.curves import host_curve as hc, msm
from snarkjs_tpu.curves.gops import FqOps
from snarkjs_tpu.fields import fjnp
from snarkjs_tpu.ntt import ntt as nttmod
from snarkjs_tpu.parallel import sharded


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    assert len(devs) == 8, "conftest must provide 8 virtual devices"
    return Mesh(devs, ("d",))


def test_ntt_sharded_matches_local(mesh):
    fp = fjnp.get_ctx("bn254_fr").fp
    ctx = fjnp.get_ctx("bn254_fr")
    rng = random.Random(21)
    n = 1 << 8  # n1=16, n2=16, both divisible by 8
    vals = [rng.randrange(fp.p) for _ in range(n)]
    x = fjnp.to_mont(ctx, fjnp.np_from_ints(fp, vals))
    want = np.asarray(nttmod.ntt(ctx, x))
    got = np.asarray(sharded.ntt_sharded(mesh, ctx, x))
    np.testing.assert_array_equal(got, want)
    # inverse roundtrip through the sharded path
    back = np.asarray(sharded.ntt_sharded(mesh, ctx, got, inverse=True))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_msm_sharded_matches_local(mesh):
    cv = hc.BN254
    rng = random.Random(23)
    n = 64
    ks = [rng.randrange(1, cv.fr.p) for _ in range(n)]
    pts = [hc.g1_mul(cv, cv.g1, k) for k in ks]
    scal = [rng.randrange(cv.fr.p) for _ in range(n)]
    fq = cv.fq
    px = fjnp.np_from_ints(fq, [fq.to_mont(p[0]) for p in pts])
    py = fjnp.np_from_ints(fq, [fq.to_mont(p[1]) for p in pts])
    inf = np.zeros(n, dtype=bool)
    s = fjnp.np_from_ints(cv.fr, scal)
    f = FqOps(fjnp.get_ctx("bn254_fq"))
    ws = sharded.msm_sharded(mesh, f, px, py, inf, s, c=8, nbits=256, R=4)
    mctx = msm.MSMContext(fjnp.get_ctx("bn254_fq"), fq, extension=1)
    got = msm.host_jac_to_affine(fq, mctx._finish(ws, 8, 256), 1)
    want = None
    for p, k in zip(pts, scal):
        want = hc.g1_add(cv, want, hc.g1_mul(cv, p, k))
    assert got == want


def test_group_intt_sharded_matches_host(mesh):
    """Four-step sharded group INTT == host bigint IFFT (preparePhase2's
    heavy op, reference src/powersoftau_preparephase2.js:67-139)."""
    import jax.numpy as jnp

    from snarkjs_tpu.ceremony import ptau_ops as ops
    from snarkjs_tpu.formats import points as pcodec

    cv = hc.BN254
    fr, fq = cv.fr, cv.fq
    k = 6
    n = 1 << k
    tau = 55443322
    pts = [hc.g1_mul(cv, cv.g1, pow(tau, i, fr.p)) for i in range(n)]
    pts[5] = None  # infinity inside the input
    want = ops.host_group_ifft(cv, False, pts, k)
    px = jnp.asarray(fjnp.np_from_ints(
        fq, [fq.to_mont(p[0]) if p else 0 for p in pts]))
    py = jnp.asarray(fjnp.np_from_ints(
        fq, [fq.to_mont(p[1]) if p else 0 for p in pts]))
    pinf = jnp.asarray(np.array([p is None for p in pts]))
    ox, oy, oinf = sharded.group_intt_sharded(mesh, cv, False, px, py, pinf)
    got_b = pcodec.g1_lem_to_bytes(fq, np.asarray(ox), np.asarray(oy),
                                   np.asarray(oinf))
    got = pcodec.g1_lem_to_ints(fq, got_b, n)
    assert got == want


def test_apply_key_sharded_matches_local(mesh):
    """Mesh-sharded batchApplyKey == single-device result (ceremony
    contribute, reference src/powersoftau_contribute.js:119-158)."""
    from snarkjs_tpu.ceremony import ptau_ops
    from snarkjs_tpu.formats import points as pcodec

    cv = hc.BN254
    fq = cv.fq
    n = 300
    pts = [hc.g1_mul(cv, cv.g1, 7 + i) for i in range(n)]
    lem = pcodec.g1_lem_from_ints(fq, pts)
    first, inc = 987654, 13579
    want = ptau_ops.apply_key_g1(cv, lem, n, first, inc)
    got = ptau_ops.apply_key_g1(cv, lem, n, first, inc, mesh=mesh)
    assert bytes(got) == bytes(want)


def test_tpu_msm_run_sharded_matches_host(mesh):
    """The PRODUCTION fused-MSM engine's run_sharded (the path the mesh
    provers call), virtual 8-device mesh, vs host bigints."""
    from snarkjs_tpu.curves import msm_tpu

    cv = hc.BN254
    rng = random.Random(31)
    n, nw, cw = 200, 2, 8
    ks = [rng.randrange(1, cv.fr.p) for _ in range(n)]
    pts = [hc.g1_mul(cv, cv.g1, k) for k in ks]
    ints = [rng.randrange(0, 1 << (cw * nw)) for _ in range(n)]
    fq = cv.fq
    px = fjnp.np_from_ints(fq, [fq.to_mont(p[0]) for p in pts])
    py = fjnp.np_from_ints(fq, [fq.to_mont(p[1]) for p in pts])
    inf = np.zeros(n, dtype=bool)
    scal = np.zeros((nw, n), dtype=np.uint32)
    for j, v in enumerate(ints):
        for w in range(nw):
            scal[w, j] = (v >> (cw * w)) & ((1 << cw) - 1)
    m = msm_tpu.TpuMSM(cv.fq, cv.fr, cv.b, cv.g1, ext=1, cw=cw)
    got = msm.host_jac_to_affine(
        fq, m.run_sharded(mesh, px, py, inf, scal))
    want = None
    for p, v in zip(pts, ints):
        if v:
            want = hc.g1_add(cv, want, hc.g1_mul(cv, p, v))
    assert got == want
