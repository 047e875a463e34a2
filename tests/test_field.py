"""Field arithmetic kernels vs Python-bigint ground truth."""

import random

import jax
import numpy as np
import pytest

from snarkjs_tpu.fields import fjnp
from snarkjs_tpu.fields.params import get_params

FIELDS = ["bn254_fr", "bn254_fq", "bls12_381_fq", "bls12_381_fr"]


def rand_elems(fp, n, rng):
    return [rng.randrange(fp.p) for _ in range(n)]


@pytest.fixture(scope="module")
def rng():
    return random.Random(1234)


@pytest.mark.parametrize("field", FIELDS)
def test_roundtrip_limbs(field, rng):
    fp = get_params(field)
    vals = rand_elems(fp, 17, rng) + [0, 1, fp.p - 1]
    arr = fjnp.np_from_ints(fp, vals)
    assert fjnp.np_to_ints(fp, arr) == vals
    # byte roundtrip
    data = b"".join(fp.to_bytes(v) for v in vals)
    arr2 = fjnp.np_from_bytes_le(fp, data, len(vals))
    np.testing.assert_array_equal(arr, arr2)
    assert fjnp.np_to_bytes_le(fp, arr) == data


@pytest.mark.parametrize("field", FIELDS)
def test_add_sub_neg(field, rng):
    fp = get_params(field)
    ctx = fjnp.get_ctx(field)
    n = 33
    avals = rand_elems(fp, n, rng) + [0, fp.p - 1, 1]
    bvals = rand_elems(fp, n, rng) + [0, 1, fp.p - 1]
    a = fjnp.np_from_ints(fp, avals)
    b = fjnp.np_from_ints(fp, bvals)
    got = fjnp.np_to_ints(fp, np.asarray(fjnp.add(ctx, a, b)))
    assert got == [(x + y) % fp.p for x, y in zip(avals, bvals)]
    got = fjnp.np_to_ints(fp, np.asarray(fjnp.sub(ctx, a, b)))
    assert got == [(x - y) % fp.p for x, y in zip(avals, bvals)]
    got = fjnp.np_to_ints(fp, np.asarray(fjnp.neg(ctx, a)))
    assert got == [(-x) % fp.p for x in avals]


@pytest.mark.parametrize("field", FIELDS)
def test_mont_mul(field, rng):
    fp = get_params(field)
    ctx = fjnp.get_ctx(field)
    n = 65
    avals = rand_elems(fp, n, rng) + [0, 1, fp.p - 1, fp.R % fp.p]
    bvals = rand_elems(fp, n, rng) + [fp.p - 1, 0, fp.p - 1, fp.R % fp.p]
    a = fjnp.np_from_ints(fp, avals)
    b = fjnp.np_from_ints(fp, bvals)
    got = fjnp.np_to_ints(fp, np.asarray(fjnp.mont_mul(ctx, a, b)))
    want = [x * y * fp.Rinv % fp.p for x, y in zip(avals, bvals)]
    assert got == want


@pytest.mark.parametrize("field", ["bn254_fr", "bls12_381_fq"])
def test_mont_conversions(field, rng):
    fp = get_params(field)
    ctx = fjnp.get_ctx(field)
    vals = rand_elems(fp, 9, rng)
    a = fjnp.np_from_ints(fp, vals)
    am = fjnp.to_mont(ctx, a)
    assert fjnp.np_to_ints(fp, np.asarray(am)) == [fp.to_mont(v) for v in vals]
    back = fjnp.from_mont(ctx, am)
    assert fjnp.np_to_ints(fp, np.asarray(back)) == vals


@pytest.mark.parametrize("field", ["bn254_fr", "bls12_381_fq"])
def test_exp_inv(field, rng):
    fp = get_params(field)
    ctx = fjnp.get_ctx(field)
    vals = rand_elems(fp, 5, rng) + [1]
    am = fjnp.to_mont(ctx, fjnp.np_from_ints(fp, vals))
    # x * x^-1 == 1
    im = fjnp.inv(ctx, am)
    prod = fjnp.mont_mul(ctx, am, im)
    one = np.asarray(ctx.one((len(vals),)))
    np.testing.assert_array_equal(np.asarray(prod), one)
    # x^e
    e = 12345
    gm = fjnp.exp_const(ctx, am, e)
    got = fjnp.np_to_ints(fp, np.asarray(fjnp.from_mont(ctx, gm)))
    assert got == [pow(v, e, fp.p) for v in vals]


@pytest.mark.parametrize("field", ["bn254_fr"])
def test_batch_inverse(field, rng):
    fp = get_params(field)
    ctx = fjnp.get_ctx(field)
    vals = rand_elems(fp, 40, rng)
    vals[7] = 0
    vals[23] = 0
    am = fjnp.to_mont(ctx, fjnp.np_from_ints(fp, vals))
    got = fjnp.from_mont(ctx, fjnp.batch_inverse(ctx, am, axis=1))
    want = [pow(v, fp.p - 2, fp.p) if v else 0 for v in vals]
    assert fjnp.np_to_ints(fp, np.asarray(got)) == want


def test_jit_and_2d_batch():
    fp = get_params("bn254_fr")
    ctx = fjnp.get_ctx("bn254_fr")
    rng = random.Random(7)
    vals = rand_elems(fp, 24, rng)
    a = fjnp.np_from_ints(fp, vals).reshape(fp.nl, 4, 6)
    f = jax.jit(lambda x, y: fjnp.mont_mul(ctx, x, y))
    got = np.asarray(f(a, a)).reshape(fp.nl, 24)
    want = [v * v * fp.Rinv % fp.p for v in vals]
    assert fjnp.np_to_ints(fp, got) == want
