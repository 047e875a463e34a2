"""NTT vs naive bigint DFT (pins the ffjavascript evaluation convention)."""

import random

import numpy as np
import pytest

from snarkjs_tpu.fields import fjnp
from snarkjs_tpu.fields.params import get_params
from snarkjs_tpu.ntt import ntt as nttmod


@pytest.mark.parametrize("field", ["bn254_fr", "bls12_381_fr"])
@pytest.mark.parametrize("k", [0, 1, 3, 5])
def test_ntt_matches_naive_dft(field, k):
    fp = get_params(field)
    ctx = fjnp.get_ctx(field)
    rng = random.Random(42 + k)
    n = 1 << k
    coeffs = [rng.randrange(fp.p) for _ in range(n)]
    a = fjnp.to_mont(ctx, fjnp.np_from_ints(fp, coeffs))
    evals = fjnp.from_mont(ctx, nttmod.ntt(ctx, a))
    got = fjnp.np_to_ints(fp, np.asarray(evals))
    w = fp.w[k] if k > 0 else 1
    want = [sum(c * pow(w, i * j, fp.p) for j, c in enumerate(coeffs)) % fp.p
            for i in range(n)]
    assert got == want


def test_intt_roundtrip():
    fp = get_params("bn254_fr")
    ctx = fjnp.get_ctx("bn254_fr")
    rng = random.Random(7)
    n = 64
    coeffs = [rng.randrange(fp.p) for _ in range(n)]
    a = fjnp.to_mont(ctx, fjnp.np_from_ints(fp, coeffs))
    back = nttmod.intt(ctx, nttmod.ntt(ctx, a))
    assert fjnp.np_to_ints(fp, np.asarray(back)) == fjnp.np_to_ints(fp, np.asarray(a))


def test_apply_powers_and_coset():
    fp = get_params("bn254_fr")
    ctx = fjnp.get_ctx("bn254_fr")
    rng = random.Random(3)
    n = 16
    vals = [rng.randrange(fp.p) for _ in range(n)]
    a = fjnp.to_mont(ctx, fjnp.np_from_ints(fp, vals))
    first, inc = 5, 7
    out = fjnp.from_mont(ctx, nttmod.apply_powers(ctx, a, first, inc))
    want = [v * first * pow(inc, i, fp.p) % fp.p for i, v in enumerate(vals)]
    assert fjnp.np_to_ints(fp, np.asarray(out)) == want

    # coset evaluation property: ntt(coset_shift(coeffs)) == P(inc * w^i)
    k = 4
    inc2 = fp.w[k + 1]
    shifted = nttmod.coset_shift(ctx, a)
    evals = fjnp.from_mont(ctx, nttmod.ntt(ctx, shifted))
    got = fjnp.np_to_ints(fp, np.asarray(evals))
    w = fp.w[k]
    want = [sum(c * pow(inc2 * pow(w, i, fp.p), j, fp.p) for j, c in enumerate(vals)) % fp.p
            for i in range(n)]
    assert got == want


def test_extend_evaluations():
    fp = get_params("bn254_fr")
    ctx = fjnp.get_ctx("bn254_fr")
    rng = random.Random(9)
    n = 8
    vals = [rng.randrange(fp.p) for _ in range(n)]
    a = fjnp.to_mont(ctx, fjnp.np_from_ints(fp, vals))
    ext = fjnp.from_mont(ctx, nttmod.extend_evaluations(ctx, a, 4))
    got = fjnp.np_to_ints(fp, np.asarray(ext))
    w4 = fp.w[5]  # 4n = 32 = 2^5
    want = [sum(c * pow(w4, i * j, fp.p) for j, c in enumerate(vals)) % fp.p
            for i in range(4 * n)]
    assert got == want
