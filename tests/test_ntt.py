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


def test_union_domain_ntt_roundtrip_and_host():
    """Size-2^(s+1) shift decomposition (reference
    src/powersoftau_preparephase2.js:91-138) checked with an artificially
    small s (the real s=28 size is 2^29 elements): device roundtrip and
    bigint cross-check of the t0/t1 split."""
    import random

    from snarkjs_tpu.fields import fjnp
    from snarkjs_tpu.ntt import ntt as nttmod

    ctx = fjnp.get_ctx("bn254_fr")
    fp = ctx.fp
    p = fp.p
    s_log, m = 3, 8
    n = 2 * m
    rng = random.Random(77)
    vals = [rng.randrange(p) for _ in range(n)]
    a = fjnp.to_mont(ctx, fjnp.np_from_ints(fp, vals))

    coeffs = nttmod.intt_union(ctx, a, s_log=s_log)
    back = nttmod.ntt_union(ctx, coeffs, s_log=s_log)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))

    # host bigint version of the reference's split formulas
    shift = fp.shift % p
    S = pow(shift, m, p)
    d = pow((S - 1) % p, p - 2, p)
    sinv = pow(shift, p - 2, p)
    t, tm = vals[:m], vals[m:]
    t0 = [(t[i] * S - tm[i]) % p * d % p for i in range(m)]
    t1 = [(tm[i] - t[i]) % p * pow(sinv, i, p) % p * d % p for i in range(m)]

    w = fp.w[s_log]
    ninv = pow(m, p - 2, p)

    def host_intt(xs):
        return [sum(x * pow(w, (-i * j) % (p - 1), p) for j, x in
                    enumerate(xs)) * ninv % p for i in range(m)]

    want = host_intt(t0) + host_intt(t1)
    got = fjnp.np_to_ints(fp, np.asarray(fjnp.from_mont(ctx, coeffs)))
    assert got == want
