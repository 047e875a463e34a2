"""MXU matmul NTT vs the butterfly reference path (bit-identical).

Exercises the digit codec, the digit-product matmul (einsum path on CPU —
the same column math the Pallas kernel computes on TPU), the
normalize/Barrett reduction, and the recursive four-step with factored
twiddles (k > 10 recurses).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snarkjs_tpu.fields import fjnp
from snarkjs_tpu.ntt import ntt as nttmod
from snarkjs_tpu.ntt import ntt_mxu


def _rand_mont(fp, rng, n):
    vals = [int.from_bytes(rng.bytes(fp.n8 + 8), "little") % fp.p
            for _ in range(n)]
    return jnp.asarray(fjnp.np_from_ints(fp, [fp.to_mont(v) for v in vals]))


@pytest.mark.parametrize("field", ["bn254_fr", "bls12_381_fr"])
@pytest.mark.parametrize("k", [1, 6, 11])
def test_ntt_mxu_matches_butterfly(field, k):
    ctx = fjnp.get_ctx(field)
    fp = ctx.fp
    rng = np.random.default_rng(17 + k)
    a = _rand_mont(fp, rng, 1 << k)
    assert np.array_equal(np.asarray(nttmod._ntt_core(ctx, a, k, False)),
                          np.asarray(ntt_mxu.ntt(ctx, a)))
    assert np.array_equal(np.asarray(nttmod._ntt_core(ctx, a, k, True)),
                          np.asarray(ntt_mxu.intt(ctx, a)))


def test_ntt_mxu_roundtrip_edge_values():
    ctx = fjnp.get_ctx("bn254_fr")
    fp = ctx.fp
    n = 64
    vals = [0, 1, fp.p - 1, fp.p - 2] + [
        int.from_bytes(np.random.default_rng(9).bytes(40), "little") % fp.p
        for _ in range(n - 4)]
    a = jnp.asarray(fjnp.np_from_ints(fp, [fp.to_mont(v) for v in vals]))
    back = ntt_mxu.intt(ctx, ntt_mxu.ntt(ctx, a))
    assert np.array_equal(np.asarray(back), np.asarray(a))


def test_normalize_cols_bounds():
    """Feed extreme +-2^29-scale columns through the Barrett normalize."""
    fp = fjnp.get_ctx("bn254_fr").fp
    nd = ntt_mxu._nd(fp)
    nc = 2 * nd - 1
    rng = np.random.default_rng(4)
    cols = rng.integers(-(1 << 29), 1 << 29, size=(nc, 4, 8)).astype(np.int32)
    # make each represented value non-negative: add a huge positive col 0..
    cols[0] = np.abs(cols[0])
    vals_true = []
    for i in range(4):
        for j in range(8):
            v = sum(int(cols[c, i, j]) << (8 * c) for c in range(nc))
            if v < 0:
                # shift negative cases positive via the top column
                cols[nc - 1, i, j] = abs(int(cols[nc - 1, i, j]))
                v = sum(int(cols[c, i, j]) << (8 * c) for c in range(nc))
            vals_true.append(v % fp.p)
    out = ntt_mxu._normalize_cols(fp, jnp.asarray(cols))
    got = fjnp.np_to_ints(fp, np.asarray(out).reshape(fp.nl, 32))
    assert got == vals_true


def test_fused_normalize_kernel_matches_xla():
    """The Pallas matmul+normalize kernel (TPU production path) vs the
    einsum + XLA normalize pair, interpret mode, both fields."""
    for field in ("bn254_fr",):
        ctx = fjnp.get_ctx(field)
        fp = ctx.fp
        rng = np.random.default_rng(41)
        r, m = 256, 128
        k = 8
        a = _rand_mont(fp, rng, r * m).reshape(fp.nl, r, m)
        W8 = jnp.asarray(ntt_mxu._w_matrix_digits(fp.name, k, False))
        D8 = ntt_mxu._to_digits(fp, a)
        want = ntt_mxu._normalize_cols(fp, ntt_mxu._einsum_mm(W8, D8))
        got = ntt_mxu._pallas_mm_norm(
            fp.name, r, r, m, 128, 128, interpret=True)(W8, D8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
