"""Radix-2 NTT/iNTT over Fr, matching ffjavascript's FFT semantics.

Conventions (pinned to the reference compute engine so zkey artifacts
interoperate — reference use-sites src/groth16_prove.js:66-76):

* ``ntt(a)[i] = P(w^i)`` in natural order, where ``w = Fr.w[log2(n)]`` is the
  2^k-th root from the ffjavascript ladder (params.FieldParams.w).
* ``intt`` is the exact inverse (scaled by n^-1, using w^-1).
* Values are in Montgomery form throughout (linear maps commute with the
  Montgomery scaling, exactly as in the reference's WASM engine).
* ``apply_powers`` is the ``Fr.batchApplyKey`` equivalent: x_i *= first*inc^i
  (reference src/groth16_prove.js:67) — used for coset shifts.

Layout: (NL, n) limb-major uint32; all stages are static-shape reshapes +
elementwise Montgomery butterflies, so XLA fuses each stage into a single
VPU pass.  Cross-chip sharded NTT lives in snarkjs_tpu.parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fjnp
from ..fields.fjnp import FieldCtx
from ..fields.params import FieldParams


def bit_reverse_perm(k: int) -> np.ndarray:
    """Permutation p with p[i] = bitreverse_k(i) (reference src/misc.js:43-50)."""
    n = 1 << k
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _twiddles(field_name: str, k: int, inverse: bool):
    """Per-stage twiddle tables, Montgomery form, numpy (NL, m) for stage m."""
    from ..fields.params import get_params

    fp = get_params(field_name)
    root = fp.winv[k] if inverse else fp.w[k]
    tables = []
    for s in range(1, k + 1):
        m = 1 << (s - 1)
        ws = pow(root, 1 << (k - s), fp.p)  # 2m-th primitive root for this stage
        tw = []
        cur = 1
        for _ in range(m):
            tw.append(fp.to_mont(cur))
            cur = cur * ws % fp.p
        tables.append(fjnp.np_from_ints(fp, tw))
    return tables


@functools.lru_cache(maxsize=None)
def _n_inv_mont(field_name: str, k: int):
    from ..fields.params import get_params

    fp = get_params(field_name)
    return fjnp.np_from_ints(fp, [fp.to_mont(pow(1 << k, fp.p - 2, fp.p))])


def _ntt_core(ctx: FieldCtx, a, k: int, inverse: bool):
    n = 1 << k
    nl = ctx.nl
    perm = jnp.asarray(bit_reverse_perm(k))
    x = a[:, perm]
    tables = _twiddles(ctx.fp.name, k, inverse)
    for s in range(1, k + 1):
        m = 1 << (s - 1)
        tw = jnp.asarray(tables[s - 1]).reshape(nl, 1, m)
        x = x.reshape(nl, n // (2 * m), 2 * m)
        lo = x[:, :, :m]
        hi = x[:, :, m:]
        t = fjnp.mont_mul(ctx, hi, tw)
        x = jnp.concatenate([fjnp.add(ctx, lo, t), fjnp.sub(ctx, lo, t)], axis=2)
    x = x.reshape(nl, n)
    if inverse:
        ninv = jnp.asarray(_n_inv_mont(ctx.fp.name, k))
        x = fjnp.mont_mul(ctx, x, ninv)
    return x


def ntt(ctx: FieldCtx, a):
    """Forward NTT: coefficients -> evaluations at powers of w (natural order)."""
    n = a.shape[-1]
    k = n.bit_length() - 1
    assert 1 << k == n, "size must be a power of two"
    assert k <= ctx.fp.s, f"domain 2^{k} exceeds field 2-adicity {ctx.fp.s}"
    if k == 0:
        return a
    return _ntt_core(ctx, a, k, inverse=False)


def intt(ctx: FieldCtx, a):
    """Inverse NTT: evaluations -> coefficients."""
    n = a.shape[-1]
    k = n.bit_length() - 1
    assert 1 << k == n, "size must be a power of two"
    if k == 0:
        return a
    return _ntt_core(ctx, a, k, inverse=True)


def apply_powers(ctx: FieldCtx, a, first: int, inc: int):
    """x_i *= first * inc^i (Fr.batchApplyKey; first/inc plain ints).

    Implemented as a log-depth prefix product over the batch axis.
    """
    fp = ctx.fp
    n = a.shape[-1]
    seq = [fp.to_mont(first)] + [fp.to_mont(inc)] * (n - 1)
    factors = jnp.asarray(fjnp.np_from_ints(fp, seq))
    powers = jax.lax.associative_scan(
        lambda x, y: fjnp.mont_mul(ctx, x, y), factors, axis=1
    )
    return fjnp.mont_mul(ctx, a, powers)


@functools.lru_cache(maxsize=None)
def _power_table(field_name: str, first: int, inc: int, n: int):
    """Host-computed (first*inc^i) Montgomery table for repeated shapes."""
    from ..fields.params import get_params

    fp = get_params(field_name)
    out, cur = [], first % fp.p
    for _ in range(n):
        out.append(fp.to_mont(cur))
        cur = cur * inc % fp.p
    return fjnp.np_from_ints(fp, out)


def coset_shift(ctx: FieldCtx, coeffs, inc: int | None = None):
    """Multiply coefficient i by inc^i, defaulting to the groth16 odd-coset
    increment (w[power+1] if available else Fr.shift — reference
    src/groth16_prove.js:64)."""
    n = coeffs.shape[-1]
    k = n.bit_length() - 1
    fp = ctx.fp
    if inc is None:
        inc = fp.w[k + 1] if k < fp.s else fp.shift
    return apply_powers(ctx, coeffs, 1, inc)


def extend_evaluations(ctx: FieldCtx, coeffs, factor: int = 4):
    """Zero-pad coefficients to factor*n and evaluate (Evaluations.fromPolynomial,
    reference src/polynomial/evaluations.js:30-37)."""
    nl, n = coeffs.shape
    pad = jnp.zeros((nl, (factor - 1) * n), dtype=coeffs.dtype)
    return ntt(ctx, jnp.concatenate([coeffs, pad], axis=1))
