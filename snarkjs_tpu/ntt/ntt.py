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


def _use_mxu(k: int) -> bool:
    """Route big transforms through the MXU matmul NTT on TPU.

    Small sizes keep the butterfly path: per-shape compile cost of the
    matmul pipeline isn't worth it below ~2^12.
    """
    import os

    env = os.environ.get("SNARKJS_TPU_MXU_NTT")
    if env is not None:
        return env not in ("0", "false") and k >= 1
    return fjnp._use_pallas() and k >= 12


def ntt(ctx: FieldCtx, a):
    """Forward NTT: coefficients -> evaluations at powers of w (natural order)."""
    n = a.shape[-1]
    k = n.bit_length() - 1
    assert 1 << k == n, "size must be a power of two"
    assert k <= ctx.fp.s, f"domain 2^{k} exceeds field 2-adicity {ctx.fp.s}"
    if k == 0:
        return a
    if _use_mxu(k):
        from . import ntt_mxu

        return ntt_mxu.ntt(ctx, a)
    return _ntt_core(ctx, a, k, inverse=False)


def intt(ctx: FieldCtx, a):
    """Inverse NTT: evaluations -> coefficients."""
    n = a.shape[-1]
    k = n.bit_length() - 1
    assert 1 << k == n, "size must be a power of two"
    if k == 0:
        return a
    if _use_mxu(k):
        from . import ntt_mxu

        return ntt_mxu.intt(ctx, a)
    return _ntt_core(ctx, a, k, inverse=True)


@functools.lru_cache(maxsize=None)
def _power_blocks(field_name: str, first: int, inc: int, n: int):
    """Host tables for powers first*inc^i via a b x b outer product:
    lo[j] = first*inc^j (j < b), hi[i] = inc^(b*i).  Device cost: one
    elementwise Montgomery multiply instead of a log-depth scan."""
    from ..fields.params import get_params

    fp = get_params(field_name)
    b = 1 << ((n.bit_length()) // 2 if n > 1 else 0)
    b = max(1, min(b, n))
    nhi = -(-n // b)
    lo, cur = [], first % fp.p
    for _ in range(b):
        lo.append(fp.to_mont(cur))
        cur = cur * inc % fp.p
    inc_b = pow(inc, b, fp.p)
    hi, cur = [], 1
    for _ in range(nhi):
        hi.append(fp.to_mont(cur))
        cur = cur * inc_b % fp.p
    return b, fjnp.np_from_ints(fp, lo), fjnp.np_from_ints(fp, hi)


def apply_powers(ctx: FieldCtx, a, first: int, inc: int):
    """x_i *= first * inc^i (Fr.batchApplyKey; first/inc plain ints).

    Implemented as an outer product of two sqrt(n)-sized host tables:
    power[i*b+j] = hi[i]*lo[j], one Montgomery multiply on device, then
    one more against the data (reference src/groth16_prove.js:67).
    """
    fp = ctx.fp
    n = a.shape[-1]
    b, lo, hi = _power_blocks(fp.name, first % fp.p, inc % fp.p, n)
    nhi = -(-n // b)
    loj = jnp.asarray(lo).reshape(ctx.nl, 1, b)
    hij = jnp.asarray(hi).reshape(ctx.nl, nhi, 1)
    powers = fjnp.mont_mul(ctx, hij, loj).reshape(ctx.nl, nhi * b)[:, :n]
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


# --------- one level beyond the field's 2-adicity (size 2^(s+1)) ---------

def _mont_scalar(ctx: FieldCtx, v: int):
    fp = ctx.fp
    return jnp.asarray(fjnp.np_from_int(fp, fp.to_mont(v % fp.p))).reshape(
        fp.nl, 1)


def intt_union(ctx: FieldCtx, a, s_log: int | None = None,
               shift: int | None = None):
    """Inverse transform of size 2m = 2^(slog+1) over the UNION domain
    D = H ∪ shift*H (H = the 2^slog roots of unity) — the reference's
    shift decomposition for sizes one level past the field's 2-adicity
    (algorithm at reference src/powersoftau_preparephase2.js:91-138;
    size guard src/groth16_prove.js:64).

        t0_i = (t_i*shift^m - t_{m+i}) / (shift^m - 1)
        t1_i = (t_{m+i} - t_i) * shift^-i / (shift^m - 1)
        out  = [intt(t0), intt(t1)]

    a: (NL, 2m) evaluations [f(w^i)..., f(shift*w^i)...], Montgomery.
    Returns the two coefficient blocks concatenated, the exact section
    layout the reference's preparePhase2 would write at power s+1.
    """
    fp = ctx.fp
    s_log = fp.s if s_log is None else s_log
    shift = fp.shift if shift is None else shift
    n = a.shape[-1]
    m = n // 2
    assert m == 1 << s_log, "size must be 2^(s_log+1)"
    p = fp.p
    S = pow(shift, m, p)
    d = pow((S - 1) % p, p - 2, p)
    t, tm = a[:, :m], a[:, m:]
    Sm = _mont_scalar(ctx, S)
    dm = _mont_scalar(ctx, d)
    t0 = fjnp.mont_mul(ctx, fjnp.sub(ctx, fjnp.mont_mul(ctx, t, Sm), tm), dm)
    sinv = pow(shift, p - 2, p)
    t1 = apply_powers(ctx, fjnp.sub(ctx, tm, t), d, sinv)
    return jnp.concatenate([intt(ctx, t0), intt(ctx, t1)], axis=-1)


def ntt_union(ctx: FieldCtx, a, s_log: int | None = None,
              shift: int | None = None):
    """Forward counterpart of intt_union: coefficient blocks [c0, c1] ->
    evaluations on H ∪ shift*H:  t_i = u_i + shift^i*v_i,
    t_{m+i} = u_i + shift^m*shift^i*v_i  with u = ntt(c0), v = ntt(c1)."""
    fp = ctx.fp
    s_log = fp.s if s_log is None else s_log
    shift = fp.shift if shift is None else shift
    n = a.shape[-1]
    m = n // 2
    assert m == 1 << s_log, "size must be 2^(s_log+1)"
    S = pow(shift, m, fp.p)
    u = ntt(ctx, a[:, :m])
    v = apply_powers(ctx, ntt(ctx, a[:, m:]), 1, shift)
    t = fjnp.add(ctx, u, v)
    tm = fjnp.add(ctx, u, fjnp.mont_mul(ctx, v, _mont_scalar(ctx, S)))
    return jnp.concatenate([t, tm], axis=-1)
