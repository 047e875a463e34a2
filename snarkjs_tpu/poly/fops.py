"""Vectorized polynomial operations over Fr (device-side).

TPU-first replacements for the reference's byte-buffer Polynomial class
(reference src/polynomial/polynomial.js): every serial coefficient loop
becomes either an elementwise kernel, a log-depth scan, or a tiny reshaped
cumulative operation.

Conventions: coefficient/evaluation arrays are (NL, n) Montgomery limb-major
uint32; scalars are passed as (NL, 1) Montgomery arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fjnp
from ..fields.fjnp import FieldCtx


def scalar_arr(ctx: FieldCtx, v: int):
    """Plain int -> (NL, 1) Montgomery device constant."""
    return jnp.asarray(fjnp.np_from_ints(ctx.fp, [ctx.fp.to_mont(v % ctx.fp.p)]))


def powers_of(ctx: FieldCtx, x_mont, n: int):
    """[1, x, x^2, ..., x^(n-1)] as (NL, n) Montgomery (log-depth scan)."""
    one = ctx.one((1,))
    seq = jnp.concatenate([one, jnp.broadcast_to(x_mont, (ctx.nl, n - 1))], axis=1)
    return jax.lax.associative_scan(lambda a, b: fjnp.mont_mul(ctx, a, b), seq,
                                    axis=1)


def field_sum(ctx: FieldCtx, arr):
    """Exact sum of Montgomery elements along axis 1 -> (NL, 1).

    Chunked limb-wise uint32 sums (chunks of 2^14 keep limb sums < 2^30),
    reduced with wide carries between levels.
    """
    from ..protocols.groth16 import reduce_wide

    x = arr
    while x.shape[1] > 1:
        n = x.shape[1]
        chunk = min(1 << 14, n)
        pad = (-n) % chunk
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        # uint32-safe: 2^14 limbs of < 2^16 sum to < 2^30
        x = x.reshape(ctx.nl, -1, chunk).sum(axis=2)
        limbs, carry = fjnp._carry_prop(x)
        x = reduce_wide(ctx, limbs, carry)
    return x


def poly_eval(ctx: FieldCtx, coefs, x_plain: int):
    """P(x) for a plain int x; returns plain int (host)."""
    n = coefs.shape[1]
    pw = powers_of(ctx, scalar_arr(ctx, x_plain), n)
    s = field_sum(ctx, fjnp.mont_mul(ctx, coefs, pw))
    v = fjnp.np_to_ints(ctx.fp, np.asarray(fjnp.from_mont(ctx, s)))[0]
    return v


def div_zh(ctx: FieldCtx, coefs, n: int):
    """Divide a 4n-coefficient polynomial by Z_H = X^n - 1 in place semantics
    (reference polynomial.js divZh :592-615): out = -cumsum over the 4 blocks
    of n coefficients.  Returns the 4n array whose top block must be ~zero."""
    nl, total = coefs.shape
    k = total // n
    blocks = coefs.reshape(nl, k, n)
    out = []
    acc = None
    for i in range(k):
        acc = blocks[:, i] if acc is None else fjnp.add(ctx, acc, blocks[:, i])
        out.append(fjnp.neg(ctx, acc))
    return jnp.stack(out, axis=1).reshape(nl, total)


def div_by_x_minus(ctx: FieldCtx, coefs, xi_mont):
    """Synthetic division by (X - xi): returns quotient of same length with a
    zero top coefficient (exact division asserted by caller via remainder).

    q_i = sum_{j>i} c_j xi^(j-i-1), computed as a suffix scan:
      q_i = xi^(-i-1) * S_i,  S_i = sum_{j>i} c_j xi^j.
    To avoid inversions: q_i = suffix-scan with multiplier — implemented as a
    reversed prefix-scan of the pair op (s, c) -> s*xi + c (associative via
    affine composition).
    """
    nl, n = coefs.shape

    # affine composition scan: element i holds (m_i, a_i) meaning f_i(s) =
    # m_i*s + a_i; composing left-to-right over reversed coefficients gives
    # the Horner prefix q values.
    rev = jnp.flip(coefs, axis=1)
    m = jnp.broadcast_to(xi_mont, (nl, n))

    def op(l, r):
        # l then r: f(s) = r_m*(l_m*s + l_a) + r_a
        lm, la = l
        rm, ra = r
        return (fjnp.mont_mul(ctx, lm, rm),
                fjnp.add(ctx, fjnp.mont_mul(ctx, rm, la), ra))

    ms, as_ = jax.lax.associative_scan(op, (m, rev), axis=1)
    # as_[k] = horner value after consuming rev[0..k] = sum_j rev[j]*xi^(k-j)
    # quotient coefficient q_{n-1-k} = as_[k-1]... the Horner quotient:
    # q_{n-1-k} for k>=1 equals as_[k-1]; remainder = as_[n-1].
    horner = as_
    q_rev = jnp.concatenate(
        [jnp.zeros((nl, 1), jnp.uint32), horner[:, :-1]], axis=1)
    q = jnp.flip(q_rev, axis=1)
    rem = horner[:, -1:]
    return q, rem


def shift_coefs(ctx: FieldCtx, coefs, k: int):
    """Multiply by X^k (prepend k zero coefficients)."""
    nl = coefs.shape[0]
    return jnp.concatenate([jnp.zeros((nl, k), jnp.uint32), coefs], axis=1)


def pad_to(coefs, n: int):
    nl, m = coefs.shape
    if m >= n:
        return coefs[:, :n]
    return jnp.concatenate([coefs, jnp.zeros((nl, n - m), coefs.dtype)], axis=1)


def div_by_zerofier(ctx: FieldCtx, coefs, m: int, beta_plain: int):
    """Exact division by (X^m - beta) (reference polynomial.js
    divByZerofier :617-674).  Returns an array of the same length whose top
    m coefficients are zero when the division is exact.

    Recurrence q_k = (q_{k-m} - p_k) * beta^{-1} runs independently per
    residue class mod m; along each chain it is the affine map
    q_j = q_{j-1}*binv - p_j*binv, computed with a log-depth
    affine-composition scan.
    """
    fp = ctx.fp
    nl, total = coefs.shape
    binv = pow(beta_plain % fp.p, fp.p - 2, fp.p)
    binv_m = scalar_arr(ctx, binv)

    nblk = -(-total // m)
    pad = nblk * m - total
    x = coefs
    if pad:
        x = jnp.concatenate([x, jnp.zeros((nl, pad), jnp.uint32)], axis=1)
    # chains: index k = j*m + r  ->  (NL, nblk, m), scan over j (axis 1)
    xb = x.reshape(nl, nblk, m)
    a = fjnp.neg(ctx, fjnp.mont_mul(ctx, xb, binv_m[:, :, None]))
    mm = jnp.broadcast_to(binv_m[:, :, None], a.shape)

    def op(l, r):
        lm, la = l
        rm, ra = r
        return (fjnp.mont_mul(ctx, lm, rm),
                fjnp.add(ctx, fjnp.mont_mul(ctx, rm, la), ra))

    _, q = jax.lax.associative_scan(op, (mm, a), axis=1)
    return q.reshape(nl, nblk * m)[:, :total]


def lagrange_interp_host(fp, xs, ys):
    """Small Lagrange interpolation on host bigints (reference
    polynomial.js:896-930).  Returns plain-int coefficient list."""
    p = fp.p
    n = len(xs)
    coefs = [0] * n
    for i in range(n):
        # numerator poly prod_{j!=i} (X - x_j)
        num = [1]
        for j in range(n):
            if j == i:
                continue
            new = [0] * (len(num) + 1)
            for k, c in enumerate(num):
                new[k + 1] = (new[k + 1] + c) % p
                new[k] = (new[k] - c * xs[j]) % p
            num = new
        den = 1
        for j in range(n):
            if j != i:
                den = den * (xs[i] - xs[j]) % p
        scale = ys[i] * pow(den, p - 2, p) % p
        for k in range(len(num)):
            coefs[k] = (coefs[k] + num[k] * scale) % p
    return coefs


def zerofier_host(fp, roots):
    """prod (X - r_i) expanded on host bigints (polynomial.js:932-948)."""
    p = fp.p
    coefs = [1]
    for r in roots:
        new = [0] * (len(coefs) + 1)
        for k, c in enumerate(coefs):
            new[k + 1] = (new[k + 1] + c) % p
            new[k] = (new[k] - c * r) % p
        coefs = new
    return coefs


def add_many(ctx: FieldCtx, terms, length: int):
    """sum of [(coefs, weight_mont_or_None), ...] padded to `length`."""
    acc = None
    for coefs, w in terms:
        c = pad_to(coefs, length)
        if w is not None:
            c = fjnp.mont_mul(ctx, c, w)
        acc = c if acc is None else fjnp.add(ctx, acc, c)
    return acc
