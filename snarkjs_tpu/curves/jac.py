"""Branch-free vectorized Jacobian point arithmetic, generic over FOps.

Replaces the reference's per-point WASM curve engine (g1m_*/g2m_* symbols
driven from e.g. reference src/groth16_prove.js:106-120) with whole-array
kernels.  Points are pytrees (X, Y, Z) of field elements; Z == 0 encodes the
point at infinity.  All special cases (infinity operands, P == Q doubling,
P == -Q cancellation) are resolved with masks so the same compiled program
handles every lane — required under XLA's static-control-flow model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def jac_zero(f, batch_shape=()):
    return (f.zero(batch_shape), f.one(batch_shape), f.zero(batch_shape))


def from_affine(f, x, y, inf_mask=None):
    """Affine -> jacobian (Z=1); inf_mask marks points at infinity."""
    bs = f.batch_shape(x)
    one = f.one(bs)
    zero = f.zero(bs)
    if inf_mask is None:
        return (x, y, one)
    z = f.select(inf_mask, zero, one)
    return (x, y, z)


def is_inf(f, P):
    return f.is_zero(P[2])


def jac_neg(f, P):
    return (P[0], f.neg(P[1]), P[2])


def jac_dbl(f, P):
    """dbl-2007-bl (a=0): works for Y=0 only via mask (no such points on our
    curves), and maps infinity to infinity since Z3 = 2*Y1*Z1."""
    X1, Y1, Z1 = P
    A = f.sqr(X1)
    B = f.sqr(Y1)
    C = f.sqr(B)
    # D = 2*((X1+B)^2 - A - C)
    D = f.dbl(f.sub(f.sub(f.sqr(f.add(X1, B)), A), C))
    E = f.add(f.add(A, A), A)  # 3A
    F = f.sqr(E)
    X3 = f.sub(F, f.dbl(D))
    eightC = f.dbl(f.dbl(f.dbl(C)))
    Y3 = f.sub(f.mul(E, f.sub(D, X3)), eightC)
    Z3 = f.dbl(f.mul(Y1, Z1))
    return (X3, Y3, Z3)


def jac_add(f, P, Q):
    """add-2007-bl with full special-case handling via selects."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = f.sqr(Z1)
    Z2Z2 = f.sqr(Z2)
    U1 = f.mul(X1, Z2Z2)
    U2 = f.mul(X2, Z1Z1)
    S1 = f.mul(f.mul(Y1, Z2), Z2Z2)
    S2 = f.mul(f.mul(Y2, Z1), Z1Z1)
    H = f.sub(U2, U1)
    r = f.dbl(f.sub(S2, S1))

    I = f.sqr(f.dbl(H))
    J = f.mul(H, I)
    V = f.mul(U1, I)
    X3 = f.sub(f.sub(f.sqr(r), J), f.dbl(V))
    Y3 = f.sub(f.mul(r, f.sub(V, X3)), f.dbl(f.mul(S1, J)))
    # ((Z1+Z2)^2 - Z1Z1 - Z2Z2) = 2*Z1*Z2
    Z3 = f.mul(H, f.sub(f.sub(f.sqr(f.add(Z1, Z2)), Z1Z1), Z2Z2))

    inf1 = is_inf(f, P)
    inf2 = is_inf(f, Q)
    h_zero = f.is_zero(H)
    r_zero = f.is_zero(r)
    # same x, same y -> doubling; same x, opposite y -> infinity (Z3=0 already)
    dbl_case = h_zero & r_zero & ~inf1 & ~inf2
    D = jac_dbl(f, P)

    X3 = f.select(dbl_case, D[0], X3)
    Y3 = f.select(dbl_case, D[1], Y3)
    Z3 = f.select(dbl_case, D[2], Z3)

    X3 = f.select(inf2, X1, f.select(inf1, X2, X3))
    Y3 = f.select(inf2, Y1, f.select(inf1, Y2, Y3))
    Z3 = f.select(inf2, Z1, f.select(inf1, Z2, Z3))
    return (X3, Y3, Z3)


def jac_select(f, mask, P, Q):
    return tuple(f.select(mask, a, b) for a, b in zip(P, Q))


def batch_scalar_mul(f, P, scalar_bits):
    """k_i * P_i for a batch of points and per-point scalars.

    P: jacobian batch; scalar_bits: (nbits, N) uint32 0/1, most significant
    first.  Left-to-right double-and-add, lax.scan over bits (one add + one
    dbl in the compiled graph).  Used by ceremony batchApplyKey-style ops and
    setup key generation.
    """
    bs = f.batch_shape(P[0])

    def step(acc, bits):
        acc = jac_dbl(f, acc)
        added = jac_add(f, acc, P)
        return jac_select(f, bits != 0, added, acc), None

    acc0 = jac_zero(f, bs)
    acc, _ = jax.lax.scan(step, acc0, scalar_bits)
    return acc


def batch_scalar_mul_limbs(f, P, limbs, nbits):
    """k_i * P_i with per-point scalars given as (NL, *batch) 16-bit limbs.

    Extracts each bit inside the fori_loop body (dynamic limb index +
    shift), so no (nbits, *batch) bit array is ever materialized — at
    2^24-point group NTTs that array alone would be tens of GB."""
    bs = f.batch_shape(P[0])

    def body(i, acc):
        bitpos = nbits - 1 - i
        li = bitpos // 16
        sh = bitpos % 16
        limb = jax.lax.dynamic_index_in_dim(limbs, li, 0, keepdims=False)
        bit = (limb >> sh.astype(limb.dtype)) & 1
        acc = jac_dbl(f, acc)
        added = jac_add(f, acc, P)
        return jac_select(f, bit != 0, added, acc)

    acc0 = jac_zero(f, bs)
    return jax.lax.fori_loop(0, nbits, body, acc0)


def scalar_bits_from_limbs(scalars, nbits):
    """(NL, N) 16-bit limb scalars -> (nbits, N) bit array, MSB first."""
    nl, n = scalars.shape
    limb_idx = (nbits - 1 - jnp.arange(nbits)) // 16
    bit_idx = (nbits - 1 - jnp.arange(nbits)) % 16
    limbs = scalars[limb_idx]            # (nbits, N)
    return (limbs >> bit_idx[:, None]) & 1


def to_affine_batch(f, P, batch_inv_fn):
    """Jacobian -> affine ((x, y, inf)) using one batched inversion.

    batch_inv_fn(elem) must invert a field-element batch (zeros -> zeros).
    """
    X, Y, Z = P
    inf = is_inf(f, P)
    zi = batch_inv_fn(Z)
    zi2 = f.sqr(zi)
    zi3 = f.mul(zi2, zi)
    x = f.mul(X, zi2)
    y = f.mul(Y, zi3)
    zero = jac_zero(f, f.batch_shape(X))[0]
    x = f.select(inf, zero, x)
    y = f.select(inf, zero, y)
    return x, y, inf
