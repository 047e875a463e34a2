"""Vectorized base-field adapters for curve point kernels.

`FOps` is the element-arithmetic interface the jacobian/MSM kernels are
generic over: G1 uses plain Fq (`FqOps`), G2 uses the quadratic extension
(`Fq2Ops`, Karatsuba: 3 Montgomery muls per product, u^2 = -1 for both
supported curves).  Elements are pytrees: an Fq element is a (NL, *batch)
uint32 array; an Fq2 element is a 2-tuple of them.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import fjnp
from ..fields.fjnp import FieldCtx


class FqOps:
    def __init__(self, ctx: FieldCtx):
        self.ctx = ctx
        self.nl = ctx.nl

    def add(self, a, b):
        return fjnp.add(self.ctx, a, b)

    def sub(self, a, b):
        return fjnp.sub(self.ctx, a, b)

    def neg(self, a):
        return fjnp.neg(self.ctx, a)

    def mul(self, a, b):
        return fjnp.mont_mul(self.ctx, a, b)

    def sqr(self, a):
        return fjnp.mont_mul(self.ctx, a, a)

    def dbl(self, a):
        return fjnp.add(self.ctx, a, a)

    def is_zero(self, a):
        return fjnp.is_zero(self.ctx, a)

    def zero(self, batch_shape=()):
        return self.ctx.zero(batch_shape)

    def one(self, batch_shape=()):
        return self.ctx.one(batch_shape)

    def select(self, mask, a, b):
        """mask: batch-shaped bool; where(mask, a, b)."""
        return jnp.where(mask[None, ...], a, b)

    def batch_shape(self, a):
        return a.shape[1:]

    def gather(self, a, idx):
        return a[:, idx]

    def stack_last(self, elems):
        return jnp.stack(elems, axis=-1)

    def batch_inv(self, a):
        return fjnp.batch_inverse(self.ctx, a, axis=-1)


class Fq2Ops:
    """Fq2 = Fq[u]/(u^2+1) — holds for bn254 and bls12-381 base fields."""

    def __init__(self, ctx: FieldCtx):
        self.ctx = ctx
        self.fq = FqOps(ctx)
        self.nl = ctx.nl

    def add(self, a, b):
        return (self.fq.add(a[0], b[0]), self.fq.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.fq.sub(a[0], b[0]), self.fq.sub(a[1], b[1]))

    def neg(self, a):
        return (self.fq.neg(a[0]), self.fq.neg(a[1]))

    def mul(self, a, b):
        m0 = self.fq.mul(a[0], b[0])
        m1 = self.fq.mul(a[1], b[1])
        m2 = self.fq.mul(self.fq.add(a[0], a[1]), self.fq.add(b[0], b[1]))
        re = self.fq.sub(m0, m1)
        im = self.fq.sub(m2, self.fq.add(m0, m1))
        return (re, im)

    def sqr(self, a):
        # (a0+a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
        re = self.fq.mul(self.fq.add(a[0], a[1]), self.fq.sub(a[0], a[1]))
        im = self.fq.dbl(self.fq.mul(a[0], a[1]))
        return (re, im)

    def dbl(self, a):
        return (self.fq.dbl(a[0]), self.fq.dbl(a[1]))

    def is_zero(self, a):
        return self.fq.is_zero(a[0]) & self.fq.is_zero(a[1])

    def zero(self, batch_shape=()):
        return (self.fq.zero(batch_shape), self.fq.zero(batch_shape))

    def one(self, batch_shape=()):
        return (self.fq.one(batch_shape), self.fq.zero(batch_shape))

    def select(self, mask, a, b):
        return (self.fq.select(mask, a[0], b[0]), self.fq.select(mask, a[1], b[1]))

    def batch_shape(self, a):
        return a[0].shape[1:]

    def gather(self, a, idx):
        return (a[0][:, idx], a[1][:, idx])

    def stack_last(self, elems):
        return (jnp.stack([e[0] for e in elems], axis=-1),
                jnp.stack([e[1] for e in elems], axis=-1))

    def batch_inv(self, a):
        # (a0 + a1 u)^-1 = (a0 - a1 u) / (a0^2 + a1^2)
        norm = self.fq.add(self.fq.sqr(a[0]), self.fq.sqr(a[1]))
        t = self.fq.batch_inv(norm)
        return (self.fq.mul(a[0], t), self.fq.neg(self.fq.mul(a[1], t)))
