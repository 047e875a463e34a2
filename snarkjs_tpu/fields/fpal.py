"""Pallas TPU kernels for prime-field arithmetic (the hot-path field engine).

Replaces the pure-XLA limb code in `fjnp` on TPU.  The XLA path has a fatal
tension on this backend: fully-unrolled limb chains compile pathologically
slowly (a single jac_add: >2 min), while `fori_loop` limb chains compile fast
but run ~1000x off the roofline because every iteration materializes a full
dynamic-update-slice copy of the big batch array.  Inside a Pallas kernel the
limb loops are real loops over VMEM tiles compiled by Mosaic: compile stays
seconds, runtime stays on the VPU.

Layout contract (same as fjnp): a field-element batch is a uint32 array of
shape (NL, B), 16-bit limbs, limb-major.  Kernels view it as (NL, B/128, 128)
— the batch lands on (sublane, lane) tiles, the limb axis is an untiled
leading axis so per-limb indexing is free.

Reference equivalence: ffjavascript's WASM Fr/Fq engine (use-sites reference
src/groth16_prove.js:66-101); all values in [0, p), Montgomery form where the
reference stores Montgomery (reference src/zkey_utils.js:174-179).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import LIMB_BITS, LIMB_MASK, FieldParams

LANE = 128
U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


def _limbs(v: int, nl: int):
    return tuple(np.uint32((v >> (LIMB_BITS * i)) & LIMB_MASK) for i in range(nl))


# ---------------------------------------------------------------- kernel gen


def _mm_body(nl, p_l, pinv_l, a, b):
    """Montgomery product of limb lists a, b (each nl tiles) -> limb list.

    Product-scanning with baked-in modulus constants; every value is a u32
    tile.  Column sums stay < 2^22 (<= 2*nl 16-bit terms), so carries are
    deferred to one propagation pass per phase.
    """
    # ---- phase 1: t = a*b (2nl columns, deferred carries)
    t_cols = _conv_full(a, b, nl)
    t = _carry(t_cols, 2 * nl)  # 2nl limbs + implicit zero top (a,b < p)

    # ---- phase 2: m = (t mod R) * (-p^-1) mod R (low nl columns only)
    m_cols = _conv_low(t[:nl], pinv_l, nl)
    m = _carry(m_cols, nl)

    # ---- phase 3: u = (t + m*p) / R
    u_cols = _conv_const_full(m, p_l, nl)
    for k in range(2 * nl):
        u_cols[k] = u_cols[k] + t[k]
    u = _carry(u_cols, 2 * nl + 1)
    res, carry = u[nl:2 * nl], u[2 * nl]
    return _cond_sub_p(res, carry, p_l, nl)


def _conv_full(a, b, nl):
    """Full 2nl-column product of two nl-limb lists (deferred carries)."""
    cols = [None] * (2 * nl)
    for k in range(2 * nl - 1):
        acc = cols[k]
        for i in range(max(0, k - nl + 1), min(k + 1, nl)):
            prod = a[i] * b[k - i]
            lo = prod & _MASK
            hi = prod >> LIMB_BITS
            acc = lo if acc is None else acc + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
        cols[k] = acc
    return cols


def _conv_low(a, c_l, nl):
    """Low nl columns of a * const (mod R)."""
    cols = [None] * nl
    for k in range(nl):
        acc = cols[k]
        for i in range(k + 1):
            cj = c_l[k - i]
            if int(cj) == 0:
                continue
            prod = a[i] * cj
            lo = prod & _MASK
            acc = lo if acc is None else acc + lo
            if k + 1 < nl:
                hi = prod >> LIMB_BITS
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
        cols[k] = acc
    # k+1 spill of the last column is discarded (mod R)
    return [c if c is not None else a[0] * np.uint32(0) for c in cols]


def _conv_const_full(a, c_l, nl):
    """Full 2nl-column product of nl-limb list a with constant limbs c_l."""
    cols = [None] * (2 * nl)
    for k in range(2 * nl - 1):
        acc = cols[k]
        for i in range(max(0, k - nl + 1), min(k + 1, nl)):
            cj = c_l[k - i]
            if int(cj) == 0:
                continue
            prod = a[i] * cj
            lo = prod & _MASK
            hi = prod >> LIMB_BITS
            acc = lo if acc is None else acc + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
        cols[k] = acc
    z = a[0] * np.uint32(0)
    return [c if c is not None else z for c in cols]


def _carry(cols, n):
    """Propagate carries over n columns; returns n limbs + final carry limb."""
    out = []
    carry = None
    for k in range(n):
        v = cols[k] if k < len(cols) and cols[k] is not None else None
        if carry is not None:
            v = carry if v is None else v + carry
        if v is None:
            v = cols[0] * np.uint32(0)
        out.append(v & _MASK)
        carry = v >> LIMB_BITS
    out.append(carry)
    return out


def _sub_chain(a, b, nl):
    """a - b limb lists with borrow; returns (limbs, borrow)."""
    base = np.uint32(1 << LIMB_BITS)
    out = []
    borrow = None
    for k in range(nl):
        d = a[k] + base - b[k]
        if borrow is not None:
            d = d - borrow
        out.append(d & _MASK)
        borrow = np.uint32(1) - (d >> LIMB_BITS)
    return out, borrow


def _add_chain(a, b, nl):
    out = []
    carry = None
    for k in range(nl):
        v = a[k] + b[k]
        if carry is not None:
            v = v + carry
        out.append(v & _MASK)
        carry = v >> LIMB_BITS
    return out, carry


def _cond_sub_p(res, carry, p_l, nl):
    """Reduce carry*R + res (< 2p) into [0, p)."""
    pt = [jnp.full_like(res[0], p) for p in p_l]
    diff, borrow = _sub_chain(res, pt, nl)
    use_diff = (carry + np.uint32(1) - borrow) >= np.uint32(1)
    return [jnp.where(use_diff, d, r) for d, r in zip(diff, res)]


def _mm_const_body(nl, p_l, pinv_l, a, c_l):
    """Montgomery product of limb-list a with a *constant* (baked limbs c_l,
    Montgomery form).  Same structure as _mm_body with phase 1 constant."""
    t_cols = _conv_const_full(a, c_l, nl)
    t = _carry(t_cols, 2 * nl)
    m_cols = _conv_low(t[:nl], pinv_l, nl)
    m = _carry(m_cols, nl)
    u_cols = _conv_const_full(m, p_l, nl)
    for k in range(2 * nl):
        u_cols[k] = u_cols[k] + t[k]
    u = _carry(u_cols, 2 * nl + 1)
    return _cond_sub_p(u[nl:2 * nl], u[2 * nl], p_l, nl)


def _mod_add_body(p_l, a, b, nl):
    s, carry = _add_chain(a, b, nl)
    return _cond_sub_p(s, carry, p_l, nl)


def _mod_sub_body(p_l, a, b, nl):
    d, borrow = _sub_chain(a, b, nl)
    pt = [jnp.full_like(a[0], p) for p in p_l]
    fixed, _ = _add_chain(d, pt, nl)
    need_fix = borrow == np.uint32(1)
    return [jnp.where(need_fix, x, y) for x, y in zip(fixed, d)]


class KernelField:
    """FOps-style adapter for use *inside* Pallas kernels.

    Elements are stacked (nl, *tile) u32 values.  Multiplication runs as
    fori_loops over VMEM scratch refs (Mosaic compile time is superlinear in
    static instruction count, and the loop form also measured *faster* than
    the fully unrolled form: 441M vs 295M mults/s on v5e for bn254 Fq).
    The kernel must allocate scratch via `KernelField.scratch_shapes(...)`
    and hand the refs to the constructor.

    Mirrors curves.gops.FqOps closely enough that the generic RCB formulas
    (curves.rcb) trace directly inside a kernel body.
    """

    def __init__(self, fp: FieldParams, tile, scratch):
        self.fp = fp
        self.nl = fp.nl
        self.tile = tuple(tile)
        self.p_l = [int(x) for x in _limbs(fp.p, fp.nl)]
        self.pinv_l = [int(x) for x in _limbs(fp.pinv_neg, fp.nl)]
        self.one_l = [int(x) for x in _limbs(fp.one_mont, fp.nl)]
        # scratch: (abuf, t_cols, m_cols, u_cols) refs
        self.abuf, self.tc, self.mc, self.uc = scratch

    @staticmethod
    def scratch_shapes(fp: FieldParams, tile):
        import jax.numpy as _jnp
        from jax.experimental.pallas import tpu as _pltpu

        nl = fp.nl
        return [
            _pltpu.VMEM((nl,) + tuple(tile), _jnp.uint32),
            _pltpu.VMEM((2 * nl + 1,) + tuple(tile), _jnp.uint32),
            _pltpu.VMEM((2 * nl + 1,) + tuple(tile), _jnp.uint32),
            _pltpu.VMEM((2 * nl + 1,) + tuple(tile), _jnp.uint32),
        ]

    def _const(self, ls):
        return jnp.stack([jnp.full(self.tile, v, dtype=jnp.uint32) for v in ls])

    def _conv_into(self, get_ai, b, cols_ref):
        nl = self.nl

        def body(i, _):
            prod = get_ai(i)[None] * b
            lo = prod & _MASK
            hi = prod >> LIMB_BITS
            cols_ref[pl.ds(i, nl)] = cols_ref[pl.ds(i, nl)] + lo
            cols_ref[pl.ds(i + 1, nl)] = cols_ref[pl.ds(i + 1, nl)] + hi
            return 0

        jax.lax.fori_loop(0, nl, body, 0)

    def _carry(self, ref, n, extra_ref=None):
        def body(k, carry):
            v = ref[k] + carry
            if extra_ref is not None:
                v = v + extra_ref[k]
            ref[k] = v & _MASK
            return v >> LIMB_BITS

        return jax.lax.fori_loop(0, n, body,
                                 jnp.zeros(self.tile, dtype=jnp.uint32))

    def _mul_impl(self, a, bval):
        nl = self.nl
        z = jnp.zeros((2 * nl + 1,) + self.tile, dtype=jnp.uint32)
        self.abuf[...] = a
        self.tc[...] = z
        self._conv_into(lambda i: self.abuf[i], bval, self.tc)
        self._carry(self.tc, 2 * nl)
        self.mc[...] = z
        pinv = self._const(self.pinv_l)
        self._conv_into(lambda i: self.tc[i], pinv, self.mc)
        self._carry(self.mc, nl)
        self.uc[...] = z
        pv = self._const(self.p_l)

        def body3(i, _):
            prod = self.mc[i][None] * pv
            lo = prod & _MASK
            hi = prod >> LIMB_BITS
            self.uc[pl.ds(i, nl)] = self.uc[pl.ds(i, nl)] + lo
            self.uc[pl.ds(i + 1, nl)] = self.uc[pl.ds(i + 1, nl)] + hi
            return 0

        jax.lax.fori_loop(0, nl, body3, 0)
        topc = self._carry(self.uc, 2 * nl, extra_ref=self.tc)
        res = [self.uc[nl + i] for i in range(nl)]
        pt = [jnp.full(self.tile, v, dtype=jnp.uint32) for v in self.p_l]
        d, borrow = _sub_chain(res, pt, nl)
        use = (topc + np.uint32(1) - borrow) >= np.uint32(1)
        return jnp.stack(
            [jnp.where(use, x, y) for x, y in zip(d, res)])

    def mul(self, a, b):
        return self._mul_impl(a, b)

    def mul_const(self, a, c_l):
        return self._mul_impl(a, self._const([int(x) for x in c_l]))

    def _unstack(self, a):
        return [a[i] for i in range(self.nl)]

    def add(self, a, b):
        out = _mod_add_body(self.p_l, self._unstack(a), self._unstack(b),
                            self.nl)
        return jnp.stack(out)

    def sub(self, a, b):
        out = _mod_sub_body(self.p_l, self._unstack(a), self._unstack(b),
                            self.nl)
        return jnp.stack(out)

    def select(self, mask, a, b):
        return jnp.where(mask, a, b)

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return self._const(self.one_l)


class KernelField2:
    """Fq2 = Fq[u]/(u^2+1) adapter over KernelField (Karatsuba, 3 muls)."""

    def __init__(self, kf: KernelField):
        self.kf = kf

    def mul(self, a, b):
        kf = self.kf
        m0 = kf.mul(a[0], b[0])
        m1 = kf.mul(a[1], b[1])
        m2 = kf.mul(kf.add(a[0], a[1]), kf.add(b[0], b[1]))
        return (kf.sub(m0, m1), kf.sub(m2, kf.add(m0, m1)))

    def mul_const(self, a, c2_l):
        kf = self.kf
        c0, c1 = c2_l
        m0 = kf.mul_const(a[0], c0)
        m1 = kf.mul_const(a[1], c1)
        m2a = kf.mul_const(a[0], c1)
        m2b = kf.mul_const(a[1], c0)
        return (kf.sub(m0, m1), kf.add(m2a, m2b))

    def add(self, a, b):
        return (self.kf.add(a[0], b[0]), self.kf.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.kf.sub(a[0], b[0]), self.kf.sub(a[1], b[1]))

    def select(self, mask, a, b):
        return (self.kf.select(mask, a[0], b[0]),
                self.kf.select(mask, a[1], b[1]))

    def zero_like(self, a):
        return (self.kf.zero_like(a[0]), self.kf.zero_like(a[0]))

    def one_like(self, a):
        return (self.kf.one_like(a[0]), self.kf.zero_like(a[0]))


# ------------------------------------------------------------- pallas wrap


def _pick_bs(nl: int, n_ops: int, want_bs: int = 256) -> int:
    """Sublane block size: bounded so VMEM stays comfortable."""
    # per limb-tile bytes = bs*128*4; ops ~ n_ops arrays of nl limbs live
    while want_bs > 8 and want_bs * LANE * 4 * nl * n_ops > 6 * 2**20:
        want_bs //= 2
    return want_bs


class PalField:
    """Per-field compiled Pallas kernels, keyed by (op, batch-shape bucket)."""

    def __init__(self, fp: FieldParams):
        self.fp = fp
        self.nl = fp.nl
        self.p_l = _limbs(fp.p, fp.nl)
        self.pinv_l = _limbs(fp.pinv_neg, fp.nl)
        self.r2_l = _limbs(fp.R2, fp.nl)
        self.one_l = _limbs(fp.one_mont, fp.nl)

    # -- kernels ----------------------------------------------------------

    def _mm_kernel(self, a_ref, b_ref, o_ref):
        nl = self.nl
        a = [a_ref[i] for i in range(nl)]
        b = [b_ref[i] for i in range(nl)]
        out = _mm_body(nl, self.p_l, self.pinv_l, a, b)
        for i in range(nl):
            o_ref[i] = out[i]

    def _add_kernel(self, a_ref, b_ref, o_ref):
        nl = self.nl
        s, carry = _add_chain([a_ref[i] for i in range(nl)],
                              [b_ref[i] for i in range(nl)], nl)
        out = _cond_sub_p(s, carry, self.p_l, nl)
        for i in range(nl):
            o_ref[i] = out[i]

    def _sub_kernel(self, a_ref, b_ref, o_ref):
        nl = self.nl
        a = [a_ref[i] for i in range(nl)]
        b = [b_ref[i] for i in range(nl)]
        d, borrow = _sub_chain(a, b, nl)
        pt = [jnp.full_like(a[0], p) for p in self.p_l]
        fixed, _ = _add_chain(d, pt, nl)
        need_fix = borrow == np.uint32(1)
        for i in range(nl):
            o_ref[i] = jnp.where(need_fix, fixed[i], d[i])

    def _neg_kernel(self, a_ref, o_ref):
        nl = self.nl
        a = [a_ref[i] for i in range(nl)]
        pt = [jnp.full_like(a[0], p) for p in self.p_l]
        d, _ = _sub_chain(pt, a, nl)
        az = a[0] == 0
        for i in range(1, nl):
            az = az & (a[i] == 0)
        z = jnp.zeros_like(a[0])
        for i in range(nl):
            o_ref[i] = jnp.where(az, z, d[i])

    # -- public elementwise ops (shape (NL, *batch)) ----------------------

    def _prep(self, x, shape, nl, blk, Bp):
        B = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        x2 = jnp.broadcast_to(x, shape).reshape(nl, B)
        if Bp != B:
            x2 = jnp.pad(x2, ((0, 0), (0, Bp - B)))
        return x2.reshape(nl, Bp // LANE, LANE)

    def _run(self, kernel, args, n_ops, scratch=None):
        nl = self.nl
        shape = jnp.broadcast_shapes(*[a.shape for a in args])
        B = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        bs = _pick_bs(nl, n_ops)
        blk = bs * LANE
        # bucket the padded size to powers of two so the number of distinct
        # compiled programs per op stays logarithmic in problem size
        nblk = max(1, -(-B // blk))
        nblk = 1 << (nblk - 1).bit_length()
        Bp = nblk * blk
        prepped = [self._prep(a, shape, nl, blk, Bp) for a in args]
        spec = pl.BlockSpec((nl, bs, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[spec] * len(args),
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((nl, Bp // LANE, LANE), jnp.uint32),
            scratch_shapes=scratch or [],
        )(*prepped)
        return out.reshape(nl, Bp)[:, :B].reshape(shape)

    def _mm_kernel_fori(self, a_ref, b_ref, o_ref, *fsc):
        bs = a_ref.shape[1]
        kf = KernelField(self.fp, (bs, LANE), fsc)
        o_ref[...] = kf.mul(a_ref[...], b_ref[...])

    def mont_mul(self, a, b):
        bs = _pick_bs(self.nl, 8)
        scratch = KernelField.scratch_shapes(self.fp, (bs, LANE))
        return self._run(self._mm_kernel_fori, (a, b), n_ops=8,
                         scratch=scratch)

    def add(self, a, b):
        return self._run(self._add_kernel, (a, b), n_ops=4)

    def sub(self, a, b):
        return self._run(self._sub_kernel, (a, b), n_ops=4)

    def neg(self, a):
        return self._run(self._neg_kernel, (a,), n_ops=4)


@functools.lru_cache(maxsize=None)
def get_pal(fp: FieldParams) -> PalField:
    return PalField(fp)
