"""Fused TPU MSM: sorted suffix-scan Pippenger over Pallas kernels.

Replaces ffjavascript's g1m_multiexpAffine worker MSM (the Groth16 prover
hot spot, reference src/groth16_prove.js:85-101) with a design picked by
measurement on TPU v5e:

  * XLA's radix sort is fast (~0.4 ms for 2^20 int32) and row-major gathers
    are serviceable, while column gathers, wide-payload gathers and scatters
    are pathological (100-1000x off bandwidth).  So the only data-movement
    ops used are ONE argsort + ONE row gather per window.
  * Per-lane dynamic indexing does not exist on the VPU, so classic bucket
    scatter/accumulate is replaced by the suffix-sum identity

        sum_b b*B_b = sum_{t=1}^{nb-1} SuffixSum(first_index(t)).

    To avoid even the nb-position gather of suffix values, one *phantom*
    generator point is appended per digit value 1..nb-1, so every digit
    occurs and "first_index(t)" becomes exactly the set of first-occurrence
    positions — a 0/1 mask computable by comparing sorted neighbors.  The
    kernel then accumulates masked suffix values on the fly, and the host
    subtracts the known phantom contribution sum_b b*G = nb(nb-1)/2 * G.
  * The scan kernel (K1) owns everything per window: lanes scan contiguous
    chunks of the sorted order high->low, the running point and the masked
    accumulator live in VMEM scratch, and the addition is the complete RCB
    formula (curves/rcb.py) — branch-free, so doubling/identity/duplicate
    lanes cost nothing extra.  Cross-lane carries are fixed up with a
    log-depth batched pass over all windows at once, weighted by per-lane
    mask counts via bit-plane decomposition.

Window size c = 16 bits == one scalar limb, so digits are just the scalar
limbs (nw = 16 windows for a 254/255-bit field).  Window combination (16
doublings + add per window) happens on host bigints, exactly like the
reference combines per-chunk WASM results on the JS side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import fjnp, fpal
from ..fields.params import FieldParams, LIMB_BITS
from . import rcb

U32 = jnp.uint32
LN = 128   # lanes
SB = 32    # sublanes per lane-tile => R = SB*LN = 4096 scan lanes
R_LANES = SB * LN
NB = 1 << LIMB_BITS


class _KF1:
    """rcb-compatible wrapper: KernelField with constant-b3 multiplication."""

    def __init__(self, kf, b3_l):
        self.kf = kf
        self.b3_l = b3_l

    def mul(self, a, b):
        if b is _B3 or a is _B3:
            other = a if b is _B3 else b
            return self.kf.mul_const(other, self.b3_l)
        return self.kf.mul(a, b)

    def add(self, a, b):
        return self.kf.add(a, b)

    def sub(self, a, b):
        return self.kf.sub(a, b)

    def select(self, mask, a, b):
        return self.kf.select(mask, a, b)


class _B3Sentinel:
    pass


_B3 = _B3Sentinel()


@functools.lru_cache(maxsize=None)
def _scan_kernel(fp: FieldParams, b, ext: int, C: int):
    """K1: per-lane suffix scan + masked accumulator.

    Input  xy:(C, 2*nl*ext, SB, LN) sorted affine points, column-major
           mk:(C, SB, LN)           first-occurrence mask (u32 0/1)
    Output (2, 3*nl*ext, SB, LN): [0] = masked accumulator ACC per lane,
                                  [1] = full lane total TOT.
    """
    nl = fp.nl
    if ext == 1:
        b3_l = fpal._limbs(fp.to_mont(3 * b % fp.p), nl)
    else:
        b3_l = tuple(fpal._limbs(fp.to_mont(3 * v % fp.p), nl) for v in b)
    one_l = [int(x) for x in fpal._limbs(fp.one_mont, nl)]
    nr_in = 2 * nl * ext
    nro = 3 * nl * ext

    def kernel(xy_ref, mk_ref, o_ref, st_ref, ac_ref, *fsc):
        kf = fpal.KernelField(fp, (SB, LN), fsc)
        f = kf if ext == 1 else fpal.KernelField2(kf)
        fw = _KF1(f, b3_l)
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _init():
            for ref in (st_ref, ac_ref):
                ref[...] = jnp.zeros(ref.shape, U32)
                for i in range(nl):
                    if one_l[i]:
                        ref[nl * ext + i] = jnp.full(
                            ref.shape[1:], one_l[i], dtype=U32)

        def unpack(v, base):
            if ext == 1:
                return v[base:base + nl]
            return (v[base:base + nl], v[base + nl:base + 2 * nl])

        def pt(v):
            return (unpack(v, 0), unpack(v, nl * ext), unpack(v, 2 * nl * ext))

        def rows_of(P):
            X, Y, Z = P
            parts = ([X, Y, Z] if ext == 1
                     else [X[0], X[1], Y[0], Y[1], Z[0], Z[1]])
            return jnp.concatenate(parts, axis=0)

        st = pt(st_ref[...])
        xyv = xy_ref[0]
        x2 = unpack(xyv, 0)
        y2 = unpack(xyv, nl * ext)
        new_st = rcb.rcb_madd(fw, st, x2, y2, _B3)
        st_rows = rows_of(new_st)
        st_ref[...] = st_rows

        acc = pt(ac_ref[...])
        added = rcb.rcb_add(fw, acc, new_st, _B3)
        mask = mk_ref[0] != 0
        acc_rows = jnp.where(mask[None], rows_of(added), ac_ref[...])
        ac_ref[...] = acc_rows

        @pl.when(c == C - 1)
        def _flush():
            o_ref[0] = ac_ref[...]
            o_ref[1] = st_ref[...]

    def run(xyT, mkT):
        spec_xy = pl.BlockSpec((1, nr_in, SB, LN),
                               lambda i: (C - 1 - i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_mk = pl.BlockSpec((1, SB, LN), lambda i: (C - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((2, nro, SB, LN), lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=[spec_xy, spec_mk],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct((2, nro, SB, LN), U32),
            scratch_shapes=[pltpu.VMEM((nro, SB, LN), U32),
                            pltpu.VMEM((nro, SB, LN), U32)]
            + fpal.KernelField.scratch_shapes(fp, (SB, LN)),
        )(xyT, mkT)

    return run


CH = 128          # combine-kernel chunk width (lanes)
NSTEP = R_LANES // CH


@functools.lru_cache(maxsize=None)
def _combine_kernel(fp: FieldParams, b, ext: int, nw: int):
    """K2: fold per-lane MSM outputs into per-window partials.

    Inputs (rearranged to chunk-major on the XLA side):
      acc:(NSTEP, nro, nw, CH)  masked accumulators per lane
      tot:(NSTEP, nro, nw, CH)  lane totals
      cs :(NSTEP, nw, CH)       exclusive prefix sums of mask counts
    Output (2, nro, nw, CH): [0] = sum of accs, [1] = sum of CS[r]*tot[r]
    (the cross-lane carry term, see TpuMSM), both still spread over CH
    lanes — the final log2(CH) halvings happen on the XLA side.

    The grid is (NSTEP, LIMB_BITS): the inner dimension walks the bits of
    the 16-bit double-and-add so each grid step contains only ~3 complete
    additions — Mosaic compile time is superlinear in straight-line length,
    so a 31-addition body is unshippable while this shape compiles in
    seconds and revisits the same input block 16 times at zero DMA cost.
    """
    nl = fp.nl
    if ext == 1:
        b3_l = fpal._limbs(fp.to_mont(3 * b % fp.p), nl)
    else:
        b3_l = tuple(fpal._limbs(fp.to_mont(3 * v % fp.p), nl) for v in b)
    one_l = [int(x) for x in fpal._limbs(fp.one_mont, nl)]
    nro = 3 * nl * ext

    def kernel(acc_ref, tot_ref, cs_ref, o_ref, v_ref, w_ref, dd_ref, *fsc):
        kf = fpal.KernelField(fp, (nw, CH), fsc)
        f = kf if ext == 1 else fpal.KernelField2(kf)
        fw = _KF1(f, b3_l)
        step = pl.program_id(0)
        k = pl.program_id(1)          # bit index: processes bit 15-k

        def set_ident(ref):
            ref[...] = jnp.zeros(ref.shape, U32)
            for i in range(nl):
                if one_l[i]:
                    ref[nl * ext + i] = jnp.full(
                        ref.shape[1:], one_l[i], dtype=U32)

        def unpack(v, base):
            if ext == 1:
                return v[base:base + nl]
            return (v[base:base + nl], v[base + nl:base + 2 * nl])

        def pt(v):
            return (unpack(v, 0), unpack(v, nl * ext), unpack(v, 2 * nl * ext))

        def rows_of(P):
            X, Y, Z = P
            parts = ([X, Y, Z] if ext == 1
                     else [X[0], X[1], Y[0], Y[1], Z[0], Z[1]])
            return jnp.concatenate(parts, axis=0)

        @pl.when((step == 0) & (k == 0))
        def _init():
            set_ident(v_ref)
            set_ident(w_ref)

        @pl.when(k == 0)
        def _chunk_start():
            # V += acc chunk; dd restarts for this chunk
            A = pt(acc_ref[0])
            v_ref[...] = rows_of(rcb.rcb_add(fw, pt(v_ref[...]), A, _B3))
            set_ident(dd_ref)

        # one double-and-add bit step: dd = 2*dd + (bit ? tot : ident)
        cs = cs_ref[0]
        T = pt(tot_ref[0])
        bit = ((cs >> (LIMB_BITS - 1 - k)) & 1) != 0
        ident_y = [jnp.full((nw, CH), v, U32) if v else
                   jnp.zeros((nw, CH), U32) for v in one_l]
        zero16 = jnp.zeros((nl, nw, CH), U32)
        one16 = jnp.stack(ident_y)

        def sel(e, id_rows):
            if ext == 1:
                return jnp.where(bit[None], e, id_rows)
            return (jnp.where(bit[None], e[0], id_rows[0]),
                    jnp.where(bit[None], e[1], id_rows[1]))

        if ext == 1:
            addend = (sel(T[0], zero16), sel(T[1], one16), sel(T[2], zero16))
        else:
            addend = (sel(T[0], (zero16, zero16)),
                      sel(T[1], (one16, zero16)),
                      sel(T[2], (zero16, zero16)))
        dd = rcb.rcb_add(fw, pt(dd_ref[...]), pt(dd_ref[...]), _B3)
        dd = rcb.rcb_add(fw, dd, addend, _B3)
        dd_ref[...] = rows_of(dd)

        @pl.when(k == LIMB_BITS - 1)
        def _chunk_end():
            w_ref[...] = rows_of(
                rcb.rcb_add(fw, pt(w_ref[...]), pt(dd_ref[...]), _B3))

        @pl.when((step == NSTEP - 1) & (k == LIMB_BITS - 1))
        def _flush():
            o_ref[0] = v_ref[...]
            o_ref[1] = w_ref[...]

    def run(acc_cm, tot_cm, cs_cm):
        spec_p = pl.BlockSpec((1, nro, nw, CH), lambda i, j: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        spec_c = pl.BlockSpec((1, nw, CH), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((2, nro, nw, CH), lambda i, j: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(NSTEP, LIMB_BITS),
            in_specs=[spec_p, spec_p, spec_c],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct((2, nro, nw, CH), U32),
            scratch_shapes=[pltpu.VMEM((nro, nw, CH), U32),
                            pltpu.VMEM((nro, nw, CH), U32),
                            pltpu.VMEM((nro, nw, CH), U32)]
            + fpal.KernelField.scratch_shapes(fp, (nw, CH)),
        )(acc_cm, tot_cm, cs_cm)

    return run


# --------------------------------------------------------------- XLA glue


class _DevField:
    """FOps facade over fjnp for composed (non-kernel) rcb passes; Fq."""

    def __init__(self, ctx):
        self.ctx = ctx

    def mul(self, a, b):
        return fjnp.mont_mul(self.ctx, a, b)

    def add(self, a, b):
        return fjnp.add(self.ctx, a, b)

    def sub(self, a, b):
        return fjnp.sub(self.ctx, a, b)

    def select(self, mask, a, b):
        return jnp.where(mask[None, ...], a, b)

    def zero(self, batch_shape=()):
        return self.ctx.zero(batch_shape)

    def one(self, batch_shape=()):
        return self.ctx.one(batch_shape)

    def batch_shape(self, a):
        return a.shape[1:]


class _DevField2:
    def __init__(self, ctx):
        self.f = _DevField(ctx)

    def mul(self, a, b):
        m0 = self.f.mul(a[0], b[0])
        m1 = self.f.mul(a[1], b[1])
        m2 = self.f.mul(self.f.add(a[0], a[1]), self.f.add(b[0], b[1]))
        return (self.f.sub(m0, m1), self.f.sub(m2, self.f.add(m0, m1)))

    def add(self, a, b):
        return (self.f.add(a[0], b[0]), self.f.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.f.sub(a[0], b[0]), self.f.sub(a[1], b[1]))

    def select(self, mask, a, b):
        return (self.f.select(mask, a[0], b[0]), self.f.select(mask, a[1], b[1]))

    def zero(self, batch_shape=()):
        return (self.f.zero(batch_shape), self.f.zero(batch_shape))

    def one(self, batch_shape=()):
        return (self.f.one(batch_shape), self.f.zero(batch_shape))

    def batch_shape(self, a):
        return a[0].shape[1:]


def _dev_b3(ctx, b, ext, batch_ndim):
    fp = ctx.fp
    if ext == 1:
        arr = fjnp.np_from_int(fp, fp.to_mont(3 * b % fp.p))
        return jnp.asarray(arr).reshape((fp.nl,) + (1,) * batch_ndim)
    return tuple(
        jnp.asarray(fjnp.np_from_int(fp, fp.to_mont(3 * v % fp.p))).reshape(
            (fp.nl,) + (1,) * batch_ndim)
        for v in b)


def _tree_sum(f, P, b3, axis=-1):
    """Reduce projective points along `axis` (power-of-two size)."""
    n = jax.tree.leaves(P)[0].shape[axis]
    while n > 1:
        half = n // 2
        lo = jax.tree.map(lambda a: jax.lax.slice_in_dim(a, 0, half, axis=axis), P)
        hi = jax.tree.map(
            lambda a: jax.lax.slice_in_dim(a, half, n, axis=axis), P)
        P = rcb.rcb_add(f, lo, hi, b3)
        n = half
    return P


def _suffix_excl(f, P, b3, axis=-1):
    """excl[r] = sum_{r' > r} P[r'] via log-doubling shifts."""
    n = jax.tree.leaves(P)[0].shape[axis]
    nd = jax.tree.leaves(P)[0].ndim

    def shift_left(Q, k):
        def sh(a, ident):
            ax = axis % a.ndim
            pad = jnp.broadcast_to(ident, a.shape[:ax] + (k,) + a.shape[ax + 1:])
            return jnp.concatenate(
                [jax.lax.slice_in_dim(a, k, n, axis=axis), pad], axis=axis)

        idX = f.zero((1,) * (nd - 1))
        idY = f.one((1,) * (nd - 1))
        X, Y, Z = Q
        if isinstance(X, tuple):
            return (tuple(sh(x, ix) for x, ix in zip(X, idX)),
                    tuple(sh(y, iy) for y, iy in zip(Y, idY)),
                    tuple(sh(z, iz) for z, iz in zip(Z, idX)))
        return (sh(X, idX), sh(Y, idY), sh(Z, idX))

    S = shift_left(P, 1)
    k = 1
    while k < n:
        S = rcb.rcb_add(f, S, shift_left(S, k), b3)
        k *= 2
    return S


def _reduce_lanes(f, P, b3, axis=-1):
    """sum along `axis` via log-doubling suffix folds on a FIXED shape.

    12x more adds than a halving tree, but every round runs at the same
    array shape, so the whole reduction uses one compiled field kernel —
    critical on this backend, where each new kernel/graph shape costs
    minutes of compile time.
    """
    n = jax.tree.leaves(P)[0].shape[axis]
    nd = jax.tree.leaves(P)[0].ndim

    def shift_left(Q, k):
        def sh(a, ident):
            ax = axis % a.ndim
            pad = jnp.broadcast_to(ident, a.shape[:ax] + (k,) + a.shape[ax + 1:])
            return jnp.concatenate(
                [jax.lax.slice_in_dim(a, k, n, axis=axis), pad], axis=axis)

        idX = f.zero((1,) * (nd - 1))
        idY = f.one((1,) * (nd - 1))
        X, Y, Z = Q
        if isinstance(X, tuple):
            return (tuple(sh(x, ix) for x, ix in zip(X, idX)),
                    tuple(sh(y, iy) for y, iy in zip(Y, idY)),
                    tuple(sh(z, iz) for z, iz in zip(Z, idX)))
        return (sh(X, idX), sh(Y, idY), sh(Z, idX))

    S = P
    k = 1
    while k < n:
        S = rcb.rcb_add(f, S, shift_left(S, k), b3)
        k *= 2
    return jax.tree.map(
        lambda a: jax.lax.slice_in_dim(a, 0, 1, axis=axis), S)


def _sel_ident(f, bitmask, P):
    """P where bitmask else the identity (0:1:0)."""
    X, Y, Z = P
    ndim1 = tuple(1 for _ in jax.tree.leaves(X)[0].shape[1:])
    zero = f.zero(ndim1)
    one = f.one(ndim1)

    def selt(m, a, b):
        if isinstance(a, tuple):
            return tuple(jnp.where(m[None], x, jnp.broadcast_to(y, x.shape))
                         for x, y in zip(a, b))
        return jnp.where(m[None], a, jnp.broadcast_to(b, a.shape))

    return (selt(bitmask, X, zero), selt(bitmask, Y, one),
            selt(bitmask, Z, zero))


class TpuMSM:
    """Pippenger MSM on one TPU chip.  G1 (ext=1) and G2 (ext=2)."""

    def __init__(self, fq: FieldParams, fr: FieldParams, b, gen, ext: int = 1):
        self.fq = fq
        self.fr = fr
        self.b = b if ext == 1 else tuple(b)
        self.gen = gen  # affine generator (plain ints) used for phantoms
        self.ext = ext
        self.ctx = fjnp.get_ctx(fq.name)
        self.f = _DevField(self.ctx) if ext == 1 else _DevField2(self.ctx)
        self._prog_cache = {}
        self._phantom_corr = None

    # ---- host-side constants

    def _phantom_rows_np(self):
        """(NB-1, 2*nl*ext) phantom point rows: the generator, Montgomery."""
        fq, ext = self.fq, self.ext
        row = []
        for coord in self.gen:
            vals = (coord,) if ext == 1 else coord
            for v in vals:
                row.append(fjnp.np_from_int(fq, fq.to_mont(v)))
        row = np.concatenate(row)                       # (2*nl*ext,)
        return np.broadcast_to(row, (NB - 1, row.shape[0])).copy()

    def _corr_point(self):
        """Host jacobian of (sum_w 2^(16w)) * NB(NB-1)/2 * gen (to subtract)."""
        if self._phantom_corr is None:
            from . import msm as msm_mod

            nw = self.fr.nl
            m = sum(1 << (LIMB_BITS * w) for w in range(nw))
            k = (m * (NB * (NB - 1) // 2)) % self.fr.p
            gj = (self.gen[0], self.gen[1], msm_mod._f_int(1, self.ext))
            P = None
            for bit in bin(k)[2:]:
                if P is not None:
                    P = msm_mod._host_jac_dbl(self.fq, P, self.ext)
                if bit == "1":
                    P = msm_mod._host_jac_add(self.fq, P, gj, self.ext)
            self._phantom_corr = P
        return self._phantom_corr

    def _xy_rows(self, px, py, pinf):
        if self.ext == 1:
            rows = jnp.concatenate([px, py], axis=0)
        else:
            rows = jnp.concatenate([px[0], px[1], py[0], py[1]], axis=0)
        return rows.T                                   # (n, 2nl*ext)

    # ---- compiled programs (3 per shape config)

    def _programs(self, C: int, n: int, nw: int):
        key = (C, n, nw)
        prog = self._prog_cache.get(key)
        if prog is not None:
            return prog
        fq, ext = self.fq, self.ext
        nl = fq.nl
        Np = C * R_LANES
        nrow = 2 * nl * ext
        nro = 3 * nl * ext
        scan = _scan_kernel(fq, self.b, ext, C)
        phantom_rows = jnp.asarray(self._phantom_rows_np())
        phantom_digits = jnp.arange(1, NB, dtype=jnp.int32)

        @jax.jit
        def f0(px, py, pinf, scalars):
            scal = jnp.where(pinf[None, :], jnp.zeros_like(scalars), scalars)
            digits = scal.astype(jnp.int32)
            xy = self._xy_rows(px, py, pinf)
            xy = jnp.concatenate([xy, phantom_rows], axis=0)
            digits = jnp.concatenate(
                [digits,
                 jnp.broadcast_to(phantom_digits[None], (nw, NB - 1))], axis=1)
            pad = Np - (n + NB - 1)
            if pad:
                xy = jnp.pad(xy, ((0, pad), (0, 0)))
                digits = jnp.pad(digits, ((0, 0), (0, pad)))
            return digits, xy

        @jax.jit
        def f1(dw, xy):
            order = jnp.argsort(dw)
            dsort = jnp.sort(dw)
            xys = xy[order]
            xyT = (xys.reshape(R_LANES, C, nrow)
                      .transpose(1, 2, 0)
                      .reshape(C, nrow, SB, LN))
            prev = jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32), dsort[:-1]])
            mask = ((dsort != prev) & (dsort != 0)).astype(jnp.uint32)
            mkT = mask.reshape(R_LANES, C).T.reshape(C, SB, LN)
            cnt = jnp.sum(mask.reshape(R_LANES, C), axis=1,
                          dtype=jnp.int32)                  # (R,)
            out = scan(xyT, mkT)                            # (2, nro, SB, LN)
            acc = out[0].reshape(nro, R_LANES)
            tot = out[1].reshape(nro, R_LANES)
            return acc, tot, cnt

        combine = _combine_kernel(fq, self.b, ext, nw)

        @jax.jit
        def f2(accs, tots, cnts):
            # accs/tots: (nro, nw, R); cnts: (nw, R)
            # Window value = sum_r ACC[r] + sum_r cnt[r]*carry[r] where
            # carry[r] = suffix of lane totals; the second term rewrites as
            # sum_r CS[r]*tot[r] with CS = exclusive prefix sums of cnt.
            # K2 folds both over lanes; only log2(CH) halvings remain here.
            b3w = _dev_b3(self.ctx, self.b, ext, 2)
            CS = (jnp.cumsum(cnts, axis=-1) - cnts).astype(jnp.int32)
            acc_cm = jnp.moveaxis(
                accs.reshape(nro, nw, NSTEP, CH), 2, 0)
            tot_cm = jnp.moveaxis(
                tots.reshape(nro, nw, NSTEP, CH), 2, 0)
            cs_cm = jnp.moveaxis(CS.reshape(nw, NSTEP, CH), 1, 0)
            out = combine(acc_cm, tot_cm, cs_cm)     # (2, nro, nw, CH)
            P = self._unflat(out.reshape(2 * nro, nw, CH)
                             .reshape(2, nro, nw, CH)
                             .transpose(1, 0, 2, 3)
                             .reshape(nro, 2 * nw, CH))
            ch = CH
            while ch > 1:
                half = ch // 2
                lo = jax.tree.map(lambda a: a[..., :half], P)
                hi = jax.tree.map(lambda a: a[..., half:ch], P)
                P = rcb.rcb_add(self.f, lo, hi, b3w)
                ch = half
            Vs = jax.tree.map(lambda a: a[..., 0], P)    # (., 2nw)
            V1 = jax.tree.map(lambda a: a[..., :nw], Vs)
            V2 = jax.tree.map(lambda a: a[..., nw:], Vs)
            b3s = _dev_b3(self.ctx, self.b, ext, 1)
            W = rcb.rcb_add(self.f, V1, V2, b3s)
            return self._flat(W)                         # (nro, nw)

        prog = (f0, f1, f2)
        self._prog_cache[key] = prog
        return prog

    def run(self, px, py, pinf, scalars, debug=None):
        """Full MSM; returns host jacobian int tuple (like msm.MSMContext)."""
        import os
        import sys
        import time as _time

        if debug is None:
            debug = bool(os.environ.get("SNARKJS_MSM_DEBUG"))
        t_last = [_time.time()]

        def _dbg(tag, arr=None):
            if not debug:
                return
            if arr is not None:
                np.asarray(jax.tree.leaves(arr)[0]).reshape(-1)[:1]
            now = _time.time()
            print(f"    msm[{tag}]: {now - t_last[0]:.1f}s",
                  file=sys.stderr, flush=True)
            t_last[0] = now

        nw = scalars.shape[0]
        n = scalars.shape[-1]
        C = max(1, -(-(n + NB - 1) // R_LANES))
        f0, f1, f2 = self._programs(C, n, nw)
        digits, xy = f0(px, py, pinf, scalars)
        _dbg("prep", xy)
        accs, tots, cnts = [], [], []
        for w in range(nw):
            acc, tot, cnt = f1(digits[w], xy)
            accs.append(acc)
            tots.append(tot)
            cnts.append(cnt)
            _dbg(f"w{w}", acc)
        flatW = f2(jnp.stack(accs, axis=1), jnp.stack(tots, axis=1),
                   jnp.stack(cnts, axis=0))
        out = self._finish(np.asarray(flatW))
        _dbg("finish")
        return out

    def _unflat(self, rows):
        nl, ext = self.fq.nl, self.ext
        if ext == 1:
            return (rows[:nl], rows[nl:2 * nl], rows[2 * nl:])
        return ((rows[:nl], rows[nl:2 * nl]),
                (rows[2 * nl:3 * nl], rows[3 * nl:4 * nl]),
                (rows[4 * nl:5 * nl], rows[5 * nl:]))

    def _flat(self, P):
        X, Y, Z = P
        if self.ext == 1:
            return jnp.concatenate([X, Y, Z], axis=0)
        return jnp.concatenate([X[0], X[1], Y[0], Y[1], Z[0], Z[1]], axis=0)

    def _finish(self, flatW: np.ndarray):
        """Host window combination minus the phantom correction (bigints)."""
        from . import msm as msm_mod

        fq, ext = self.fq, self.ext
        nl = fq.nl
        nw = flatW.shape[1]

        def elem(rows, w):
            if ext == 1:
                return fq.from_mont(fjnp.np_to_ints(fq, rows[:, w:w + 1])[0])
            return (fq.from_mont(fjnp.np_to_ints(fq, rows[:nl, w:w + 1])[0]),
                    fq.from_mont(fjnp.np_to_ints(fq, rows[nl:, w:w + 1])[0]))

        total = None
        for w in range(nw - 1, -1, -1):
            if total is not None:
                for _ in range(LIMB_BITS):
                    total = msm_mod._host_jac_dbl(fq, total, ext)
            X = elem(flatW[0 * nl * ext:1 * nl * ext], w)
            Y = elem(flatW[1 * nl * ext:2 * nl * ext], w)
            Z = elem(flatW[2 * nl * ext:3 * nl * ext], w)
            if msm_mod._f_is_zero(Z, ext):
                continue
            Zi = _f_inv(fq, Z, ext)
            x = msm_mod._f_mul(fq, X, Zi, ext)
            y = msm_mod._f_mul(fq, Y, Zi, ext)
            total = msm_mod._host_jac_add(
                fq, total, (x, y, msm_mod._f_int(1, ext)), ext)
        corr = self._corr_point()
        if corr is not None:
            neg = (corr[0],
                   msm_mod._f_sub(fq, msm_mod._f_int(0, ext), corr[1], ext),
                   corr[2])
            total = msm_mod._host_jac_add(fq, total, neg, ext)
        if total is None:
            total = (msm_mod._f_int(0, ext), msm_mod._f_int(1, ext),
                     msm_mod._f_int(0, ext))
        return total


def _f_inv(fp, a, ext):
    if ext == 1:
        return pow(a, fp.p - 2, fp.p)
    a0, a1 = a
    t = pow((a0 * a0 + a1 * a1) % fp.p, fp.p - 2, fp.p)
    return (a0 * t % fp.p, (fp.p - a1) * t % fp.p)


@functools.lru_cache(maxsize=None)
def get_msm(curve_name: str, group: str = "g1") -> TpuMSM:
    from .host_curve import get_curve

    cv = get_curve(curve_name)
    if group == "g1":
        return TpuMSM(cv.fq, cv.fr, cv.b, cv.g1, ext=1)
    return TpuMSM(cv.fq, cv.fr, cv.b2, cv.g2, ext=2)
