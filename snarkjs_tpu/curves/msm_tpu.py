"""Fused TPU MSM: sorted suffix-scan Pippenger over Pallas kernels.

Replaces ffjavascript's g1m_multiexpAffine worker MSM (the Groth16 prover
hot spot, reference src/groth16_prove.js:85-101) with a design picked by
measurement on TPU v5e:

  * Random gathers are pathological on this memory system (~25 ns per row,
    latency-bound) while the radix sort streams its passes at near
    bandwidth — so each window's grouping-by-digit is done by ONE
    lax.sort that carries the affine point rows AS SORT PAYLOAD (16
    packed u32 columns; two 16-bit limbs per u32).  No argsort, no
    gather of point data at all.
  * Digits are BALANCED SIGNED (|d| <= 2^15, sign folded into the sort
    key's low bit and applied by negating y inside the kernel), which
    halves the bucket range and with it the boundary-row gather, the
    searchsorted, and the bucket tree-sum.
  * Per-lane dynamic indexing does not exist on the VPU, so classic bucket
    scatter/accumulate is replaced by the suffix-sum identity

        sum_b b*B_b = sum_{t=1}^{nb/2} SuffixSum(first_index(key >= 2t)).

    where SuffixSum(i) sums sorted (sign-applied) points from position i
    on.  The identity holds even when a magnitude is absent (the suffix at
    the boundary simply repeats), so no phantom points or corrections are
    needed: sum_t Suffix(...) = sum_i |d_i| sign_i P_i = sum_i d_i P_i.
  * The scan kernel (K1) runs one complete mixed add (RCB formulas,
    curves/rcb.py — branch-free, so doubling/identity/duplicate lanes cost
    nothing) per point per window: lanes scan contiguous chunks of the
    sorted order high->low and the running suffix point is streamed back to
    HBM packed 2-limbs-per-u32 (downstream transpose + boundary gather
    move half the bytes).  That single madd per element is the whole
    per-point device cost.
  * The nb/2 first-occurrence suffix values are then picked up with a
    row gather and tree-summed (the classic Pippenger bucket-combination
    term).  Cross-lane carries (each lane's suffix is local to its chunk)
    are fixed by adding the suffix of later lanes' totals, computed with a
    log-doubling pass over the 4096 lane totals.
  * All nw windows run inside ONE jit (lax.map), so there are no per-window
    host round trips; the only host transfer is the final (nro, nw) window
    partials, combined on host bigints exactly like the reference combines
    per-chunk WASM results on the JS side.

Window size c = 16 bits == one scalar limb, so digits are just the scalar
limbs (nw = 16 windows for a 254/255-bit field) balanced-recoded with a
carry chain.

Measured v5e split at 2^20 G1 (607 ms total, 1.73M points/s): payload
sort ~180 ms, K1 scan ~343 ms (VPU mul ceiling), boundary gather +
carry + tree-sum ~80 ms.
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


def _r_lanes() -> int:
    """Scan width: 4096 lanes feed the Pallas kernel on TPU; off TPU the
    XLA fallback uses 128 so tests/virtual-mesh dry runs do 32x less
    carry/total arithmetic (same algebra, same code path)."""
    return R_LANES if jax.default_backend() == "tpu" else LN


class _KF1:
    """rcb-compatible wrapper: KernelField with constant-b3 multiplication.

    When 3b is a small integer (9 for bn254 G1, 12 for bls12-381 G1) the
    multiply is a double-and-add ladder of modular additions (4 adds)
    instead of a full Montgomery product — Montgomery form is preserved
    under integer scaling (k * aR = (k a) R).
    """

    def __init__(self, kf, b3_l, b3_small=None):
        self.kf = kf
        self.b3_l = b3_l
        self.b3_small = b3_small

    def _mul_small(self, a, k):
        kf = self.kf
        acc = None
        run = a
        while k:
            if k & 1:
                acc = run if acc is None else kf.add(acc, run)
            k >>= 1
            if k:
                run = kf.add(run, run)
        return acc

    def mul(self, a, b):
        if b is _B3 or a is _B3:
            other = a if b is _B3 else b
            if self.b3_small is not None:
                return self._mul_small(other, self.b3_small)
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
    """K1: per-lane suffix scan of mixed adds.

    Input  xy:(C, nl*ext + 1, SB, LN) sorted affine points with two 16-bit
           limbs PACKED per u32 (halves the HBM traffic of the sorted
           stream; the radix sort that feeds this kernel moves payload
           bytes, so packing pays twice) + the sorted signed-digit key row
           (mag*2 + sign): lanes with sign 1 add -P (y negated in-kernel).
    Output st:(C, 3*nl*ext//2, SB, LN) running suffix point after each
           step (st[c] = sum of this lane's elements c..C-1), limb pairs
           packed 2-per-u32 as well — the downstream transpose + boundary
           row gather move half the bytes; phase2 unpacks what it touches.
    """
    nl = fp.nl
    if ext == 1:
        b3_l = fpal._limbs(fp.to_mont(3 * b % fp.p), nl)
        b3_small = 3 * b if 0 < 3 * b < 64 else None
    else:
        b3_l = tuple(fpal._limbs(fp.to_mont(3 * v % fp.p), nl) for v in b)
        b3_small = None
    one_l = [int(x) for x in fpal._limbs(fp.one_mont, nl)]
    npk = nl // 2          # packed u32 rows per Fq element
    nr_in = nl * ext + 1   # packed rows for (x, y) + the key row
    nro = 3 * nl * ext
    nro_p = nro // 2

    def kernel(xy_ref, o_ref, st_ref, *fsc):
        kf = fpal.KernelField(fp, (SB, LN), fsc)
        f = kf if ext == 1 else fpal.KernelField2(kf)
        fw = _KF1(f, b3_l, b3_small)
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _init():
            st_ref[...] = jnp.zeros(st_ref.shape, U32)
            for i in range(nl):
                if one_l[i]:
                    st_ref[nl * ext + i] = jnp.full(
                        st_ref.shape[1:], one_l[i], dtype=U32)

        def unpack_fq(v, pbase):
            return jnp.stack(
                [(v[pbase + i // 2] >> (16 * (i & 1))) & np.uint32(0xFFFF)
                 for i in range(nl)])

        def unpack(v, pbase):
            if ext == 1:
                return unpack_fq(v, pbase)
            return (unpack_fq(v, pbase), unpack_fq(v, pbase + npk))

        def pt_st(v, base):
            if ext == 1:
                return v[base:base + nl]
            return (v[base:base + nl], v[base + nl:base + 2 * nl])

        def rows_of(P):
            X, Y, Z = P
            parts = ([X, Y, Z] if ext == 1
                     else [X[0], X[1], Y[0], Y[1], Z[0], Z[1]])
            return jnp.concatenate(parts, axis=0)

        stv = st_ref[...]
        st = (pt_st(stv, 0), pt_st(stv, nl * ext), pt_st(stv, 2 * nl * ext))
        xyv = xy_ref[0]
        x2 = unpack(xyv, 0)
        y2 = unpack(xyv, npk * ext)
        negmask = (xyv[nr_in - 1] & 1) != 0             # signed-digit lanes
        y2 = f.select(negmask, f.sub(f.zero_like(y2), y2), y2)
        new_st = rcb.rcb_madd(fw, st, x2, y2, _B3)
        st_rows = rows_of(new_st)
        st_ref[...] = st_rows
        pairs = st_rows.reshape(nro_p, 2, SB, LN)
        o_ref[0] = pairs[:, 0] | (pairs[:, 1] << 16)

    def run(xyT):
        spec_xy = pl.BlockSpec((1, nr_in, SB, LN),
                               lambda i: (C - 1 - i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((1, nro_p, SB, LN),
                                lambda i: (C - 1 - i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=[spec_xy],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct((C, nro_p, SB, LN), U32),
            scratch_shapes=[pltpu.VMEM((nro, SB, LN), U32)]
            + fpal.KernelField.scratch_shapes(fp, (SB, LN)),
            interpret=jax.default_backend() != "tpu",
        )(xyT)

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
    """Reduce projective points along `axis` (power-of-two size).

    On TPU: halving tree (minimal adds).  Off TPU (tests / virtual-device
    dry runs): fixed-shape log-doubling suffix fold — log2(n) times more
    adds, but every round reuses ONE compiled field-op shape, which is what
    dominates wall-clock on the CPU backend (XLA CPU compiles each distinct
    limb-loop shape in seconds)."""
    if jax.default_backend() != "tpu":
        S = _suffix_excl(f, P, b3, axis=axis)
        first_suffix = jax.tree.map(
            lambda a: jax.lax.slice_in_dim(a, 0, 1, axis=axis), S)
        first = jax.tree.map(
            lambda a: jax.lax.slice_in_dim(a, 0, 1, axis=axis), P)
        return rcb.rcb_add(f, first, first_suffix, b3)
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
    """excl[r] = sum_{r' > r} P[r'] via log-doubling shifts.

    On TPU the log2(n) rounds are unrolled (cheap static slices).  Off TPU
    they run under lax.fori_loop with a dynamic roll+mask shift, so the
    whole reduction compiles ONE field-op body — XLA CPU compile time is
    proportional to inlined limb-loop count, which dominates virtual-device
    dry runs and tests."""
    n = jax.tree.leaves(P)[0].shape[axis]
    nd = jax.tree.leaves(P)[0].ndim

    def shift_left(Q, k):
        def sh(a, ident):
            pad = jnp.broadcast_to(
                ident, a.shape[:axis % a.ndim] + (k,)
                + a.shape[axis % a.ndim + 1:])
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

    def roll_left(Q, k):
        """Dynamic-shift variant: lanes >= n-k become the identity."""
        ax = axis % nd
        pos = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
        shp = [1] * nd
        shp[ax] = n
        keep = (pos < n - k).reshape(shp)

        def sh(a, ident):
            rolled = jnp.roll(a, -k, axis=ax)
            return jnp.where(keep, rolled,
                             jnp.broadcast_to(ident, a.shape))

        idX = f.zero((1,) * (nd - 1))
        idY = f.one((1,) * (nd - 1))
        X, Y, Z = Q
        if isinstance(X, tuple):
            return (tuple(sh(x, ix) for x, ix in zip(X, idX)),
                    tuple(sh(y, iy) for y, iy in zip(Y, idY)),
                    tuple(sh(z, iz) for z, iz in zip(Z, idX)))
        return (sh(X, idX), sh(Y, idY), sh(Z, idX))

    if jax.default_backend() != "tpu":
        rounds = (n - 1).bit_length()

        def body(i, S):
            return rcb.rcb_add(f, S, roll_left(S, 1 << i), b3)

        return jax.lax.fori_loop(0, rounds, body, roll_left(P, 1))

    S = shift_left(P, 1)
    k = 1
    while k < n:
        S = rcb.rcb_add(f, S, shift_left(S, k), b3)
        k *= 2
    return S


class TpuMSM:
    """Pippenger MSM on one TPU chip.  G1 (ext=1) and G2 (ext=2)."""

    def __init__(self, fq: FieldParams, fr: FieldParams, b, gen, ext: int = 1,
                 cw: int = LIMB_BITS):
        self.fq = fq
        self.fr = fr
        self.b = b if ext == 1 else tuple(b)
        self.gen = gen  # affine generator (plain ints)
        self.ext = ext
        self.cw = cw    # window bit width; each scalar row is one base-2^cw
        self.nb = 1 << cw  # digit (tests shrink this to keep interpret fast)
        self.ctx = fjnp.get_ctx(fq.name)
        self.f = _DevField(self.ctx) if ext == 1 else _DevField2(self.ctx)
        self._prog_cache = {}

    def _xy_packed(self, px, py, pinf):
        """Affine coords as (nl*ext, n) u32 with limb pairs packed 2-per-u32
        (the sort payload; halves sorted bytes, unpacked in the kernel)."""
        if self.ext == 1:
            rows = jnp.concatenate([px, py], axis=0)
        else:
            rows = jnp.concatenate([px[0], px[1], py[0], py[1]], axis=0)
        return rows[0::2] | (rows[1::2] << 16)          # (nl*ext, n)

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

    # ---- compiled program (one per shape config)

    def _program(self, C: int, nw: int):
        """Program operating on exactly Np = C*R_LANES padded points, so one
        compilation serves every MSM length in (Np - R_LANES, Np] (callers
        pad with infinity points outside the jit)."""
        key = (C, nw)
        prog = self._prog_cache.get(key)
        if prog is not None:
            return prog
        fq, ext = self.fq, self.ext
        nl = fq.nl
        RL = _r_lanes()
        Np = C * RL
        npk = nl * ext                                  # packed payload rows
        nro = 3 * nl * ext
        NBw = self.nb
        use_pallas_scan = jax.default_backend() == "tpu"
        scan = _scan_kernel(fq, self.b, ext, C) if use_pallas_scan else None
        f = self.f

        def unpack_rows(pk):
            """(k, ...) packed u32 -> (2k, ...) 16-bit limb rows."""
            lo = pk & jnp.uint32(0xFFFF)
            hi = pk >> 16
            return jnp.stack([lo, hi], axis=1).reshape(
                (2 * pk.shape[0],) + pk.shape[1:])

        def scan_xla(xyT):
            """Off-TPU K1 equivalent: reverse inclusive associative_scan of
            complete adds.  The Pallas-interpret kernel body costs minutes
            of XLA CPU compile; this costs log2(C) add bodies (zero for
            C == 1, the test/dry-run case)."""
            b3c = _dev_b3(self.ctx, self.b, ext, 2)
            rows_in = jnp.moveaxis(xyT, 1, 0)           # (npk+1, C, R)
            v = unpack_rows(rows_in[:npk])
            negmask = (rows_in[npk] & 1) != 0           # signed-digit lanes

            def cneg(Y):
                return jnp.where(negmask[None],
                                 fjnp.sub(self.ctx, jnp.zeros_like(Y), Y), Y)

            # v: (2*nl*ext, C, R); split affine coords, Z = 1
            if ext == 1:
                Xc, Yc = v[:nl], cneg(v[nl:])
            else:
                Xc = (v[:nl], v[nl:2 * nl])
                Yc = (cneg(v[2 * nl:3 * nl]), cneg(v[3 * nl:]))
            Zc = jax.tree.map(
                lambda o: jnp.broadcast_to(o, (nl, C, RL)),
                f.one((1, 1)))
            P = (Xc, Yc, Zc)
            S = jax.lax.associative_scan(
                lambda a, b: rcb.rcb_add(f, a, b, b3c), P, axis=1,
                reverse=True)
            rows = self._flat(S)                        # (nro, C, R)
            rows = rows[0::2] | (rows[1::2] << 16)      # packed like K1
            return jnp.moveaxis(rows, 0, 1)             # (C, nro/2, R)

        half = NBw // 2                                 # signed-digit bound
        n_bound = half                                  # boundaries t=1..half

        def window_scan(keys, xyp):
            """Per-window: ONE radix sort carries the packed point rows as
            sort payload (measured 2-3.5x faster than argsort + random row
            gather on v5e: the sort streams its passes, the gather pays a
            per-row latency), then K1 scan + the digit-boundary suffix
            rows.  keys = mag*2 + sign of the balanced digit; the sorted
            key column rides into the kernel so it can negate y on signed
            lanes.  Returns (A rows, lane totals, boundary lanes,
            validity)."""
            res = jax.lax.sort(
                (keys,) + tuple(xyp[i] for i in range(npk)),
                dimension=-1, num_keys=1)
            dsort = res[0]
            xys = jnp.concatenate(
                [jnp.stack(res[1:], axis=0),
                 dsort[None].astype(U32)], axis=0)      # (npk+1, Np) sorted
            xyT = (xys.reshape(npk + 1, RL, C)
                      .transpose(2, 0, 1))              # (C, npk+1, R)
            nro_p = nro // 2
            if use_pallas_scan:
                st_all = scan(
                    xyT.reshape(C, npk + 1, SB, LN)).reshape(C, nro_p, RL)
            else:
                st_all = scan_xla(xyT)                  # (C, nro/2, R) packed
            stf = (st_all.transpose(0, 2, 1)
                         .reshape(C * RL, nro_p))       # [c*R + r, :]
            tot = st_all[0]                             # lane totals (c == 0)
            # S(t) = sum of (signed) points with |digit| >= t = suffix at
            # the first sorted position with key >= 2t -- valid even for
            # absent magnitudes, so no phantom points are needed:
            #   sum_t S(t) = sum_i |d_i| sign_i P_i = sum_i d_i P_i.
            tvals = jnp.arange(2, 2 * half + 2, 2, dtype=jnp.int32)
            fidx = jnp.searchsorted(dsort, tvals)       # (half,) in [0, Np]
            valid = fidx < Np                           # t > max mag -> 0
            safe = jnp.minimum(fidx, Np - 1)
            lane = (safe // C).astype(jnp.int32)
            cpos = (safe % C).astype(jnp.int32)
            A = stf[cpos * RL + lane]                   # (half, nro/2)
            return A, tot, lane, valid

        def phase2(A_all, tot_all, lane_all, valid_all):
            """Batched over windows: cross-lane carry + bucket tree-sum.
            A_all/tot_all arrive PACKED (2 limbs per u32, K1's output
            stream format) and are unpacked here."""
            b3w = _dev_b3(self.ctx, self.b, ext, 2)
            totP = self._unflat(
                unpack_rows(tot_all.transpose(1, 0, 2)))  # (nl, nw, R)
            carry = _suffix_excl(f, totP, b3w, axis=-1)
            widx = jnp.arange(A_all.shape[0], dtype=jnp.int32)[:, None]
            Cr = jax.tree.map(lambda a: a[:, widx, lane_all], carry)
            Ap = self._unflat(
                unpack_rows(A_all.transpose(2, 0, 1)))    # (nl, nw, half)
            S = rcb.rcb_add(f, Ap, Cr, b3w)
            S = rcb.rcb_select(f, valid_all, S, rcb.rcb_zero(f, (1, 1)))
            # pad to a power of two for the halving tree
            width = jax.tree.leaves(S)[0].shape[-1]
            pow2 = 1 << (width - 1).bit_length()
            ident = rcb.rcb_zero(f, (1, 1))
            if pow2 != width:
                S = jax.tree.map(
                    lambda a, i: jnp.concatenate(
                        [a, jnp.broadcast_to(
                            i, a.shape[:-1] + (pow2 - width,))], axis=-1),
                    S, ident)
            W = _tree_sum(f, S, b3w, axis=-1)
            return self._flat(jax.tree.map(lambda a: a[..., 0], W))

        def msm_all(px, py, pinf, scalars):
            scal = jnp.where(pinf[None, :], jnp.zeros_like(scalars), scalars)
            digits = scal.astype(jnp.int32)
            # balanced signed recode: digit d -> d - NBw*(d > NBw/2), carry
            # into the next window; |digit| <= NBw/2 halves the bucket
            # range, so boundary rows, searchsorted and the tree-sum all
            # halve.  The top window never overflows for < cw*nw-bit
            # scalars (bn254: 254 < 256).
            keys = []
            cin = jnp.zeros(digits.shape[-1], jnp.int32)
            for w in range(nw):
                d = digits[w] + cin
                neg = d > half
                cin = neg.astype(jnp.int32)
                mag = jnp.where(neg, NBw - d, d)
                keys.append(mag * 2 + neg)
            if self.fr.p.bit_length() >= self.cw * nw:
                # scalars may fill every window: the final recode carry
                # needs its own window (skipped when p < 2^(cw*nw - 1), the
                # production bn254/bls12-381 cw=16 nw=16 case)
                keys.append(cin * 2)
            keys = jnp.stack(keys)
            xyp = self._xy_packed(px, py, pinf)
            A_all, tot_all, lane_all, valid_all = jax.lax.map(
                lambda k: window_scan(k, xyp), keys)
            return phase2(A_all, tot_all, lane_all, valid_all)

        self._prog_cache[key] = msm_all
        return msm_all

    def _jitted(self, C, nw):
        key = ("jit", C, nw)
        if key not in self._prog_cache:
            self._prog_cache[key] = jax.jit(self._program(C, nw))
        return self._prog_cache[key]

    @staticmethod
    def _pad_to(target, px, py, pinf, scalars):
        n = scalars.shape[-1]
        pad = target - n
        if pad:
            padl = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
            px = jax.tree.map(padl, px)
            py = jax.tree.map(padl, py)
            scalars = padl(scalars)
            pinf = jnp.pad(pinf, (0, pad), constant_values=True)
        return px, py, pinf, scalars

    def run(self, px, py, pinf, scalars, debug=None):
        """Full MSM; returns host jacobian int tuple (like msm.MSMContext)."""
        nw = scalars.shape[0]
        n = scalars.shape[-1]
        RL = _r_lanes()
        C = max(1, -(-n // RL))
        px, py, pinf, scalars = self._pad_to(C * RL, px, py, pinf,
                                             scalars)
        msm_all = self._jitted(C, nw)
        flatW = msm_all(px, py, pinf, scalars)          # (nro, nw)
        return self._finish(np.asarray(flatW))

    def run_sharded(self, mesh, px, py, pinf, scalars, axis: str = "d"):
        """MSM with points sharded over a mesh axis (SURVEY 2.10 axis 1).

        Every device runs the full suffix-scan Pippenger pipeline on its
        point shard; the (nro, nw) per-device window partials — a few KB —
        are the only cross-device data, combined on host bigints.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard_map = (jax.shard_map if hasattr(jax, "shard_map")
                     else jax.experimental.shard_map.shard_map)
        ndev = mesh.shape[axis]
        nw = scalars.shape[0]
        n = scalars.shape[-1]
        RL = _r_lanes()
        C = max(1, -(-n // (ndev * RL)))
        px, py, pinf, scalars = self._pad_to(ndev * C * RL, px, py,
                                             pinf, scalars)
        body = self._program(C, nw)

        def local(px, py, pinf, scal):
            return body(px, py, pinf, scal)[:, :, None]  # (nro, nw, 1)

        pt_spec = jax.tree.map(lambda _: P(None, axis), px)
        key = ("shard", C, nw, ndev, id(mesh))
        if key not in self._prog_cache:
            self._prog_cache[key] = jax.jit(shard_map(
                local, mesh=mesh,
                in_specs=(pt_spec, pt_spec, P(axis), P(None, axis)),
                out_specs=P(None, None, axis),
                check_vma=False,
            ))
        flatW = self._prog_cache[key](px, py, pinf, scalars)
        return self._finish(np.asarray(flatW))          # (nro, nw, ndev)

    def _finish(self, flatW: np.ndarray):
        """Host window combination (bigints): W = sum_w 2^(cw*w) W_w."""
        from . import msm as msm_mod

        fq, ext = self.fq, self.ext
        nl = fq.nl
        if flatW.ndim == 2:
            flatW = flatW[:, :, None]
        nw = flatW.shape[1]
        ndev = flatW.shape[2]

        def elem(rows, w, d):
            if ext == 1:
                return fq.from_mont(fjnp.np_to_ints(fq, rows[:, w, d:d + 1])[0])
            return (fq.from_mont(
                        fjnp.np_to_ints(fq, rows[:nl, w, d:d + 1])[0]),
                    fq.from_mont(
                        fjnp.np_to_ints(fq, rows[nl:, w, d:d + 1])[0]))

        total = None
        for w in range(nw - 1, -1, -1):
            if total is not None:
                for _ in range(self.cw):
                    total = msm_mod._host_jac_dbl(fq, total, ext)
            for d in range(ndev):
                X = elem(flatW[0 * nl * ext:1 * nl * ext], w, d)
                Y = elem(flatW[1 * nl * ext:2 * nl * ext], w, d)
                Z = elem(flatW[2 * nl * ext:3 * nl * ext], w, d)
                if msm_mod._f_is_zero(Z, ext):
                    continue
                Zi = _f_inv(fq, Z, ext)
                x = msm_mod._f_mul(fq, X, Zi, ext)
                y = msm_mod._f_mul(fq, Y, Zi, ext)
                total = msm_mod._host_jac_add(
                    fq, total, (x, y, msm_mod._f_int(1, ext)), ext)
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
def get_msm(curve_name: str, group: str = "g1", cw: int = LIMB_BITS) -> TpuMSM:
    from .host_curve import get_curve

    cv = get_curve(curve_name)
    if group == "g1":
        return TpuMSM(cv.fq, cv.fr, cv.b, cv.g1, ext=1, cw=cw)
    return TpuMSM(cv.fq, cv.fr, cv.b2, cv.g2, ext=2, cw=cw)
