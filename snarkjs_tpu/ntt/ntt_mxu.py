"""MXU (matmul) NTT over Fr: the TPU-native large-transform engine.

Replaces the per-stage elementwise butterfly NTT (ntt.py) on TPU, where 20
stages x full HBM round trips ran ~300x off roofline.  The reference's
multicore WASM FFT is the functional counterpart (use-sites reference
src/groth16_prove.js:66-76, src/plonk_prove.js fft/ifft calls); the design
here has no structural counterpart in the reference — it maps the transform
onto the TPU's systolic array:

* A size-2^k NTT is decomposed four-step style (Bailey) into size-<=1024
  sub-NTTs, each evaluated as a *dense matrix product* with the DFT matrix
  over Fp — the classic FHE-on-TPU formulation.  With n = n1*n2,
  j = j1 + n1*j2, k = n2*k1 + k2:

      X[n2*k1+k2] = sum_j1 w1^(j1*k1) * w^(j1*k2) * Y[j1, k2],
      Y[j1, k2]   = sum_j2 x[j1+n1*j2] * w2^(j2*k2)

  i.e. recurse over j2 (stage A), elementwise twiddle w^(j1*k2), recurse
  over j1 (stage B).  Both stages bottom out in dense matmuls.
* Field elements ride the MXU as *balanced signed 8-bit digits*: a value
  v < 2^(8*(nd-1)) is written v = sum_d s[d]*256^d with s[d] in [-128,127],
  so digit products fit the native s8 x s8 -> s32 matmul path.  A dense
  r x r DFT-matrix product over Fp becomes nd x nd digit-pair matmuls
  accumulated into 2*nd-1 int32 columns (column magnitude <= r*2^14*nd
  < 2^31), fused in a Pallas kernel so the shifted accumulation never
  touches HBM.
* The DFT matrices are stored as *plain* (non-Montgomery) residues: data
  stays in Montgomery form because sum w*(xR) = (sum w*x)*R.
* Column sums are reduced back to canonical 16-bit-limb form by a
  carry-normalize -> high-digit fold (one small s8 matmul against the
  2^(8c) mod p table) -> Barrett quotient-estimate pass.

Cost at 2^20 (bn254): 2 matmul stages x ~1.2e12 s8 MACs + one elementwise
twiddle + two normalizations — tens of ms on v5e vs 2828 ms for the
butterfly path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import fjnp
from ..fields.fjnp import FieldCtx
from ..fields.params import FieldParams, get_params

I8 = jnp.int8
I32 = jnp.int32
U32 = jnp.uint32

MAX_LOG_R = 10          # largest direct DFT matmul: 1024 x 1024
_PALLAS_MIN_M = 128     # below this column count use the einsum fallback


def _nd(fp: FieldParams) -> int:
    """Signed digits per element: one more than the byte length."""
    return fp.n8 + 1


# ------------------------------------------------------------------ host math


def _balanced_digits_int(v: int, nd: int):
    """v >= 0 -> nd signed base-256 digits in [-128, 127]."""
    out = []
    for _ in range(nd):
        d = v & 0xFF
        if d >= 128:
            d -= 256
        out.append(d)
        v = (v - d) >> 8
    assert v == 0, "value too large for digit count"
    return out


def _digits_np(vals, nd: int) -> np.ndarray:
    """list of ints -> (len, nd) int8 balanced digits."""
    out = np.empty((len(vals), nd), dtype=np.int8)
    for i, v in enumerate(vals):
        out[i] = _balanced_digits_int(int(v), nd)
    return out


def _root_powers(fp: FieldParams, root: int, n: int):
    out = [1] * n
    cur = 1
    for i in range(1, n):
        cur = cur * root % fp.p
        out[i] = cur
    return out


@functools.lru_cache(maxsize=None)
def _w_matrix_digits(field_name: str, k: int, inverse: bool) -> np.ndarray:
    """(nd, r, r) int8: balanced digits of the size-2^k DFT matrix, plain
    residues; inverse folds in r^-1."""
    fp = get_params(field_name)
    r = 1 << k
    nd = _nd(fp)
    root = fp.winv[k] if inverse else fp.w[k]
    scale = pow(r, fp.p - 2, fp.p) if inverse else 1
    pows = _root_powers(fp, root, r)
    if scale != 1:
        pows = [v * scale % fp.p for v in pows]
    digs = _digits_np(pows, nd)                     # (r, nd)
    idx = np.outer(np.arange(r, dtype=np.int64),
                   np.arange(r, dtype=np.int64)) % r
    return np.ascontiguousarray(digs[idx].transpose(2, 0, 1))  # (nd, r, r)


def _ints_to_limbs_np(fp: FieldParams, vals) -> np.ndarray:
    """list of ints (mod p) -> (nl, len) uint32 16-bit limbs (vectorized)."""
    buf = b"".join(int(v).to_bytes(fp.n8, "little") for v in vals)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(vals), fp.nl)
    return np.ascontiguousarray(u16.T.astype(np.uint32))


@functools.lru_cache(maxsize=None)
def _twiddle_parts(field_name: str, k: int, k1: int, inverse: bool):
    """Factored twiddle tables for T[k2, j1] = w^(+-j1*k2), w of order 2^k.

    The full (n2, n1) table is too large to embed as a jit constant at
    2^22+ (the compile payload blew the remote-compile request limit), so
    split k2 = k2lo + s*k2hi and return

        A (nl, s,     n1): A[k2lo, j1] = w^(j1*k2lo)      (Montgomery)
        B (nl, n2//s, n1): B[k2hi, j1] = w^(s*j1*k2hi)    (Montgomery)

    so T = A * B is ONE broadcast Montgomery multiply on device per call.
    """
    fp = get_params(field_name)
    n = 1 << k
    n1 = 1 << k1
    k2 = k - k1
    n2 = n >> k1
    s = 1 << ((k2 + 1) // 2)
    root = fp.winv[k] if inverse else fp.w[k]
    pows = _root_powers(fp, root, n)

    def table(step, rows):
        # out[i, j1] = w^(step * i * j1)
        idx = (np.outer(np.arange(rows, dtype=np.int64) * step,
                        np.arange(n1, dtype=np.int64))) % n
        mont = [fp.to_mont(v) for v in pows]
        tab = _ints_to_limbs_np(fp, mont)
        return np.ascontiguousarray(tab[:, idx])

    return s, table(1, s), table(s, n2 // s)


@functools.lru_cache(maxsize=None)
def _fold_tables(field_name: str, ncols: int):
    """Constants for column normalization (see _normalize_cols).

    Returns (nh, F) with F (nh+1, 2*n8+1) int8: balanced digits of
    2^(8*(2*n8+h)) mod p for h = 0..nh — the high-digit fold matrix.
    """
    fp = get_params(field_name)
    ndig = fp.n8                                     # u8 digits kept low
    ncap = ncols + 3                                 # u8 digits after carry
    nh = ncap - ndig                                 # high digits folded
    rows = [pow(256, ndig + h, fp.p) for h in range(nh + 1)]
    F = _digits_np(rows, ndig + 1)                   # (nh+1, ndig+1)
    return nh, F


@functools.lru_cache(maxsize=None)
def _barrett_consts(field_name: str, nh: int):
    """shift/mu for the quotient estimate; p and the fold-compensation
    constant C = 128*(nh+1)*p (added so the signed fold stays >= 0) as
    (nl+1)-limb tables."""
    fp = get_params(field_name)
    nbits = fp.n8 * 8
    shift = nbits - 6                                # T = V >> shift
    mu = (1 << (32 + shift)) // fp.p                 # q_hat = T*mu >> 32
    p_limbs = tuple(fp.limbs(fp.p)) + (0,)
    C = 128 * (nh + 1) * fp.p
    c_limbs = tuple((C >> (16 * i)) & 0xFFFF for i in range(fp.nl + 1))
    assert C < 1 << (16 * (fp.nl + 1))
    return shift, mu, p_limbs, c_limbs


# ------------------------------------------------------------ digit codecs


def _to_digits(fp: FieldParams, a):
    """(nl, ...) u32 16-bit limbs -> (nd, ...) int8 balanced digits."""
    nl = fp.nl
    lo = (a & 0xFF).astype(I32)
    hi = ((a >> 8) & 0xFF).astype(I32)
    u = jnp.stack([lo, hi], axis=1).reshape((2 * nl,) + a.shape[1:])
    ds = []
    c = jnp.zeros(a.shape[1:], dtype=I32)
    for d in range(2 * nl):
        v = u[d] + c
        m = (v >= 128).astype(I32)
        ds.append(v - 256 * m)
        c = m
    ds.append(c)
    return jnp.stack(ds).astype(I8)


def _normalize_cols(fp: FieldParams, cols):
    """(ncols, ...) int32 product columns -> (nl, ...) u32 canonical [0, p).

    cols represent sum_c cols[c]*256^c >= 0 (signed balanced-digit products).
    """
    ncols = cols.shape[0]
    nl = fp.nl
    ndig = fp.n8
    nh, F = _fold_tables(fp.name, ncols)
    ncap = ncols + 3
    # 1) signed carry-normalize to u8 digits
    digs = []
    c = jnp.zeros(cols.shape[1:], dtype=I32)
    for i in range(ncap):
        v = (cols[i] + c) if i < ncols else c
        digs.append(v & 0xFF)
        c = v >> 8
    lo = digs[:ndig]
    hi = digs[ndig:]                                  # nh values in [0,255]
    # 2) balanced-recode the high digits, fold via one small s8 matmul
    hs = []
    hc = jnp.zeros(cols.shape[1:], dtype=I32)
    for d in range(nh):
        v = hi[d] + hc
        m = (v >= 128).astype(I32)
        hs.append(v - 256 * m)
        hc = m
    hs.append(hc)
    hi8 = jnp.stack(hs).astype(I8)                    # (nh+1, r, m)
    Fj = jnp.asarray(F)
    fold = jnp.einsum("hrm,hd->drm", hi8, Fj,
                      preferred_element_type=I32)     # (ndig+1, r, m)
    # 3) combine into 16-bit limbs (nl+1 of them), signed carries; add the
    # compensation constant C = 128*(nh+1)*p so V' = V + C >= 0
    shift, mu, p_limbs, c_limbs = _barrett_consts(fp.name, nh)
    c = jnp.zeros(cols.shape[1:], dtype=I32)
    limbs = []
    for i in range(nl + 1):
        d0 = lo[2 * i] if 2 * i < ndig else 0
        d1 = lo[2 * i + 1] if 2 * i + 1 < ndig else 0
        f0 = fold[2 * i] if 2 * i < ndig + 1 else 0
        f1 = fold[2 * i + 1] if 2 * i + 1 < ndig + 1 else 0
        v = d0 + f0 + ((d1 + f1) << 8) + c_limbs[i] + c
        limbs.append(v & 0xFFFF)
        c = v >> 16
    # V' < 2^nbits + 2*128*(nh+1)*p < 2^(nbits+11); top carry == 0
    # 4) Barrett: q_hat = (V' >> shift) * mu >> 32, V' -= q_hat * p
    sl, sb = divmod(shift, 16)
    T = (limbs[sl] >> sb)
    for j in range(sl + 1, nl + 1):
        off = 16 * (j - sl) - sb
        if off < 22:
            T = T | (limbs[j] << off)
    # T < 2^17; mu < 2^28-ish: exact T*mu >> 32 via 16-bit splits
    mu_lo, mu_hi = mu & 0xFFFF, mu >> 16
    T_lo, T_hi = T & 0xFFFF, T >> 16
    # q_hat = floor(T*mu / 2^32)
    mid = T_lo * mu_hi + T_hi * mu_lo + ((T_lo * mu_lo) >> 16)
    q = T_hi * mu_hi + (mid >> 16)                    # < 2^20
    q_lo, q_hi = q & 0xFFFF, q >> 16
    c = jnp.zeros_like(q)
    sub = []
    for i in range(nl + 1):
        pi = p_limbs[i]
        pim = p_limbs[i - 1] if i >= 1 else 0
        v = q_lo * pi + q_hi * pim + c
        sub.append(v & 0xFFFF)
        c = v >> 16
    # V -= q*p  (borrow-chain subtract)
    b = jnp.zeros_like(q)
    out = []
    for i in range(nl + 1):
        v = limbs[i] - sub[i] - b
        out.append(v & 0xFFFF)
        b = (v >> 16) & 1
    # 5) final conditional subtracts: V in [0, ~3p)
    for _ in range(2):
        bb = jnp.zeros_like(q)
        diff = []
        for i in range(nl + 1):
            v = out[i] - p_limbs[i] - bb
            diff.append(v & 0xFFFF)
            bb = (v >> 16) & 1
        keep = bb.astype(jnp.bool_)
        out = [jnp.where(keep, o, d) for o, d in zip(out, diff)]
    return jnp.stack(out[:nl]).astype(U32)


# --------------------------------------------------------------- stage matmul


@functools.lru_cache(maxsize=None)
def _pallas_mm(nd: int, r_out: int, q: int, m: int, kt: int, mt: int):
    """Fused digit-product matmul: W8 (nd,r_out,q) s8, D8 (nd,q,m) s8 ->
    cols (2nd-1, r_out, m) int32."""
    nc = 2 * nd - 1

    def kernel(w_ref, d_ref, o_ref, acc_ref):
        c = pl.program_id(2)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for i in range(nd):
            j = c - i

            @pl.when(jnp.logical_and(j >= 0, j < nd))
            def _():
                dj = d_ref[jnp.maximum(j, 0) % nd]
                acc_ref[...] += jax.lax.dot_general(
                    w_ref[i], dj, (((1,), (0,)), ((), ())),
                    preferred_element_type=I32)
        o_ref[0] = acc_ref[...]

    def run(W8, D8):
        return pl.pallas_call(
            kernel,
            grid=(r_out // kt, m // mt, nc),
            in_specs=[
                pl.BlockSpec((nd, kt, q), lambda a, b, c: (0, a, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nd, q, mt), lambda a, b, c: (0, 0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, kt, mt), lambda a, b, c: (c, a, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nc, r_out, m), I32),
            scratch_shapes=[pltpu.VMEM((kt, mt), I32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(W8, D8)

    return run


@functools.lru_cache(maxsize=None)
def _pallas_mm_norm(fp_name: str, r_out: int, q: int, m: int, kt: int,
                    mt: int, interpret: bool = False):
    """Digit matmul with the column NORMALIZATION fused as the kernel
    epilogue: W8 (nd,r_out,q) s8, D8 (nd,q,m) s8 -> (nl, r_out, m) u32
    canonical limbs.  The unfused path wrote 2nd-1 i32 column planes
    (~272 MB per 2^20 stage) to HBM and re-read them in an XLA normalize
    pass; here the columns live in a VMEM scratch accumulator across the
    c-grid and only the nl u16-limb planes ever reach HBM."""
    fp = get_params(fp_name)
    nd = _nd(fp)
    nc = 2 * nd - 1
    nl = fp.nl
    ndig = fp.n8
    nh, F = _fold_tables(fp_name, nc)
    shift, mu, p_limbs, c_limbs = _barrett_consts(fp_name, nh)
    ncap = nc + 3

    def kernel(w_ref, d_ref, o_ref, acc_ref):
        c = pl.program_id(2)

        @pl.when(c == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        for i in range(nd):
            j = c - i

            @pl.when(jnp.logical_and(j >= 0, j < nd))
            def _():
                dj = d_ref[jnp.maximum(j, 0) % nd]
                acc_ref[c] += jax.lax.dot_general(
                    w_ref[i], dj, (((1,), (0,)), ((), ())),
                    preferred_element_type=I32)

        @pl.when(c == nc - 1)
        def _epilogue():
            zeros = jnp.zeros((kt, mt), I32)
            # 1) signed carry-normalize to u8 digits
            digs = []
            carry = zeros
            for i in range(ncap):
                v = (acc_ref[i] + carry) if i < nc else carry
                digs.append(v & 0xFF)
                carry = v >> 8
            lo = digs[:ndig]
            hi = digs[ndig:]
            # 2) balanced-recode high digits, fold via the constant table
            hs = []
            hc = zeros
            for d in range(nh):
                v = hi[d] + hc
                mneg = (v >= 128).astype(I32)
                hs.append(v - 256 * mneg)
                hc = mneg
            hs.append(hc)
            fold = []
            for dd in range(ndig + 1):
                accv = None
                for h in range(nh + 1):
                    fv = int(F[h, dd])
                    if fv == 0:
                        continue
                    t = hs[h] * fv
                    accv = t if accv is None else accv + t
                fold.append(accv if accv is not None else zeros)
            # 3) combine into 16-bit limbs + compensation constant
            cc = zeros
            limbs = []
            for i in range(nl + 1):
                d0 = lo[2 * i] if 2 * i < ndig else 0
                d1 = lo[2 * i + 1] if 2 * i + 1 < ndig else 0
                f0 = fold[2 * i] if 2 * i < ndig + 1 else 0
                f1 = fold[2 * i + 1] if 2 * i + 1 < ndig + 1 else 0
                v = d0 + f0 + ((d1 + f1) << 8) + c_limbs[i] + cc
                limbs.append(v & 0xFFFF)
                cc = v >> 16
            # 4) Barrett quotient estimate + subtract q*p
            sl, sb = divmod(shift, 16)
            T = limbs[sl] >> sb
            for j2 in range(sl + 1, nl + 1):
                off = 16 * (j2 - sl) - sb
                if off < 22:
                    T = T | (limbs[j2] << off)
            mu_lo, mu_hi = mu & 0xFFFF, mu >> 16
            T_lo, T_hi = T & 0xFFFF, T >> 16
            mid = T_lo * mu_hi + T_hi * mu_lo + ((T_lo * mu_lo) >> 16)
            qv = T_hi * mu_hi + (mid >> 16)
            q_lo, q_hi = qv & 0xFFFF, qv >> 16
            cc = zeros
            sub = []
            for i in range(nl + 1):
                pi = p_limbs[i]
                pim = p_limbs[i - 1] if i >= 1 else 0
                v = q_lo * pi + q_hi * pim + cc
                sub.append(v & 0xFFFF)
                cc = v >> 16
            bb = zeros
            outv = []
            for i in range(nl + 1):
                v = limbs[i] - sub[i] - bb
                outv.append(v & 0xFFFF)
                bb = (v >> 16) & 1
            # 5) final conditional subtracts
            for _ in range(2):
                b2 = zeros
                diff = []
                for i in range(nl + 1):
                    v = outv[i] - p_limbs[i] - b2
                    diff.append(v & 0xFFFF)
                    b2 = (v >> 16) & 1
                keep = b2.astype(jnp.bool_)
                outv = [jnp.where(keep, o, d2)
                        for o, d2 in zip(outv, diff)]
            o_ref[...] = jnp.stack(outv[:nl]).astype(U32)

    def run(W8, D8):
        return pl.pallas_call(
            kernel,
            grid=(r_out // kt, m // mt, nc),
            in_specs=[
                pl.BlockSpec((nd, kt, q), lambda a, b, c: (0, a, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nd, q, mt), lambda a, b, c: (0, 0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nl, kt, mt), lambda a, b, c: (0, a, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nl, r_out, m), U32),
            scratch_shapes=[pltpu.VMEM((nc, kt, mt), I32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(W8, D8)

    return run


def _einsum_mm(W8, D8):
    """Portable digit-product matmul (CPU tests / small shapes)."""
    nd = W8.shape[0]
    nc = 2 * nd - 1
    cols = []
    for c in range(nc):
        ii = [i for i in range(nd) if 0 <= c - i < nd]
        jj = [c - i for i in ii]
        cols.append(jnp.einsum(
            "pkq,pqm->km", W8[np.array(ii)], D8[np.array(jj)],
            preferred_element_type=I32))
    return jnp.stack(cols)


def _mm_stage(ctx: FieldCtx, k: int, inverse: bool, a):
    """Direct DFT matmul along axis 1: a (nl, r, m) -> (nl, r, m)."""
    fp = ctx.fp
    r = 1 << k
    m = a.shape[2]
    nd = _nd(fp)
    W8 = jnp.asarray(_w_matrix_digits(fp.name, k, inverse))
    D8 = _to_digits(fp, a)                            # (nd, r, m)
    use_pallas = (jax.default_backend() == "tpu" and r >= 256
                  and m >= _PALLAS_MIN_M and m % 128 == 0)
    if use_pallas:
        import os

        if os.environ.get("SNARKJS_NTT_FUSED") == "1":
            # fused matmul+normalize epilogue: measured SLOWER on v5e
            # (43.5 vs 32.6 ms at 2^20 — the 128-wide tiles it needs for
            # VMEM lose more MXU efficiency than skipping the column HBM
            # round trip gains), kept for future tile-shape work
            return _pallas_mm_norm(fp.name, r, r, m, min(128, r), 128)(
                W8, D8)
        kt = min(256, r)
        mt = 256 if m % 256 == 0 else 128
        cols = _pallas_mm(nd, r, r, m, kt, mt)(W8, D8)
    else:
        cols = _einsum_mm(W8, D8)
    return _normalize_cols(fp, cols)


# ------------------------------------------------------------------- the NTT


def _ntt_axis1(ctx: FieldCtx, a, inverse: bool):
    """NTT along axis 1 of a (nl, sz, bt); returns same shape."""
    nl, sz, bt = a.shape
    k = sz.bit_length() - 1
    if k == 0:
        return a
    if k <= MAX_LOG_R:
        return _mm_stage(ctx, k, inverse, a)
    k1 = MAX_LOG_R
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2
    # stage A: NTT over j2 for each (j1, bt)
    y = _ntt_axis1(ctx, a.reshape(nl, n2, n1 * bt), inverse)
    y = y.reshape(nl, n2, n1, bt)
    # twiddle w^(j1*k2), built on device from two factored ladders
    s, A, B = _twiddle_parts(ctx.fp.name, k, k1, inverse)
    tw = fjnp.mont_mul(
        ctx,
        jnp.asarray(A).reshape(nl, 1, s, n1),
        jnp.asarray(B).reshape(nl, n2 // s, 1, n1)).reshape(nl, n2, n1)
    y = fjnp.mont_mul(ctx, y, tw[:, :, :, None])
    # stage B: NTT over j1 for each (k2, bt)
    y = y.transpose(0, 2, 1, 3).reshape(nl, n1, n2 * bt)
    z = _ntt_axis1(ctx, y, inverse)
    # output order: out[k1*n2 + k2]
    return z.reshape(nl, n1 * n2, bt)


def ntt(ctx: FieldCtx, a):
    """Forward NTT, natural order, Montgomery form (same contract as
    ntt.ntt)."""
    n = a.shape[-1]
    k = n.bit_length() - 1
    assert 1 << k == n
    assert k <= ctx.fp.s
    if k == 0:
        return a
    return _ntt_axis1(ctx, a.reshape(ctx.nl, n, 1), False).reshape(
        ctx.nl, n)


def intt(ctx: FieldCtx, a):
    n = a.shape[-1]
    k = n.bit_length() - 1
    assert 1 << k == n
    if k == 0:
        return a
    return _ntt_axis1(ctx, a.reshape(ctx.nl, n, 1), True).reshape(
        ctx.nl, n)
