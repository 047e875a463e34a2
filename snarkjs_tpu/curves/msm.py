"""Multi-scalar multiplication (Pippenger) as TPU-friendly array programs.

Replaces ffjavascript's `G1/G2.multiExpAffine` worker-pool MSM (the Groth16
hot spot, reference src/groth16_prove.js:85-101) with a sort-based bucket
method that has no scatter conflicts:

  per window (lax.scan over windows, one compiled program):
    1. digit extraction from plain-form scalar limbs (c-bit windows)
    2. stable sort of point indices by digit (XLA sort)
    3. segmented inclusive scan (associative, log-depth) accumulates runs of
       equal digits — the run-end element holds the bucket sum
    4. one conflict-free scatter of run-ends into the bucket array
    5. bucket reduction: reverse running-sum (sum_j j*B_j) via lax.scan,
       batched across nothing (per-window phase) but cheap
  window combination happens on host (a handful of bigint ops).

The points axis is the natural multi-chip sharding axis: each chip computes
bucket sums over its shard and the (2^c,) bucket arrays are reduced with a
jacobian-add tree (see snarkjs_tpu.parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fjnp
from ..fields.params import LIMB_BITS
from . import jac
from .gops import FqOps, Fq2Ops


def window_digits(scalars, c: int, nbits: int):
    """(NL, N) plain-form 16-bit limb scalars -> (nw, N) int32 window digits.

    c must divide LIMB_BITS or be a multiple of it (8 and 16 supported).
    """
    nl, n = scalars.shape
    nw = (nbits + c - 1) // c
    if c == LIMB_BITS:
        return scalars[:nw].astype(jnp.int32)
    if not 1 <= c <= LIMB_BITS:
        raise ValueError(f"unsupported window size {c}")
    mask = (1 << c) - 1
    digs = []
    for w in range(nw):
        i, sh = divmod(w * c, LIMB_BITS)
        v = scalars[i].astype(jnp.uint32) >> sh
        if sh + c > LIMB_BITS and i + 1 < nl:
            v = v | (scalars[i + 1].astype(jnp.uint32) << (LIMB_BITS - sh))
        digs.append((v & mask).astype(jnp.int32))
    return jnp.stack(digs, axis=0)


def _seg_scan_2level(f, P, seg_start, R: int, C: int):
    """Inclusive *segmented* scan (op = jacobian add) over n = R*C elements.

    Two-level scheme keeps the compiled graph tiny (three jac_add
    instantiations total) while staying O(n) work:
      1. lax.scan over the C columns of the (R, C) element grid — every lane r
         scans its contiguous chunk [r*C, (r+1)*C) sequentially, all lanes in
         parallel on the VPU.
      2. lane summaries composed with an exclusive lax.scan over R (width-1).
      3. one vectorized fixup combines each lane's carry into positions before
         the lane's first segment boundary.
    """
    def reshape_pt(Q, shape):
        return jax.tree.map(lambda a: a.reshape(a.shape[0], *shape), Q)

    Pg = reshape_pt(P, (R, C))                      # leaves (NL, R, C)
    flg = seg_start.reshape(R, C).astype(jnp.uint32)

    # move scanned axis (columns) to front: leaves (C, NL, R); flags (C, R)
    xs = (jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0), Pg),
          jnp.moveaxis(flg, -1, 0))

    def step(carry, x):
        (cv, cf) = carry
        (xv, xf) = x
        merged = jac.jac_add(f, cv, xv)
        val = jac.jac_select(f, xf != 0, xv, merged)
        return (val, cf | xf), val

    init = (jac.jac_zero(f, (R,)), jnp.zeros((R,), dtype=jnp.uint32))
    (tail, anyflag), ys = jax.lax.scan(step, init, xs)
    # ys leaves (C, NL, R) -> (NL, R, C)
    vals = jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), ys)

    # exclusive scan of per-lane summaries (tail, anyflag) over lanes
    summaries = (jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0), tail),
                 anyflag)  # leaves (R, NL), flags (R,)

    def lane_step(carry, s):
        (cv, cf) = carry
        (sv, sf) = s
        out = carry  # exclusive: emit carry before combining
        merged = jac.jac_add(f, cv, sv)
        val = jac.jac_select(f, sf != 0, sv, merged)
        return (val, cf | sf), out

    lane_init = (jac.jac_zero(f), jnp.zeros((), dtype=jnp.uint32))
    _, (carries, _) = jax.lax.scan(lane_step, lane_init, summaries)
    # carries leaves (R, NL) -> (NL, R, 1)
    carry_pts = jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1)[..., None], carries)

    # positions with no segment start at-or-before them within their lane get
    # the lane carry folded in; everything else keeps its in-lane scan value
    open_head = (jnp.cumsum(flg, axis=-1) == 0)      # (R, C)
    fixed = jac.jac_select(
        f, open_head,
        jac.jac_add(f, carry_pts, vals),
        vals,
    )
    return jax.tree.map(lambda a: a.reshape(a.shape[0], R * C), fixed)


def _bucket_accumulate(f, px, py, pinf, digits, c: int, R: int):
    """Bucket sums for one window.  Returns jacobian arrays with (2^c,) batch."""
    n = digits.shape[-1]
    assert n % R == 0
    C = n // R
    order = jnp.argsort(digits, stable=True)
    d_sorted = digits[order]
    P = jac.from_affine(f, f.gather(px, order), f.gather(py, order), pinf[order])

    prev = jnp.concatenate([jnp.full((1,), -1, dtype=d_sorted.dtype), d_sorted[:-1]])
    seg_start = d_sorted != prev
    scanned = _seg_scan_2level(f, P, seg_start, R, C)

    nxt = jnp.concatenate([d_sorted[1:], jnp.full((1,), -1, dtype=d_sorted.dtype)])
    run_end = d_sorted != nxt

    nb = 1 << c
    target = jnp.where(run_end, d_sorted, nb)  # trash slot nb for non-run-ends
    zero = jac.jac_zero(f, (nb + 1,))
    bucket = jax.tree.map(
        lambda buf, val: buf.at[..., target].set(val)[..., :nb], zero, scanned
    )
    return bucket


def _bucket_reduce_batched(f, buckets, c: int):
    """sum_{j>=1} j*B_j for all windows at once (batch = window axis).

    buckets: jacobian leaves (nw, NL, nb) — reverse running-sum over j.
    """
    nb = 1 << c
    nw = jax.tree.leaves(buckets)[0].shape[0]
    # leaves (nw, NL, nb) -> accessed per-j as (nw, NL); batch shape (nw,)
    bT = jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), buckets)  # (NL, nb, nw)

    def step(carry, j):
        total, acc = carry
        Bj = jax.tree.map(lambda a: a[..., j, :], bT)
        total = jac.jac_add(f, total, Bj)
        acc = jac.jac_add(f, acc, total)
        return (total, acc), None

    init = (jac.jac_zero(f, (nw,)), jac.jac_zero(f, (nw,)))
    (_, acc), _ = jax.lax.scan(step, init, jnp.arange(nb - 1, 0, -1))
    return acc  # leaves (NL, nw)


def _msm_device(f, px, py, pinf, scalars, c: int, nbits: int, R: int = 256):
    digits = window_digits(scalars, c, nbits)

    def per_window(_, dw):
        bucket = _bucket_accumulate(f, px, py, pinf, dw, c, R)
        return None, bucket

    _, buckets = jax.lax.scan(per_window, None, digits)
    return _bucket_reduce_batched(f, buckets, c)


def segmented_msm(f, px, py, pinf, scalars, seg, n_out: int, nbits: int,
                  R: int = 64):
    """Per-segment MSM: out[k] = sum_{i: seg[i]==k} scalars_i * P_i.

    seg must be sorted ascending (entries grouped by segment).  Used by the
    Groth16 setup's per-signal point composition (reference
    src/zkey_new.js:338-501 fans per-signal multiExpAffine calls to workers;
    here one batch scalar-mul + one segmented jacobian scan covers every
    signal).  Returns jacobian arrays with (n_out,) batch; empty segments
    come out as infinity (reference writes g1m_zero for them, :459-464).
    """
    n = seg.shape[0]
    assert n % R == 0
    C = n // R
    bits = jac.scalar_bits_from_limbs(scalars, nbits)
    P = jac.batch_scalar_mul(f, jac.from_affine(f, px, py, pinf), bits)

    prev = jnp.concatenate([jnp.full((1,), -1, dtype=seg.dtype), seg[:-1]])
    scanned = _seg_scan_2level(f, P, seg != prev, R, C)
    nxt = jnp.concatenate([seg[1:], jnp.full((1,), -1, dtype=seg.dtype)])
    run_end = seg != nxt
    target = jnp.where(run_end, seg, n_out)
    zero = jac.jac_zero(f, (n_out + 1,))
    out = jax.tree.map(
        lambda buf, val: buf.at[..., target].set(val)[..., :n_out],
        zero, scanned)
    return out


class MSMContext:
    """Holds the field adapter + host-side finishing for one group."""

    def __init__(self, fq_ctx, fp, extension: int = 1):
        self.fp = fp  # base field params (for host conversion)
        self.ctx = fq_ctx
        self.ext = extension
        self.f = FqOps(fq_ctx) if extension == 1 else Fq2Ops(fq_ctx)

    def run(self, px, py, pinf, scalars, c: int = 8, nbits: int | None = None,
            R: int | None = None, mesh=None, cw: int = 16,
            legacy: bool = False):
        """MSM over plain-form scalars.  Returns host jacobian int tuple.

        px/py: affine coordinates as (NL, N) arrays (Fq) or 2-tuples (Fq2),
        Montgomery form; pinf: (N,) bool infinity mask; scalars: (NL, N)
        16-bit limbs.  With `mesh`, points are sharded over its 'd' axis
        (the suffix-scan engine runs per shard, partials combine on host);
        `cw` selects the Pippenger window width (16 = production; 8 keeps
        interpret-mode compile cheap for off-TPU mesh validation).

        The suffix-scan engine (curves/msm_tpu.py) is the only production
        path — Pallas kernels on TPU, a compile-light associative-scan
        fallback elsewhere.  `legacy=True` reaches the old sort/segment
        XLA Pippenger (its own tests only; its giant unrolled programs
        could crash the XLA CPU compiler under a full-suite process).
        """
        if not legacy:
            # fused Pallas suffix-scan Pippenger (curves/msm_tpu.py)
            from . import msm_tpu
            from .host_curve import curve_from_q

            # narrow windows for small batches (and everywhere off-TPU):
            # bucket-combine work scales with 2^(cw-1), so a 63-point
            # consistency-check MSM must not pay a 2^15-bucket tree
            if cw == LIMB_BITS and (jax.default_backend() != "tpu"
                                    or scalars.shape[-1] < (1 << 14)):
                cw = 8
            cv = curve_from_q(self.fp.p)
            m = msm_tpu.get_msm(cv.name, "g1" if self.ext == 1 else "g2",
                                cw=cw)
            if cw == 8:
                lo = scalars & 0xFF
                hi = (scalars >> 8) & 0xFF
                scalars = jnp.stack([lo, hi], axis=1).reshape(
                    2 * scalars.shape[0], scalars.shape[1])
            elif cw != LIMB_BITS:
                raise ValueError("cw must be 8 or 16")
            if mesh is not None:
                return m.run_sharded(mesh, px, py, pinf, scalars)
            return m.run(px, py, pinf, scalars)
        if nbits is None:
            nbits = self.ctx.nl * LIMB_BITS
        n = scalars.shape[-1]
        if R is None:
            R = 256
        R = max(1, min(R, n))
        C = -(-n // R)
        npad = R * C - n
        if npad:
            padl = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, npad)])
            px = jax.tree.map(padl, px)
            py = jax.tree.map(padl, py)
            scalars = padl(scalars)
            pinf = jnp.pad(pinf, (0, npad), constant_values=True)
        fn = _get_msm_fn(self, c, nbits, R)
        wsums = fn(px, py, pinf, scalars)
        return self._finish(wsums, c, nbits)

    def _finish(self, wsums, c, nbits):
        """Combine window sums on host with bigint jacobian math."""
        fp = self.fp
        X, Y, Z = jax.tree.map(np.asarray, wsums)
        nw = (nbits + c - 1) // c

        def get(elem, w):
            if self.ext == 1:
                v = fjnp.np_to_ints(fp, elem[:, w])[0]
                return fp.from_mont(v)
            return tuple(fp.from_mont(fjnp.np_to_ints(fp, e[:, w])[0]) for e in elem)

        total = None
        for w in range(nw - 1, -1, -1):
            if total is not None:
                for _ in range(c):
                    total = _host_jac_dbl(fp, total, self.ext)
            pt = (get(X, w), get(Y, w), get(Z, w))
            total = _host_jac_add(fp, total, pt, self.ext)
        return total


@functools.lru_cache(maxsize=None)
def _msm_fn_cache():
    return {}


def _get_msm_fn(mctx: MSMContext, c: int, nbits: int, R: int):
    cache = _msm_fn_cache()
    key = (id(mctx.ctx), mctx.ext, c, nbits, R)
    if key not in cache:
        f = mctx.f

        @jax.jit
        def fn(px, py, pinf, scalars):
            return _msm_device(f, px, py, pinf, scalars, c, nbits, R)

        cache[key] = fn
    return cache[key]


# ---------------- host jacobian finishing (bigint, exact) ----------------

def _f_mul(fp, a, b, ext):
    if ext == 1:
        return a * b % fp.p
    return ((a[0] * b[0] - a[1] * b[1]) % fp.p, (a[0] * b[1] + a[1] * b[0]) % fp.p)


def _f_add(fp, a, b, ext):
    if ext == 1:
        return (a + b) % fp.p
    return ((a[0] + b[0]) % fp.p, (a[1] + b[1]) % fp.p)


def _f_sub(fp, a, b, ext):
    if ext == 1:
        return (a - b) % fp.p
    return ((a[0] - b[0]) % fp.p, (a[1] - b[1]) % fp.p)


def _f_is_zero(a, ext):
    return a == 0 if ext == 1 else (a[0] == 0 and a[1] == 0)


def _f_int(v, ext):
    return v if ext == 1 else (v, 0)


def _host_jac_dbl(fp, P, ext):
    X1, Y1, Z1 = P
    if _f_is_zero(Z1, ext):
        return P
    m = lambda a, b: _f_mul(fp, a, b, ext)
    s = lambda a, b: _f_sub(fp, a, b, ext)
    ad = lambda a, b: _f_add(fp, a, b, ext)
    A = m(X1, X1)
    B = m(Y1, Y1)
    C = m(B, B)
    D = ad(m(X1, B), m(X1, B))
    D = ad(D, D)
    E = ad(ad(A, A), A)
    F = m(E, E)
    X3 = s(F, ad(D, D))
    Y3 = s(m(E, s(D, X3)), ad(ad(ad(C, C), ad(C, C)), ad(ad(C, C), ad(C, C))))
    Z3 = ad(m(Y1, Z1), m(Y1, Z1))
    return (X3, Y3, Z3)


def _host_jac_add(fp, P, Q, ext):
    if P is None or _f_is_zero(P[2], ext):
        return Q
    if Q is None or _f_is_zero(Q[2], ext):
        return P
    m = lambda a, b: _f_mul(fp, a, b, ext)
    s = lambda a, b: _f_sub(fp, a, b, ext)
    ad = lambda a, b: _f_add(fp, a, b, ext)
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = m(Z1, Z1)
    Z2Z2 = m(Z2, Z2)
    U1 = m(X1, Z2Z2)
    U2 = m(X2, Z1Z1)
    S1 = m(m(Y1, Z2), Z2Z2)
    S2 = m(m(Y2, Z1), Z1Z1)
    H = s(U2, U1)
    r = ad(s(S2, S1), s(S2, S1))
    if _f_is_zero(H, ext):
        if _f_is_zero(r, ext):
            return _host_jac_dbl(fp, P, ext)
        return (_f_int(0, ext), _f_int(1, ext), _f_int(0, ext))
    I = m(ad(H, H), ad(H, H))
    J = m(H, I)
    V = m(U1, I)
    X3 = s(s(m(r, r), J), ad(V, V))
    Y3 = s(m(r, s(V, X3)), ad(m(S1, J), m(S1, J)))
    Z3 = m(H, s(s(m(ad(Z1, Z2), ad(Z1, Z2)), Z1Z1), Z2Z2))
    return (X3, Y3, Z3)


def host_jac_to_affine(fp, P, ext=1):
    """Jacobian int tuple -> affine ints (or None for infinity)."""
    if P is None or _f_is_zero(P[2], ext):
        return None
    X, Y, Z = P
    if ext == 1:
        zi = pow(Z, fp.p - 2, fp.p)
        zi2 = zi * zi % fp.p
        return (X * zi2 % fp.p, Y * zi2 % fp.p * zi % fp.p)
    # Fq2 inverse
    a, b = Z
    t = pow(a * a + b * b, fp.p - 2, fp.p)
    zi = (a * t % fp.p, (-b) * t % fp.p)
    zi2 = _f_mul(fp, zi, zi, 2)
    zi3 = _f_mul(fp, zi2, zi, 2)
    return (_f_mul(fp, X, zi2, 2), _f_mul(fp, Y, zi3, 2))
