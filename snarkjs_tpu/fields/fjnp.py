"""Vectorized prime-field arithmetic for TPU (JAX/XLA).

Replaces the reference's WASM field engine (ffjavascript Fr/Fq, consumed at
e.g. reference src/groth16_prove.js:66-101) with whole-array TPU math.

Representation
--------------
A batch of field elements is a uint32 array of shape ``(NL, *batch)`` —
limb-major so the (large) batch dimension lands on TPU lanes and the small
limb dimension on sublanes.  Each limb holds 16 bits (LIMB_BITS); a product
of two limbs fits in uint32, and per-column sums of <= 2*NL limb-halves stay
below 2^22, so carries are deferred to a single propagation pass.

All mutating-style ops are pure functions; everything here is jit-safe with
static shapes, no data-dependent control flow.

Montgomery multiplication: product-scanning (3 school-book limb convolutions:
a*b, m = t*p' mod R, t + m*p) with deferred carries; ~3*NL^2 uint32 multiplies
per element, fully vectorized over the batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .params import LIMB_BITS, LIMB_MASK, FieldParams

U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


class FieldCtx:
    """JAX-side constants for one prime field, shaped for limb-major math."""

    def __init__(self, fp: FieldParams):
        self.fp = fp
        self.nl = fp.nl
        self.p_np = np.array(fp.limbs(fp.p), dtype=np.uint32)
        self.pinv_np = np.array(fp.limbs(fp.pinv_neg), dtype=np.uint32)
        self.r2_np = np.array(fp.limbs(fp.R2), dtype=np.uint32)
        self.one_np = np.array(fp.limbs(fp.one_mont), dtype=np.uint32)
        # exponent bits for inversion (p-2), most-significant first
        self.inv_exp_bits = [int(b) for b in bin(fp.p - 2)[2:]]

    # constants broadcast against (NL, *batch)
    def _c(self, arr_np, batch_ndim):
        return jnp.asarray(arr_np).reshape((self.nl,) + (1,) * batch_ndim)

    def p(self, x):
        return self._c(self.p_np, x.ndim - 1)

    def pinv(self, x):
        return self._c(self.pinv_np, x.ndim - 1)

    def r2(self, x):
        return self._c(self.r2_np, x.ndim - 1)

    def one(self, batch_shape=()):
        return jnp.broadcast_to(
            self._c(self.one_np, len(batch_shape)), (self.nl,) + tuple(batch_shape)
        ).astype(U32)

    def zero(self, batch_shape=()):
        return jnp.zeros((self.nl,) + tuple(batch_shape), dtype=U32)


@functools.lru_cache(maxsize=None)
def get_ctx(name_or_params) -> FieldCtx:
    from .params import get_params

    if isinstance(name_or_params, str):
        return FieldCtx(get_params(name_or_params))
    return FieldCtx(name_or_params)


# ---------------- carry / borrow primitives ----------------
#
# Two code paths, chosen once at import by backend:
#   * TPU (axon/tpu): limb chains fully unrolled — Mosaic/XLA-TPU compiles
#     large graphs quickly and unrolled chains fuse into one kernel, which
#     matters because curve ops run inside lax.scan bodies (a fori_loop per
#     montmul would serialize ~100 tiny device steps per scan iteration).
#   * CPU: lax.fori_loop bodies — XLA-CPU compile time scales ~10ms/HLO-op,
#     so unrolled chains made a single jac_add take minutes to compile.

def _use_unrolled() -> bool:
    import os

    env = os.environ.get("SNARKJS_TPU_UNROLL")
    if env is not None:
        return env not in ("0", "false")
    # With the Pallas fast path active the non-Pallas code is only used for
    # small/irregular shapes, where the loop path compiles far faster.
    if _use_pallas():
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _use_pallas() -> bool:
    """Route bulk field ops through Pallas TPU kernels (fpal).

    The pure-XLA limb code is kept as the portable path (CPU tests, TPU
    fallback via SNARKJS_TPU_PALLAS=0).  On this TPU backend the XLA paths
    are not viable for the hot loops: unrolled limb chains compile
    pathologically slowly and fori_loop chains run ~1000x off the roofline
    (dynamic-update-slice copies per limb step).
    """
    import os

    global _PALLAS
    if _PALLAS is None:
        env = os.environ.get("SNARKJS_TPU_PALLAS")
        if env is not None:
            _PALLAS = env not in ("0", "false")
        else:
            try:
                _PALLAS = jax.default_backend() == "tpu"
            except Exception:
                _PALLAS = False
    return _PALLAS


_PALLAS = None


def _pal(ctx):
    from . import fpal

    return fpal.get_pal(ctx.fp)


UNROLL_LIMBS = None  # resolved lazily on first kernel build


def _unrolled() -> bool:
    global UNROLL_LIMBS
    if UNROLL_LIMBS is None:
        UNROLL_LIMBS = _use_unrolled()
    return UNROLL_LIMBS


def _carry_prop(cols):
    """Propagate carries across limb axis 0; cols values < 2^32 arbitrary.

    Returns 16-bit limbs, same shape, plus the final carry-out.
    """
    n = cols.shape[0]
    if _unrolled():
        out = []
        carry = jnp.zeros(cols.shape[1:], dtype=U32)
        for k in range(n):
            v = cols[k] + carry
            out.append(v & _MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(out, axis=0), carry

    def body(k, state):
        buf, carry = state
        v = jax.lax.dynamic_index_in_dim(buf, k, 0, keepdims=False) + carry
        buf = jax.lax.dynamic_update_index_in_dim(buf, v & _MASK, k, 0)
        return (buf, v >> LIMB_BITS)

    init = (cols, jnp.zeros(cols.shape[1:], dtype=U32))
    buf, carry = jax.lax.fori_loop(0, n, body, init)
    return buf, carry


def _sub_limbs(a, b):
    """a - b limbwise with borrow chain.  Returns (diff, borrow_out)."""
    bshape = jnp.broadcast_shapes(a.shape, b.shape)
    n = bshape[0]
    base = np.uint32(1 << LIMB_BITS)
    if _unrolled():
        out = []
        borrow = jnp.zeros(bshape[1:], dtype=U32)
        for k in range(n):
            d = a[k] + base - b[k] - borrow
            out.append(jnp.broadcast_to(d & _MASK, bshape[1:]))
            borrow = np.uint32(1) - (d >> LIMB_BITS)
        return jnp.stack(out, axis=0), borrow

    a = jnp.broadcast_to(a, bshape)
    b = jnp.broadcast_to(b, bshape)

    def body(k, state):
        buf, borrow = state
        d = (jax.lax.dynamic_index_in_dim(a, k, 0, keepdims=False) + base
             - jax.lax.dynamic_index_in_dim(b, k, 0, keepdims=False) - borrow)
        buf = jax.lax.dynamic_update_index_in_dim(buf, d & _MASK, k, 0)
        return (buf, np.uint32(1) - (d >> LIMB_BITS))

    init = (jnp.zeros(bshape, dtype=U32), jnp.zeros(bshape[1:], dtype=U32))
    return jax.lax.fori_loop(0, n, body, init)


def _add_limbs(a, b):
    bshape = jnp.broadcast_shapes(a.shape, b.shape)
    n = bshape[0]
    if _unrolled():
        out = []
        carry = jnp.zeros(bshape[1:], dtype=U32)
        for k in range(n):
            v = a[k] + b[k] + carry
            out.append(jnp.broadcast_to(v & _MASK, bshape[1:]))
            carry = v >> LIMB_BITS
        return jnp.stack(out, axis=0), carry

    a = jnp.broadcast_to(a, bshape)
    b = jnp.broadcast_to(b, bshape)

    def body(k, state):
        buf, carry = state
        v = (jax.lax.dynamic_index_in_dim(a, k, 0, keepdims=False)
             + jax.lax.dynamic_index_in_dim(b, k, 0, keepdims=False) + carry)
        buf = jax.lax.dynamic_update_index_in_dim(buf, v & _MASK, k, 0)
        return (buf, v >> LIMB_BITS)

    init = (jnp.zeros(bshape, dtype=U32), jnp.zeros(bshape[1:], dtype=U32))
    return jax.lax.fori_loop(0, n, body, init)


def _cond_sub_p(ctx, limbs, carry):
    """Reduce (carry*R + limbs) < 2p to [0, p) with one conditional subtract."""
    diff, borrow = _sub_limbs(limbs, ctx.p(limbs))
    use_diff = (carry + (np.uint32(1) - borrow)) >= np.uint32(1)
    return jnp.where(use_diff[None, ...], diff, limbs)


# ---------------- modular add / sub / neg ----------------
#
# Public elementwise ops route through `_op_jit`: a jitted callable with
# STABLE identity per (field, op).  Without it every eager call rebuilds
# the fori_loop closures, so lax.scan/fori retrace AND recompile per call
# (~85 ms each on XLA CPU — a small PLONK prove spent 250+ s in thousands
# of identical tiny compiles).  With it, repeat calls hit the C++ jit
# fastpath and each (op, shape) compiles exactly once per process.


@functools.lru_cache(maxsize=None)
def _op_jit(fname: str, op: str, static=()):
    ctx = get_ctx(fname)
    impl = _OP_IMPLS[op]
    return jax.jit(lambda *args: impl(ctx, *args, *static))


def add(ctx: FieldCtx, a, b):
    return _op_jit(ctx.fp.name, "add")(a, b)


def sub(ctx: FieldCtx, a, b):
    return _op_jit(ctx.fp.name, "sub")(a, b)


def neg(ctx: FieldCtx, a):
    return _op_jit(ctx.fp.name, "neg")(a)


def _add_impl(ctx: FieldCtx, a, b):
    if _use_pallas():
        return _pal(ctx).add(a, b)
    s, carry = _add_limbs(a, b)
    return _cond_sub_p(ctx, s, carry)


def _sub_impl(ctx: FieldCtx, a, b):
    if _use_pallas():
        return _pal(ctx).sub(a, b)
    d, borrow = _sub_limbs(a, b)
    fixed, _ = _add_limbs(d, ctx.p(d))
    return jnp.where((borrow == 1)[None, ...], fixed, d)


def _neg_impl(ctx: FieldCtx, a):
    if _use_pallas():
        return _pal(ctx).neg(a)
    z = jnp.zeros_like(a)
    return jnp.where(is_zero(ctx, a)[None, ...], z, _sub_limbs(ctx.p(a) + z, a)[0])


def is_zero(ctx: FieldCtx, a):
    return jnp.all(a == 0, axis=0)


def eq(ctx: FieldCtx, a, b):
    return jnp.all(a == b, axis=0)


# ---------------- multiplication ----------------

def _conv_columns(a, b, na, nb, out_cols):
    """Column sums of the limb product a*b (deferred carries).

    a: (na, *B), b: (nb, *B) -> (out_cols, *B) where column k accumulates
    lo/hi halves of all a_i*b_j with i+j == k (hi goes to column k+1).

    Runs as a fori_loop over a's limbs; the scratch buffer is padded to
    na+nb+1 columns so every iteration uses the same static update width,
    then truncated to out_cols (the low-mul case simply discards the tail).
    """
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    scratch_cols = na + nb + 1
    if _unrolled():
        cols = [jnp.zeros(batch, dtype=U32) for _ in range(out_cols)]
        for i in range(na):
            hi_limit = min(nb, out_cols - i - 1)
            lo_limit = min(nb, out_cols - i)
            if lo_limit <= 0:
                break
            prod = a[i][None, ...] * b[:lo_limit]
            for j in range(lo_limit):
                cols[i + j] = cols[i + j] + (prod[j] & _MASK)
            for j in range(hi_limit):
                cols[i + 1 + j] = cols[i + 1 + j] + (prod[j] >> LIMB_BITS)
        return jnp.stack(cols, axis=0)

    b_full = jnp.broadcast_to(b, (nb,) + batch)

    def body(i, cols):
        ai = jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
        prod = ai[None, ...] * b_full
        lo = prod & _MASK
        hi = prod >> LIMB_BITS
        win = jax.lax.dynamic_slice_in_dim(cols, i, nb + 1, 0)
        win = win.at[:nb].add(lo).at[1:].add(hi)
        return jax.lax.dynamic_update_slice_in_dim(cols, win, i, 0)

    cols = jnp.zeros((scratch_cols,) + batch, dtype=U32)
    cols = jax.lax.fori_loop(0, na, body, cols)
    return cols[:out_cols]


def mont_mul(ctx: FieldCtx, a, b):
    """Montgomery product a*b*R^-1 mod p.  Inputs/outputs in [0, p)."""
    return _op_jit(ctx.fp.name, "mont_mul")(a, b)


def _mont_mul_impl(ctx: FieldCtx, a, b):
    if _use_pallas():
        return _pal(ctx).mont_mul(a, b)
    n = ctx.nl
    # t = a*b  (2n limbs after carry)
    t_cols = _conv_columns(a, b, n, n, 2 * n)
    t, t_top = _carry_prop(t_cols)  # t_top == 0 since a,b < p < R

    # m = (t mod R) * (-p^-1) mod R   (low n limbs only)
    m_cols = _conv_columns(t[:n], ctx.pinv(t), n, n, n)
    m, _ = _carry_prop(m_cols)

    # u = (t + m*p) / R
    u_cols = _conv_columns(m, ctx.p(t), n, n, 2 * n)
    u_cols = u_cols.at[: 2 * n].add(t)
    u, carry = _carry_prop(u_cols)
    # low n limbs of u are zero by construction; result is u[n:] plus carry
    res = u[n:]
    carry = carry + t_top  # t_top always 0; kept for clarity
    return _cond_sub_p(ctx, res, carry)


def mont_sqr(ctx: FieldCtx, a):
    return mont_mul(ctx, a, a)


def to_mont(ctx: FieldCtx, a):
    return _op_jit(ctx.fp.name, "to_mont")(a)


def _to_mont_impl(ctx: FieldCtx, a):
    return _mont_mul_impl(ctx, a, ctx.r2(a))


def from_mont(ctx: FieldCtx, a):
    return _op_jit(ctx.fp.name, "from_mont")(a)


def _from_mont_impl(ctx: FieldCtx, a):
    if _use_pallas():
        one_plain = jnp.zeros((ctx.nl,) + (1,) * (a.ndim - 1), dtype=U32)
        one_plain = one_plain.at[0].set(1)
        return _pal(ctx).mont_mul(a, one_plain)
    n = ctx.nl
    # mont_mul(a, 1): t = a
    m_cols = _conv_columns(a, ctx.pinv(a), n, n, n)
    m, _ = _carry_prop(m_cols)
    u_cols = _conv_columns(m, ctx.p(a), n, n, 2 * n)
    u_cols = u_cols.at[:n].add(a)
    u, carry = _carry_prop(u_cols)
    return _cond_sub_p(ctx, u[n:], carry)


def scalar_mul_small(ctx: FieldCtx, a, k: int):
    """a * k for tiny python int k (repeated addition)."""
    assert 0 <= k < 16
    r = ctx.zero(a.shape[1:])
    base = a
    kk = k
    while kk:
        if kk & 1:
            r = add(ctx, r, base)
        base = add(ctx, base, base)
        kk >>= 1
    return r


def exp_const(ctx: FieldCtx, a, e: int):
    return _op_jit(ctx.fp.name, "exp_const", (e,))(a)


def _exp_const_impl(ctx: FieldCtx, a, e: int):
    """a^e (Montgomery in, Montgomery out) with a static Python-int exponent.

    Small exponents unroll (no wasted multiplies); large ones use a lax.scan
    over the bit string so the compiled graph stays O(1) in exponent size.
    """
    if e == 0:
        return ctx.one(a.shape[1:])
    bits = bin(e)[2:]
    if len(bits) <= 24:
        r = None
        for bit in bits:
            if r is not None:
                r = mont_sqr(ctx, r)
            if bit == "1":
                r = a if r is None else mont_mul(ctx, r, a)
        return r

    bit_arr = jnp.array([int(b) for b in bits], dtype=jnp.bool_)

    def body(r, bit):
        r = mont_sqr(ctx, r)
        r = jnp.where(bit, mont_mul(ctx, r, a), r)
        return r, None

    r0 = jnp.broadcast_to(ctx.one(tuple(1 for _ in a.shape[1:])),
                          a.shape).astype(U32)
    r, _ = jax.lax.scan(body, r0, bit_arr)
    return r


def inv(ctx: FieldCtx, a):
    """a^-1 via Fermat (static p-2 exponent chain).  0 -> 0."""
    return exp_const(ctx, a, ctx.fp.p - 2)


def batch_inverse(ctx: FieldCtx, a, axis=-1):
    return _op_jit(ctx.fp.name, "batch_inverse", (axis,))(a)


def _batch_inverse_impl(ctx: FieldCtx, a, axis=-1):
    """Montgomery batch inversion along `axis` (batch axis, not limb axis).

    Equivalent of ffjavascript Fr.batchInverse (use-site reference
    src/plonk_prove.js:420).  Zeros map to zeros.  ~4 mont_muls per element
    via two log-depth associative scans + one scalar inversion.
    """
    if axis < 0:
        axis = a.ndim + axis
    assert axis != 0, "axis 0 is the limb axis"
    zmask = is_zero(ctx, a)
    ones = ctx.one(a.shape[1:])
    ax = jnp.where(zmask[None, ...], ones, a)

    def op(x, y):
        return mont_mul(ctx, x, y)

    pref = jax.lax.associative_scan(op, ax, axis=axis)
    # suffix products: reverse, scan, reverse
    rev = jnp.flip(ax, axis=axis)
    suf = jnp.flip(jax.lax.associative_scan(op, rev, axis=axis), axis=axis)

    total = jax.lax.index_in_dim(pref, pref.shape[axis] - 1, axis=axis, keepdims=True)
    tinv = inv(ctx, total)

    n = a.shape[axis]
    pref_shift = jnp.concatenate(
        [_ones_slice(ctx, a, axis),
         jax.lax.slice_in_dim(pref, 0, n - 1, axis=axis)],
        axis=axis,
    )
    suf_shift = jnp.concatenate(
        [jax.lax.slice_in_dim(suf, 1, n, axis=axis),
         _ones_slice(ctx, a, axis)],
        axis=axis,
    )
    out = mont_mul(ctx, mont_mul(ctx, pref_shift, suf_shift), tinv)
    return jnp.where(zmask[None, ...], jnp.zeros_like(a), out)


def _shape_one(a, axis):
    s = list(a.shape)
    s[axis] = 1
    return tuple(s)


def _ones_slice(ctx, a, axis):
    return jnp.broadcast_to(
        ctx.one(tuple(1 for _ in range(a.ndim - 1))), _shape_one(a, axis)
    ).astype(U32)


# op name -> implementation, consumed by _op_jit (stable jitted identities)
_OP_IMPLS = {
    "add": _add_impl,
    "sub": _sub_impl,
    "neg": _neg_impl,
    "mont_mul": _mont_mul_impl,
    "to_mont": _to_mont_impl,
    "from_mont": _from_mont_impl,
    "batch_inverse": _batch_inverse_impl,
    "exp_const": _exp_const_impl,
}


# ---------------- host <-> device conversions (numpy, limb-major) ----------------

def np_from_int(fp: FieldParams, v: int) -> np.ndarray:
    return np.array(fp.limbs(v % fp.p), dtype=np.uint32)


def np_from_ints(fp: FieldParams, vs) -> np.ndarray:
    """list of ints -> (NL, N) uint32."""
    out = np.empty((fp.nl, len(vs)), dtype=np.uint32)
    for j, v in enumerate(vs):
        vv = v % fp.p
        for i in range(fp.nl):
            out[i, j] = (vv >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def np_to_ints(fp: FieldParams, arr: np.ndarray):
    """(NL, N) uint32 -> list of ints."""
    arr = np.asarray(arr)
    flat = arr.reshape(fp.nl, -1)
    out = []
    for j in range(flat.shape[1]):
        acc = 0
        for i in range(fp.nl - 1, -1, -1):
            acc = (acc << LIMB_BITS) | int(flat[i, j])
        out.append(acc)
    return out


def np_from_bytes_le(fp: FieldParams, data: bytes, n: int) -> np.ndarray:
    """n contiguous n8-byte LE field values -> (NL, n) uint32 (vectorized)."""
    u16 = np.frombuffer(data, dtype="<u2", count=n * fp.nl).reshape(n, fp.nl)
    return np.ascontiguousarray(u16.T).astype(np.uint32)


def np_to_bytes_le(fp: FieldParams, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    n = int(np.prod(arr.shape[1:], dtype=np.int64)) if arr.ndim > 1 else 1
    u16 = arr.reshape(fp.nl, n).T.astype("<u2")
    return np.ascontiguousarray(u16).tobytes()
