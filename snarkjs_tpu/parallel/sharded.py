"""Multi-chip sharding for the two hot kernels: MSM and NTT.

The reference's only parallelism is a single-host worker pool
(SURVEY.md 2.10); here the natural TPU mapping is:

* MSM — points/scalars sharded along the batch axis of a 1-D mesh; every
  chip runs the full Pippenger bucket pipeline on its shard, then the
  (nw-point) jacobian window sums are all-gathered and tree-combined.  ICI
  traffic: nw * 3 * NL words per chip — negligible next to HBM reads.
* NTT — four-step decomposition n = n1*n2: local column NTTs on the n2-sharded
  matrix, twiddle scaling, one all-to-all transpose across the mesh, local row
  NTTs.  This is the standard large-FFT factorization; ICI carries each
  element exactly once.

Both run under shard_map over an explicit jax.sharding.Mesh, so the same code
compiles for 1 chip, N chips on one host, or multi-host meshes (psum-style
collectives ride ICI).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..curves import jac
from ..curves import msm as msm_mod
from ..fields import fjnp
from ..ntt import ntt as nttmod

shard_map = jax.shard_map if hasattr(jax, "shard_map") else jax.experimental.shard_map.shard_map


# ---------------- sharded MSM ----------------

def msm_sharded(mesh: Mesh, f, px, py, pinf, scalars, c: int, nbits: int,
                R: int = 64):
    """Full MSM over a mesh axis 'd'; returns window-sum jacobian leaves
    (NL, nw) replicated on every device."""

    axis = "d"

    def local(px, py, pinf, scal):
        ws = msm_mod._msm_device(f, px, py, pinf, scal, c, nbits, R)
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis), ws)  # leaves (ndev, NL, nw)

        def step(carry, x):
            return jac.jac_add(f, carry, x), None

        nw = jax.tree.leaves(ws)[0].shape[-1]
        init = jac.jac_zero(f, (nw,))
        total, _ = jax.lax.scan(step, init, gathered)
        return total

    pt_spec = jax.tree.map(lambda _: P(None, axis), px)
    return shard_map(
        local, mesh=mesh,
        in_specs=(pt_spec, pt_spec, P(axis), P(None, axis)),
        out_specs=jax.tree.map(lambda _: P(), jac.jac_zero(f)),
        check_vma=False,
    )(px, py, pinf, scalars)


# ---------------- sharded four-step NTT ----------------

@functools.lru_cache(maxsize=None)
def _twiddle_matrix(field_name: str, n1: int, n2: int, inverse: bool):
    """w^(j2*k1) twiddles as a Montgomery (NL, n1, n2) table."""
    from ..fields.params import get_params

    fp = get_params(field_name)
    n = n1 * n2
    k = n.bit_length() - 1
    root = fp.winv[k] if inverse else fp.w[k]
    rows = []
    for k1 in range(n1):
        base = pow(root, k1, fp.p)
        cur = 1
        row = []
        for _ in range(n2):
            row.append(fp.to_mont(cur))
            cur = cur * base % fp.p
        rows.append(row)
    flat = [v for row in rows for v in row]
    return fjnp.np_from_ints(fp, flat).reshape(fp.nl, n1, n2)


def ntt_sharded(mesh: Mesh, ctx, x, inverse: bool = False):
    """Four-step NTT of x (NL, n) over mesh axis 'd'.

    Returns evaluations in natural order, matching nttmod.ntt/intt exactly.
    n must factor as n1*n2 with n1 and n2 powers of two and the mesh size
    dividing both n1 and n2.
    """
    axis = "d"
    ndev = mesh.shape[axis]
    nl, n = x.shape
    k = n.bit_length() - 1
    n1 = 1 << (k // 2)
    n2 = n // n1
    assert n1 % ndev == 0 and n2 % ndev == 0, "mesh must divide both factors"
    tw = jnp.asarray(_twiddle_matrix(ctx.fp.name, n1, n2, inverse))
    fp = ctx.fp
    ninv_mont = jnp.asarray(
        fjnp.np_from_ints(fp, [fp.to_mont(pow(n, fp.p - 2, fp.p))]))

    def local(xm, twl):
        # xm: (NL, n1, n2/ndev) — full columns of the j1 x j2 matrix
        a = _ntt_axis(ctx, xm, axis_len=n1, inverse=inverse, over_axis=1)
        a = fjnp.mont_mul(ctx, a, twl)
        # global transpose: each device trades its column block for a row block
        rows = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=2,
                                  tiled=True)  # (NL, n1/ndev, n2)
        b = _ntt_axis(ctx, rows, axis_len=n2, inverse=inverse, over_axis=2)
        if inverse:
            b = fjnp.mont_mul(ctx, b, ninv_mont[:, None, :])
        return b

    xm = x.reshape(nl, n1, n2)
    tw_spec = P(None, None, axis)
    y = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis), tw_spec),
        out_specs=P(None, axis, None),
        check_vma=False,
    )(xm, tw)
    # y[k1, k2] = X[k1 + n1*k2]  ->  natural order via transpose
    return jnp.transpose(y, (0, 2, 1)).reshape(nl, n)


def _ntt_axis(ctx, x, axis_len, inverse, over_axis):
    """Size-axis_len NTT along `over_axis` of a (NL, A, B) block, without the
    1/n scaling (applied once by the caller for inverse transforms).

    Large blocks route through the MXU matmul NTT (ntt_mxu) on TPU — the
    same per-chip engine the unsharded path uses, so the sharded four-step
    is the production kernel wrapped in an all-to-all (VERDICT r3 item 4).
    """
    import os

    nl = x.shape[0]
    k = axis_len.bit_length() - 1
    env = os.environ.get("SNARKJS_TPU_MXU_NTT")
    use_mxu = (env not in (None, "0", "false")) or (
        env is None and fjnp._use_pallas() and k >= 12)
    if use_mxu and k >= 1:
        from ..ntt import ntt_mxu

        x2 = jnp.moveaxis(x, over_axis, 1)
        lead = x2.shape[2:]
        x2 = x2.reshape(nl, axis_len, -1)
        y = ntt_mxu._ntt_axis1(ctx, x2, inverse)
        if inverse:
            # _ntt_axis contract: no 1/len scaling (caller applies 1/n once);
            # ntt_mxu folds 1/len into its matrices, so undo it here.
            fp = ctx.fp
            len_mont = jnp.asarray(fjnp.np_from_ints(
                fp, [fp.to_mont(axis_len % fp.p)])).reshape(nl, 1, 1)
            y = fjnp.mont_mul(ctx, y, len_mont)
        y = y.reshape((nl, axis_len) + lead)
        return jnp.moveaxis(y, 1, over_axis)
    # move target axis last, flatten others into batch
    x2 = jnp.moveaxis(x, over_axis, -1)
    lead = x2.shape[1:-1]
    x2 = x2.reshape(nl, -1, axis_len)
    perm = jnp.asarray(nttmod.bit_reverse_perm(k))
    x2 = x2[:, :, perm]
    tables = nttmod._twiddles(ctx.fp.name, k, inverse)
    for s in range(1, k + 1):
        m = 1 << (s - 1)
        twi = jnp.asarray(tables[s - 1]).reshape(nl, 1, 1, m)
        x2 = x2.reshape(nl, x2.shape[1], axis_len // (2 * m), 2 * m)
        lo = x2[..., :m]
        hi = x2[..., m:]
        t = fjnp.mont_mul(ctx, hi, twi)
        x2 = jnp.concatenate([fjnp.add(ctx, lo, t), fjnp.sub(ctx, lo, t)],
                             axis=-1)
    x2 = x2.reshape((nl,) + lead + (axis_len,))
    return jnp.moveaxis(x2, -1, over_axis)


# ---------------- sharded four-step GROUP NTT (preparePhase2) ----------------

@functools.lru_cache(maxsize=None)
def _root_ladder(fr_name: str, k: int):
    """Factored powers of the inverse 2^k-th root: root^e =
    mont_mul(A[:, e & (s1-1)], B[:, e >> log_s1]) in PLAIN form
    (A Montgomery, B plain).  Tables stay O(sqrt(n)) so powers up to
    2^28 never materialize host-side."""
    from ..fields.params import get_params

    fp = get_params(fr_name)
    n = 1 << k
    root = fp.winv[k]
    log_s1 = (k + 1) // 2
    s1 = 1 << log_s1
    nb = -(-n // s1)
    A = np.stack([fjnp.np_from_int(fp, fp.to_mont(pow(root, t, fp.p)))
                  for t in range(s1)], axis=-1)
    B = np.stack([fjnp.np_from_int(fp, pow(root, s1 * u, fp.p))
                  for u in range(nb)], axis=-1)
    return log_s1, s1, A, B


def _ladder_limbs(frctx, k, e):
    """Plain limb scalars root^e for an int32 exponent array e (mod 2^k)."""
    log_s1, s1, A, B = _root_ladder(frctx.fp.name, k)
    At = jnp.asarray(A)
    Bt = jnp.asarray(B)
    return fjnp.mont_mul(frctx, At[:, e & (s1 - 1)], Bt[:, e >> log_s1])


def _group_ntt_last(f, frctx, P, k, kglob=None):
    """Batched inverse group NTT (size 2^k) along the LAST axis of
    jacobian leaves (nl, *batch, 2^k); NO 1/len scaling (caller applies
    1/n once).  Same compile-light shape as ceremony._group_intt_fn: one
    fori_loop stage body, iota-derived butterfly indices, ladder twiddles.

    kglob: the root order the ladder indexes (defaults to k) — lets the
    caller reuse one 2^k ladder for sub-transforms of size 2^k' by
    scaling exponents.
    """
    from ..ntt.ntt import bit_reverse_perm

    fr = frctx.fp
    nbits = fr.p.bit_length()
    n = 1 << k
    h = n // 2
    kg = k if kglob is None else kglob
    step = 1 << (kg - k)        # exponent stride inside the global ladder

    perm = jnp.asarray(bit_reverse_perm(k))
    P = jax.tree.map(lambda a: a[..., perm], P)
    j = jnp.arange(h, dtype=jnp.int32)
    q = jnp.arange(n, dtype=jnp.int32)

    def stage(i, P):
        off = j & ((1 << i) - 1)
        lo_idx = ((j >> i) << (i + 1)) | off
        hi_idx = lo_idx + (1 << i)
        e = (off << (k - 1 - i)) * step
        tw = _ladder_limbs(frctx, kg, e)              # (nl_r, h)
        lo = jax.tree.map(lambda a: a[..., lo_idx], P)
        hi = jax.tree.map(lambda a: a[..., hi_idx], P)
        t = jac.batch_scalar_mul_limbs(f, hi, tw, nbits)
        top = jac.jac_add(f, lo, t)
        bot = jac.jac_add(f, lo, jac.jac_neg(f, t))
        cat = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=-1),
                           top, bot)
        jq = ((q >> (i + 1)) << i) | (q & ((1 << i) - 1))
        cat_idx = jq + h * ((q >> i) & 1)
        return jax.tree.map(lambda a: a[..., cat_idx], cat)

    return jax.lax.fori_loop(0, k, stage, P)


def group_intt_sharded(mesh: Mesh, cv, g2: bool, px, py, pinf):
    """Inverse group NTT (G.ifft / lagrangeEvaluations) of 2^k affine
    points, four-step sharded over mesh axis 'd' (the reference's
    heaviest ceremony op, src/powersoftau_preparephase2.js:67-139).

    Stage A: size-n1 batched group INTTs on column shards; twiddle
    root^(k1*i2) scalar-muls; all-to-all transpose; stage B: size-n2
    INTTs; 1/n scaling.  Returns affine (x, y, inf) in natural order —
    identical points to ceremony.host_group_ifft / _group_intt_fn.
    """
    from ..curves.gops import FqOps, Fq2Ops

    axis = "d"
    ndev = mesh.shape[axis]
    fqctx = fjnp.get_ctx(cv.fq.name)
    frctx = fjnp.get_ctx(cv.fr.name)
    f = Fq2Ops(fqctx) if g2 else FqOps(fqctx)
    fr = frctx.fp
    nbits = fr.p.bit_length()
    nl = cv.fq.nl
    n = pinf.shape[-1]
    k = n.bit_length() - 1
    assert 1 << k == n
    k1l = k // 2
    n1 = 1 << k1l
    n2 = n >> k1l
    k2l = k - k1l
    assert n2 % ndev == 0 and n1 % ndev == 0, "mesh must divide both factors"
    n2loc = n2 // ndev
    ninv_limbs = jnp.asarray(
        fjnp.np_from_int(fr, pow(n, fr.p - 2, fr.p))).reshape(fr.nl, 1, 1)

    def local(xm, ym, infm):
        # leaves (nl, n1, n2loc): full columns of the i1 x i2 matrix
        P = jac.from_affine(f, xm, ym, infm)
        P = _group_ntt_last(
            f, frctx, jax.tree.map(lambda a: jnp.swapaxes(a, -1, -2), P),
            k1l, kglob=k)                              # transform over i1
        # twiddle root^(k1 * i2_global); exponents mod n = 2^k wrap in u32
        i2g = (jax.lax.axis_index(axis) * n2loc
               + jnp.arange(n2loc, dtype=jnp.int32))
        k1v = jnp.arange(n1, dtype=jnp.int32)
        e = ((k1v[None, :] * i2g[:, None])
             & jnp.int32(n - 1))                       # (n2loc, n1)
        tw = _ladder_limbs(frctx, k, e)                # (nl_r, n2loc, n1)
        P = jac.batch_scalar_mul_limbs(f, P, tw, nbits)
        # global transpose; leaves currently (nl, n2loc, n1)
        P = jax.tree.map(
            lambda a: jax.lax.all_to_all(a, axis, split_axis=2,
                                         concat_axis=1, tiled=True), P)
        # now (nl, n2, n1/ndev): transform over i2 (axis -2) per row k1
        P = jax.tree.map(lambda a: jnp.swapaxes(a, -1, -2), P)
        P = _group_ntt_last(f, frctx, P, k2l, kglob=k)
        P = jac.batch_scalar_mul_limbs(f, P, ninv_limbs, nbits)
        return jac.to_affine_batch(f, P, f.batch_inv)

    resh = lambda a: a.reshape(a.shape[:-1] + (n1, n2))
    xm = jax.tree.map(resh, px)
    ym = jax.tree.map(resh, py)
    infm = pinf.reshape(n1, n2)
    arr_spec = P(None, None, axis)
    out = shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: arr_spec, xm),
                  jax.tree.map(lambda _: arr_spec, ym), P(None, axis)),
        out_specs=(jax.tree.map(lambda _: P(None, axis, None), xm),
                   jax.tree.map(lambda _: P(None, axis, None), ym),
                   P(axis, None)),
        check_vma=False,
    )(xm, ym, infm)
    ox, oy, oinf = out
    # y[k1, k2] = X[k1 + n1*k2] -> natural order
    tonat = lambda a: jnp.swapaxes(a, -1, -2).reshape(a.shape[:-2] + (n,))
    return (jax.tree.map(tonat, ox), jax.tree.map(tonat, oy),
            jnp.swapaxes(oinf, -1, -2).reshape(n))
