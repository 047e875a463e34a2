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
