"""Pallas field-kernel tests under the interpreter (VERDICT r3 item 5).

KernelField is the Montgomery engine every TPU kernel (MSM scan, PalField
elementwise ops) is built on; fpal appeared in zero pytest files before
this.  Runs each op through a minimal pallas_call in interpret mode and
compares against host bigints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snarkjs_tpu.fields import fjnp, fpal
from snarkjs_tpu.fields.params import get_params

TILE = (8, 128)
B = TILE[0] * TILE[1]


def _vals(fp, rng, n):
    return [int.from_bytes(rng.bytes(fp.n8 + 8), "little") % fp.p
            for _ in range(n)]


def _arr(fp, vals):
    return jnp.asarray(fjnp.np_from_ints(fp, vals)).reshape(
        fp.nl, *TILE)


def _run_op(fp, op, a, b=None):
    nargs = 1 if b is None else 2

    def kernel(*refs):
        fsc = refs[nargs + 1:]
        kf = fpal.KernelField(fp, TILE, fsc)
        args = [refs[i][...] for i in range(nargs)]
        refs[nargs][...] = getattr(kf, op)(*args)

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    args = (a,) if b is None else (a, b)
    return pl.pallas_call(
        kernel,
        in_specs=[spec] * nargs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((fp.nl,) + TILE, jnp.uint32),
        scratch_shapes=fpal.KernelField.scratch_shapes(fp, TILE),
        interpret=True,
    )(*args)


@pytest.mark.parametrize("field", ["bn254_fq", "bls12_381_fq"])
def test_kernel_field_ops(field):
    fp = get_params(field)
    rng = np.random.default_rng(5)
    av = _vals(fp, rng, B)
    bv = _vals(fp, rng, B)
    # edge lanes: 0, 1, p-1 operands
    av[0], bv[0] = 0, 0
    av[1], bv[1] = fp.p - 1, fp.p - 1
    av[2], bv[2] = 1, fp.p - 1
    a, b = _arr(fp, av), _arr(fp, bv)

    got = np.asarray(_run_op(fp, "mul", a, b)).reshape(fp.nl, B)
    R_inv = pow(fp.R, fp.p - 2, fp.p)
    want = [x * y * R_inv % fp.p for x, y in zip(av, bv)]
    assert fjnp.np_to_ints(fp, got) == want

    got = np.asarray(_run_op(fp, "add", a, b)).reshape(fp.nl, B)
    assert fjnp.np_to_ints(fp, got) == [(x + y) % fp.p
                                        for x, y in zip(av, bv)]

    got = np.asarray(_run_op(fp, "sub", a, b)).reshape(fp.nl, B)
    assert fjnp.np_to_ints(fp, got) == [(x - y) % fp.p
                                        for x, y in zip(av, bv)]


def test_kernel_field_mul_const():
    fp = get_params("bn254_fq")
    rng = np.random.default_rng(6)
    av = _vals(fp, rng, B)
    a = _arr(fp, av)
    cval = 1234567890123456789 % fp.p
    c_l = fpal._limbs(cval, fp.nl)

    def kernel(a_ref, o_ref, *fsc):
        kf = fpal.KernelField(fp, TILE, fsc)
        o_ref[...] = kf.mul_const(a_ref[...], c_l)

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    got = pl.pallas_call(
        kernel,
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((fp.nl,) + TILE, jnp.uint32),
        scratch_shapes=fpal.KernelField.scratch_shapes(fp, TILE),
        interpret=True,
    )(a)
    got = np.asarray(got).reshape(fp.nl, B)
    R_inv = pow(fp.R, fp.p - 2, fp.p)
    assert fjnp.np_to_ints(fp, got) == [x * cval * R_inv % fp.p for x in av]
