"""Groth16 phase-2 flow against a real (tiny) ceremony, mirroring reference
test/fullprocess.js:62-148: ptau ceremony -> zkey new -> contribute ->
beacon -> verify (from init and from r1cs) -> prove -> verify proof.

Uses the reference's committed plonk_circuit r1cs + witness (smallest
fixture circuit) as the groth16 circuit.
"""

import os

import numpy as np
import pytest

from snarkjs_tpu.ceremony import ptau_ops, zkey_mpc
from snarkjs_tpu.curves import host_curve as hc
from snarkjs_tpu.formats import wtns as wtns_fmt
from snarkjs_tpu.formats import zkey as zkey_fmt
from snarkjs_tpu.formats.r1cs import read_r1cs
from snarkjs_tpu.protocols import groth16, groth16_setup
from snarkjs_tpu.utils.chacha import ChaCha

REF = "/root/reference/test/plonk_circuit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "circuit.r1cs")),
    reason="reference fixtures missing")


@pytest.fixture(scope="module")
def flow():
    cv = hc.BN254
    pt, _ = ptau_ops.contribute(ptau_ops.new_accumulator(cv, 5),
                                name="t", rng=ChaCha([5] * 8))
    pt, _ = ptau_ops.beacon(pt, bytes.fromhex("11" * 32), 8, name="b")
    pt = ptau_ops.prepare_phase2(pt)

    r1cs = read_r1cs(os.path.join(REF, "circuit.r1cs"))
    init = groth16_setup.setup_from_ptau(r1cs, pt)
    z1, _ = zkey_mpc.contribute(init, name="p2-1", rng=ChaCha([6] * 8))
    z2, _ = zkey_mpc.beacon(z1, bytes.fromhex("22" * 32), 8, name="p2-b")
    return cv, pt, r1cs, init, z1, z2


def test_ceremony_valid(flow):
    cv, pt, *_ = flow
    assert ptau_ops.verify(pt, rng=np.random.default_rng(1))


def test_zkey_verify_from_init(flow):
    cv, pt, r1cs, init, z1, z2 = flow
    rng = np.random.default_rng(2)
    assert zkey_mpc.verify_from_init(init, pt, z2, rng=rng)
    # the un-contributed init verifies against itself too
    assert zkey_mpc.verify_from_init(init, pt, init,
                                     rng=np.random.default_rng(3))


def test_zkey_verify_from_r1cs(flow):
    cv, pt, r1cs, init, z1, z2 = flow
    assert zkey_mpc.verify_from_r1cs(r1cs, pt, z2,
                                     rng=np.random.default_rng(4))


def test_zkey_tampered_rejected(flow):
    cv, pt, r1cs, init, z1, z2 = flow
    from snarkjs_tpu.formats.binfile import BinFile

    # swap two L-section points: delta chain stays valid but the random
    # linear combination check must fail
    bf = BinFile(z2, "zkey")
    sec8 = bytearray(bf.read_section(8))
    sz = 2 * cv.fq.n8
    if len(sec8) >= 2 * sz:
        sec8[:sz], sec8[sz:2 * sz] = sec8[sz:2 * sz], sec8[:sz]
        sec = bf.section(8)
        bad = bytearray(z2)
        bad[sec.pos:sec.pos + sec.size] = sec8
        assert not zkey_mpc.verify_from_init(init, pt, bytes(bad),
                                             rng=np.random.default_rng(5))


def test_prove_and_verify_with_mpc_zkey(flow):
    cv, pt, r1cs, init, z1, z2 = flow
    zk = zkey_fmt.read_groth16_zkey(z2)
    wit = wtns_fmt.read_wtns(os.path.join(REF, "witness.wtns"))
    proof, publics = groth16.prove(zk, wit, r=123456789, s=987654321)
    vk = groth16.export_verification_key(zk)
    assert groth16.verify(vk, publics, proof)
    # wrong public input rejected
    bad = [str(int(publics[0]) + 1)] + publics[1:]
    assert not groth16.verify(vk, bad, proof)


def test_bellman_roundtrip(flow):
    """export -> bellman contribute -> import -> delta chain still valid
    (reference test/fullprocess.js:88-104)."""
    from snarkjs_tpu.ceremony import bellman

    cv, pt, r1cs, init, z1, z2 = flow
    mpc1 = bellman.export_mpc_params(z2)
    # pure re-import (no new contribution) rebuilds an equivalent zkey
    z2b = bellman.import_mpc_params(z2, mpc1)
    assert z2b is not False
    assert zkey_mpc.verify_from_init(init, pt, z2b,
                                     rng=np.random.default_rng(6))
    # one bellman round
    resp, chash = bellman.bellman_contribute(cv, mpc1, rng=ChaCha([9] * 8))
    assert len(chash) == 64
    z3 = bellman.import_mpc_params(z2, resp, name="bellman-1")
    assert z3 is not False
    assert zkey_mpc.verify_from_init(init, pt, z3,
                                     rng=np.random.default_rng(7))
    # tampered circuit hash is rejected
    bad = bytearray(resp)
    # csHash position: after vk + 6 point arrays
    fq = cv.fq
    sg1, sg2 = 2 * fq.n8, 4 * fq.n8
    zk = zkey_fmt.read_groth16_zkey(z2)
    pos = (sg1 * 3 + sg2 * 3 + 8 + sg1 * zk.n_vars + 4
           + sg1 * (zk.domain_size - 1) + 4 + sg1 * zk.n_vars + 4
           + sg1 * zk.n_vars + 4 + sg2 * zk.n_vars)
    bad[pos] ^= 1
    assert bellman.import_mpc_params(z2, bytes(bad)) is False
