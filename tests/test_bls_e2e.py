"""BLS12-381 Groth16 end-to-end: setup -> prove -> verify.

The reference treats bls12-381 as a first-class curve (reference
src/curves.js:20-24); previously only unit-tested here (VERDICT r3 item
10).  Uses a synthesized squaring-chain circuit so no fixtures are needed.
"""

import importlib.util
import os

import pytest


def _graft():
    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    return g


def test_bls12_381_groth16_e2e():
    from snarkjs_tpu.protocols import groth16, groth16_setup

    g = _graft()
    cv, r1cs, wit = g._tiny_circuit(10, curve="bls12381")
    zk = groth16_setup.setup_from_secrets(
        r1cs, tau=0x1234567, alpha=3, beta=11, gamma=1, delta=17)
    proof, publics = groth16.prove(zk, wit, r=55, s=66)
    assert proof["curve"] == "bls12381"
    vk = groth16.export_verification_key(zk)
    assert groth16.verify(vk, publics, proof)
    bad = [str(int(publics[0]) + 1)] + publics[1:]
    assert not groth16.verify(vk, bad, proof)
