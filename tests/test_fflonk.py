"""FFLONK end-to-end against the reference fixture zkey
(test/fflonk.test.js behavioral spec; fixtures at reference test/fflonk)."""

import json
import os

import pytest

REF = "/root/reference/test/fflonk"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "circuit.zkey")),
    reason="reference fixtures missing")


def test_fflonk_prove_verify_reference_zkey():
    from snarkjs_tpu.formats import wtns as wtns_fmt
    from snarkjs_tpu.formats import zkey as zkey_fmt
    from snarkjs_tpu.protocols import fflonk

    zk = zkey_fmt.read_fflonk_zkey(os.path.join(REF, "circuit.zkey"))
    wit = wtns_fmt.read_wtns(os.path.join(REF, "witness.wtns"))

    # exported vkey must match the committed fixture verification key
    with open(os.path.join(REF, "circuit_vk.json")) as f:
        ref_vk = json.load(f)
    vk = fflonk.export_verification_key(zk)
    for key in ("k1", "k2", "w", "w3", "w4", "w8", "wr", "nPublic", "power",
                "X_2", "C0"):
        assert vk[key] == ref_vk[key], f"vkey field {key} mismatch"

    proof, publics = fflonk.prove(zk, wit, b=list(range(1, 11)))
    with open(os.path.join(REF, "public.json")) as f:
        assert publics == json.load(f)
    assert fflonk.verify(vk, publics, proof)

    # negative: tampered public input
    bad = [str(int(publics[0]) + 1)] + publics[1:]
    assert not fflonk.verify(vk, bad, proof)

    # negative: tampered evaluation
    bad_proof = json.loads(json.dumps(proof))
    bad_proof["evaluations"]["a"] = str(
        (int(bad_proof["evaluations"]["a"]) + 1))
    assert not fflonk.verify(vk, publics, bad_proof)


def test_fflonk_setup_matches_fixture_zkey():
    """Regenerate the zkey from the fixture r1cs + the fixture's own
    embedded SRS: every derived section must be bit-identical."""
    import numpy as np

    from snarkjs_tpu.formats import zkey as zkey_fmt
    from snarkjs_tpu.formats.binfile import BinFile
    from snarkjs_tpu.formats.points import g1_lem_to_bytes
    from snarkjs_tpu.formats.r1cs import read_r1cs
    from snarkjs_tpu.protocols import fflonk_setup

    ref_path = os.path.join(REF, "circuit.zkey")
    ref = zkey_fmt.read_fflonk_zkey(ref_path)
    r1cs = read_r1cs(os.path.join(REF, "circuit.r1cs"))
    srs_lem = g1_lem_to_bytes(ref.curve.fq, *ref.ptau)
    data = fflonk_setup.setup_from_srs(r1cs, srs_lem, ref.x_2)

    got_bf = BinFile(data, "zkey")
    ref_bf = BinFile.load(ref_path, "zkey")
    for sid in range(2, 18):
        assert got_bf.read_section(sid) == ref_bf.read_section(sid), \
            f"fflonk zkey section {sid} differs from the reference fixture"


def test_fflonk_setup_from_secrets_roundtrip():
    from snarkjs_tpu.formats import wtns as wtns_fmt
    from snarkjs_tpu.formats import zkey as zkey_fmt
    from snarkjs_tpu.formats.r1cs import read_r1cs
    from snarkjs_tpu.protocols import fflonk, fflonk_setup

    r1cs = read_r1cs(os.path.join(REF, "circuit.r1cs"))
    data = fflonk_setup.setup_from_secrets(r1cs, tau=0xABCDEF987654321)
    zk = zkey_fmt.read_fflonk_zkey(data)
    wit = wtns_fmt.read_wtns(os.path.join(REF, "witness.wtns"))
    proof, publics = fflonk.prove(zk, wit)
    vk = fflonk.export_verification_key(zk)
    assert fflonk.verify(vk, publics, proof)


def test_fflonk_mesh_prove_matches_local():
    """Mesh-sharded commitment MSMs produce byte-identical fflonk proofs
    under fixed blinding (8 virtual devices)."""
    import json

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from snarkjs_tpu.formats import wtns as wtns_fmt
    from snarkjs_tpu.formats import zkey as zkey_fmt
    from snarkjs_tpu.protocols import fflonk

    zk = zkey_fmt.read_fflonk_zkey(os.path.join(REF, "circuit.zkey"))
    wit = wtns_fmt.read_wtns(os.path.join(REF, "witness.wtns"))
    b = list(range(1, 11))
    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    proof_m, pub_m = fflonk.prove(zk, wit, b=b, mesh=mesh, msm_cw=8)
    proof_l, pub_l = fflonk.prove(zk, wit, b=b)
    assert json.dumps((proof_m, pub_m)) == json.dumps((proof_l, pub_l))
    vk = fflonk.export_verification_key(zk)
    assert fflonk.verify(vk, pub_m, proof_m)
