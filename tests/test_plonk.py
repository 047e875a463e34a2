"""PLONK end-to-end: prove/verify against the reference fixture zkey, and
setup_from_secrets -> prove -> verify round trip (reference behavioral spec:
test/fullprocess.js:151-169, test/plonk_circuit fixtures)."""

import json
import os

import pytest

REF = "/root/reference/test/plonk_circuit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "circuit.zkey")),
    reason="reference fixtures missing")


def test_plonk_prove_verify_reference_zkey():
    from snarkjs_tpu.formats import wtns as wtns_fmt
    from snarkjs_tpu.formats import zkey as zkey_fmt
    from snarkjs_tpu.protocols import plonk

    zk = zkey_fmt.read_plonk_zkey(os.path.join(REF, "circuit.zkey"))
    wit = wtns_fmt.read_wtns(os.path.join(REF, "witness.wtns"))

    # exported vkey must match the committed fixture verification key
    with open(os.path.join(REF, "verification_key.json")) as f:
        ref_vk = json.load(f)
    vk = plonk.export_verification_key(zk)
    for key in ("Qm", "Ql", "Qr", "Qo", "Qc", "S1", "S2", "S3", "k1", "k2",
                "nPublic", "w"):
        assert vk[key] == ref_vk[key], f"vkey field {key} mismatch"
    assert vk["X_2"] == ref_vk["X_2"]

    proof, publics = plonk.prove(zk, wit, b=list(range(1, 13)))
    with open(os.path.join(REF, "public.json")) as f:
        assert publics == json.load(f)
    assert plonk.verify(vk, publics, proof)

    # Note: the mirror's committed plonk_circuit/proof.json does NOT verify
    # under the v0.7.6 transcript (upstream's own suite never checks it —
    # grep test/*.js — and it predates the challenge-derivation change), so
    # the oracle here is the fixture zkey/vkey pair + a fresh proof.

    # negative: tampered public input
    bad = list(publics)
    bad[0] = str((int(bad[0]) + 1))
    assert not plonk.verify(vk, bad, proof)


def test_plonk_setup_prove_verify():
    from snarkjs_tpu.formats import wtns as wtns_fmt
    from snarkjs_tpu.formats import zkey as zkey_fmt
    from snarkjs_tpu.formats.r1cs import read_r1cs
    from snarkjs_tpu.protocols import plonk, plonk_setup

    r1cs = read_r1cs(os.path.join(REF, "circuit.r1cs"))
    data = plonk_setup.setup_from_secrets(r1cs, tau=0xDEADBEEF12345)
    zk = zkey_fmt.read_plonk_zkey(data)

    # same circuit parameters as the reference-made zkey
    ref = zkey_fmt.read_plonk_zkey(os.path.join(REF, "circuit.zkey"))
    assert zk.domain_size == ref.domain_size
    assert zk.n_public == ref.n_public
    assert zk.n_additions == ref.n_additions
    assert zk.n_constraints == ref.n_constraints
    assert (zk.a_map == ref.a_map).all()
    assert (zk.b_map == ref.b_map).all()
    assert (zk.c_map == ref.c_map).all()

    wit = wtns_fmt.read_wtns(os.path.join(REF, "witness.wtns"))
    proof, publics = plonk.prove(zk, wit)
    vk = plonk.export_verification_key(zk)
    assert plonk.verify(vk, publics, proof)


def test_plonk_setup_sections_bit_identical():
    """Regenerate the zkey from the fixture r1cs + the fixture's own
    embedded monomial SRS (Lagrange basis recovered by group IFFT, the
    preparePhase2 computation): every section including the header with its
    Q/sigma commitments must be bit-identical to the reference fixture
    (reference src/plonk_setup.js:36-434)."""
    from snarkjs_tpu.ceremony import ptau_ops
    from snarkjs_tpu.formats import points as pcodec
    from snarkjs_tpu.formats import zkey as zkey_fmt
    from snarkjs_tpu.formats.binfile import BinFile
    from snarkjs_tpu.formats.r1cs import read_r1cs
    from snarkjs_tpu.protocols import plonk_setup

    ref_path = os.path.join(REF, "circuit.zkey")
    ref = zkey_fmt.read_plonk_zkey(ref_path)
    cv = ref.curve
    fq = cv.fq
    r1cs = read_r1cs(os.path.join(REF, "circuit.r1cs"))
    domain = ref.domain_size
    s_g1 = 2 * fq.n8
    tau_lem = pcodec.g1_lem_to_bytes(fq, *ref.ptau)
    lag_lem = ptau_ops.group_lagrange_lem(
        cv, tau_lem[:domain * s_g1], domain, g2=False)

    class _FakePtau:
        curve = cv
        power = domain.bit_length() - 1
        sections = {
            2: tau_lem,
            3: b"\x00" * (4 * fq.n8) + pcodec.g2_lem_from_ints(fq, [ref.x_2]),
            12: b"\x00" * ((domain - 1) * s_g1) + lag_lem,
        }

    data = plonk_setup.setup_from_ptau(r1cs, _FakePtau())
    got = BinFile(data, "zkey")
    refbf = BinFile.load(ref_path, "zkey")
    for sid in range(2, 15):
        assert got.read_section(sid) == refbf.read_section(sid), \
            f"plonk zkey section {sid} differs from the reference fixture"
