"""Witness calculator (WASM interpreter) + wtns/r1cs tooling tests against
the reference's committed fixtures (behavioral spec: reference
src/wtns_calculate.js, test/groth16 fixtures)."""

import json
import os

import pytest

REF16 = "/root/reference/test/groth16"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF16, "circuit.wasm")),
    reason="reference fixtures missing")


def test_wtns_calculate_matches_fixture():
    from snarkjs_tpu.wasm.witness_calculator import calculate_wtns

    with open(os.path.join(REF16, "input.json")) as f:
        inp = json.load(f)
    data = calculate_wtns(inp, os.path.join(REF16, "circuit.wasm"))
    with open(os.path.join(REF16, "witness.wtns"), "rb") as f:
        assert data == f.read()


def test_wtns_check():
    from snarkjs_tpu import tools
    from snarkjs_tpu.formats import wtns as wtns_fmt
    from snarkjs_tpu.formats.r1cs import read_r1cs

    r1cs = read_r1cs(os.path.join(REF16, "circuit.r1cs"))
    wit = wtns_fmt.read_wtns(os.path.join(REF16, "witness.wtns"))
    assert tools.wtns_check(r1cs, wit)

    # corrupt one witness value -> must fail
    import numpy as np

    bad_vals = np.asarray(wit.values).copy()
    bad_vals[0, 5] ^= 1
    bad = wtns_fmt.Witness(n8=wit.n8, q=wit.q, n=wit.n, values=bad_vals)
    assert not tools.wtns_check(r1cs, bad)


def test_r1cs_info_and_json():
    from snarkjs_tpu import tools
    from snarkjs_tpu.formats.r1cs import read_r1cs

    r1cs = read_r1cs(os.path.join(REF16, "circuit.r1cs"))
    info = tools.r1cs_info(r1cs)
    assert info["curve"] == "bn-128"
    assert info["nConstraints"] == r1cs.n_constraints > 0
    js = tools.r1cs_export_json(r1cs)
    assert len(js["constraints"]) == r1cs.n_constraints
    # A*B=C shape: every constraint has 3 linear combinations
    assert all(len(c) == 3 for c in js["constraints"])


def test_r1cs_print_with_syms():
    from snarkjs_tpu import tools
    from snarkjs_tpu.formats.r1cs import read_r1cs

    syms = tools.load_syms(os.path.join(REF16, "circuit.sym"))
    r1cs = read_r1cs(os.path.join(REF16, "circuit.r1cs"))
    lines = tools.r1cs_print(r1cs, syms)
    assert len(lines) == r1cs.n_constraints
    assert all("= 0" in ln for ln in lines)


def test_wtns_export_json():
    from snarkjs_tpu import tools
    from snarkjs_tpu.formats import wtns as wtns_fmt

    wit = wtns_fmt.read_wtns(os.path.join(REF16, "witness.wtns"))
    js = tools.wtns_export_json(wit)
    assert js[0] == "1"
    assert len(js) == wit.n
