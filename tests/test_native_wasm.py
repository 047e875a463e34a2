"""Native C++ WASM VM vs Python interpreter parity + fixture identity."""

import json
import os

import pytest

REF16 = "/root/reference/test/groth16"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF16, "circuit.wasm")),
    reason="reference fixtures missing")


def test_native_available_and_matches_fixture():
    from snarkjs_tpu.wasm import native
    from snarkjs_tpu.wasm.witness_calculator import WitnessCalculator

    if not native.available():
        pytest.skip("no g++ / native build failed")
    with open(os.path.join(REF16, "circuit.wasm"), "rb") as f:
        wasm = f.read()
    wc = WitnessCalculator(wasm)
    assert type(wc.inst).__name__ == "NativeInstance"
    with open(os.path.join(REF16, "input.json")) as f:
        inp = json.load(f)
    data = wc.calculate_wtns_bin(inp)
    with open(os.path.join(REF16, "witness.wtns"), "rb") as f:
        assert data == f.read()


def test_native_matches_python_interpreter():
    from snarkjs_tpu.wasm import native
    from snarkjs_tpu.wasm import interp
    from snarkjs_tpu.wasm.witness_calculator import WitnessCalculator

    if not native.available():
        pytest.skip("no g++ / native build failed")
    ref = "/root/reference/test/plonk_circuit"
    with open(os.path.join(ref, "circuit.wasm"), "rb") as f:
        wasm = f.read()
    with open(os.path.join(ref, "input.json")) as f:
        inp = json.load(f)
    wn = WitnessCalculator(wasm).calculate_witness(inp)
    os.environ["SNARKJS_NO_NATIVE_WASM"] = "1"
    try:
        wp_calc = WitnessCalculator(wasm)
        assert isinstance(wp_calc.inst, interp.Instance)
        wp = wp_calc.calculate_witness(inp)
    finally:
        del os.environ["SNARKJS_NO_NATIVE_WASM"]
    assert wn == wp


def test_native_trap_message():
    """A failing assert must surface the circom error message."""
    from snarkjs_tpu.wasm import native
    from snarkjs_tpu.wasm import interp
    from snarkjs_tpu.wasm.witness_calculator import WitnessCalculator

    if not native.available():
        pytest.skip("no g++ / native build failed")
    ref = "/root/reference/test/plonk_circuit"
    with open(os.path.join(ref, "circuit.wasm"), "rb") as f:
        wasm = f.read()
    wc = WitnessCalculator(wasm, sanity_check=True)
    # the fixture circuit takes input 'a'; a bogus signal must raise
    with pytest.raises((interp.Trap, ValueError)):
        wc.calculate_witness({"not_a_signal": 1})
