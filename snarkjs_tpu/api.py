"""Public API facade mirroring snarkjs' exported namespaces
(reference main.js:1-8, src/groth16.js:20-23, src/plonk.js, src/fflonk.js,
src/powersoftau.js:20-30, src/zkey.js:21-31, src/wtns.js, src/r1cs.js).

Each namespace exposes the same operations as the reference module, taking
file paths (like the CLI) or already-parsed objects.  Both snake_case and
the reference's camelCase names are provided.
"""

from __future__ import annotations

import json


class _NS:
    """Namespace that aliases camelCase -> snake_case lazily."""

    def __getattr__(self, name):
        # camelCase fallback: fullProve -> full_prove
        snake = "".join(
            "_" + c.lower() if c.isupper() else c for c in name)
        if snake != name and hasattr(self, snake):
            return getattr(self, snake)
        raise AttributeError(name)


def _load_json(obj):
    if isinstance(obj, str):
        with open(obj) as f:
            return json.load(f)
    return obj


def _load_bytes(obj):
    if isinstance(obj, str):
        with open(obj, "rb") as f:
            return f.read()
    return obj


class _Groth16(_NS):
    @staticmethod
    def prove(zkey, wtns, **kw):
        from .formats import wtns as wtns_fmt
        from .formats import zkey as zkey_fmt
        from .protocols import groth16

        if isinstance(zkey, (str, bytes)):
            zkey = zkey_fmt.read_groth16_zkey(zkey)
        if isinstance(wtns, (str, bytes)):
            wtns = wtns_fmt.read_wtns(wtns)
        return groth16.prove(zkey, wtns, **kw)

    @staticmethod
    def full_prove(input_map, wasm, zkey, **kw):
        from .wasm.witness_calculator import calculate_wtns
        from .formats import wtns as wtns_fmt

        wtns_bytes = calculate_wtns(_load_json(input_map), wasm)
        return _Groth16.prove(zkey, wtns_bytes, **kw)

    @staticmethod
    def verify(vk, publics, proof, logger=None):
        from .protocols import groth16

        return groth16.verify(_load_json(vk), _load_json(publics),
                              _load_json(proof), logger=logger)

    @staticmethod
    def export_solidity_call_data(proof, publics):
        from .protocols import groth16

        return groth16.export_solidity_calldata(
            _load_json(proof), _load_json(publics))


class _Plonk(_NS):
    @staticmethod
    def setup(r1cs, ptau, **kw):
        from .formats import ptau as ptau_fmt
        from .formats.r1cs import read_r1cs
        from .protocols import plonk_setup

        if isinstance(r1cs, (str, bytes)):
            r1cs = read_r1cs(r1cs)
        if isinstance(ptau, (str, bytes)):
            ptau = ptau_fmt.read_ptau(ptau)
        return plonk_setup.setup_from_ptau(r1cs, ptau, **kw)

    @staticmethod
    def prove(zkey, wtns, **kw):
        from .formats import wtns as wtns_fmt
        from .formats import zkey as zkey_fmt
        from .protocols import plonk

        if isinstance(zkey, (str, bytes)):
            zkey = zkey_fmt.read_plonk_zkey(zkey)
        if isinstance(wtns, (str, bytes)):
            wtns = wtns_fmt.read_wtns(wtns)
        return plonk.prove(zkey, wtns, **kw)

    @staticmethod
    def full_prove(input_map, wasm, zkey, **kw):
        from .wasm.witness_calculator import calculate_wtns

        wtns_bytes = calculate_wtns(_load_json(input_map), wasm)
        return _Plonk.prove(zkey, wtns_bytes, **kw)

    @staticmethod
    def verify(vk, publics, proof, logger=None):
        from .protocols import plonk

        return plonk.verify(_load_json(vk), _load_json(publics),
                            _load_json(proof), logger=logger)

    @staticmethod
    def export_solidity_call_data(proof, publics):
        from .protocols import plonk

        return plonk.export_solidity_calldata(
            _load_json(proof), _load_json(publics))


class _Fflonk(_NS):
    @staticmethod
    def setup(r1cs, ptau, **kw):
        from .formats import ptau as ptau_fmt
        from .formats.r1cs import read_r1cs
        from .protocols import fflonk_setup

        if isinstance(r1cs, (str, bytes)):
            r1cs = read_r1cs(r1cs)
        if isinstance(ptau, (str, bytes)):
            ptau = ptau_fmt.read_ptau(ptau)
        return fflonk_setup.setup_from_ptau(r1cs, ptau, **kw)

    @staticmethod
    def prove(zkey, wtns, **kw):
        from .formats import wtns as wtns_fmt
        from .formats import zkey as zkey_fmt
        from .protocols import fflonk

        if isinstance(zkey, (str, bytes)):
            zkey = zkey_fmt.read_fflonk_zkey(zkey)
        if isinstance(wtns, (str, bytes)):
            wtns = wtns_fmt.read_wtns(wtns)
        return fflonk.prove(zkey, wtns, **kw)

    @staticmethod
    def full_prove(input_map, wasm, zkey, **kw):
        from .wasm.witness_calculator import calculate_wtns

        wtns_bytes = calculate_wtns(_load_json(input_map), wasm)
        return _Fflonk.prove(zkey, wtns_bytes, **kw)

    @staticmethod
    def verify(vk, publics, proof, logger=None):
        from .protocols import fflonk

        return fflonk.verify(_load_json(vk), _load_json(publics),
                             _load_json(proof), logger=logger)

    @staticmethod
    def export_solidity_call_data(proof, publics):
        from .protocols import fflonk

        return fflonk.export_solidity_calldata(
            _load_json(proof), _load_json(publics))


class _PowersOfTau(_NS):
    @staticmethod
    def new_accumulator(curve, power, filename=None):
        from .ceremony import ptau_ops
        from .curves import host_curve as hc

        if isinstance(curve, str):
            curve = hc.get_curve(curve)
        pt = ptau_ops.new_accumulator(curve, int(power))
        if filename:
            pt.save(filename)
        return pt

    @staticmethod
    def contribute(old, new=None, **kw):
        from .ceremony import ptau_ops
        from .formats import ptau as ptau_fmt

        if isinstance(old, (str, bytes)):
            old = ptau_fmt.read_ptau(old)
        out, _chash = ptau_ops.contribute(old, **kw)
        if new:
            out.save(new)
        return out

    @staticmethod
    def beacon(old, beacon_hash, num_iterations_exp, new=None, **kw):
        from .ceremony import ptau_ops
        from .formats import ptau as ptau_fmt

        if isinstance(old, (str, bytes)):
            old = ptau_fmt.read_ptau(old)
        if isinstance(beacon_hash, str):
            beacon_hash = ptau_ops.parse_beacon_hash(beacon_hash)
        out, _chash = ptau_ops.beacon(old, beacon_hash,
                                      int(num_iterations_exp), **kw)
        if new:
            out.save(new)
        return out

    @staticmethod
    def prepare_phase2(old, new=None, logger=None):
        from .ceremony import ptau_ops
        from .formats import ptau as ptau_fmt

        if isinstance(old, (str, bytes)):
            old = ptau_fmt.read_ptau(old)
        out = ptau_ops.prepare_phase2(old, logger=logger)
        if new:
            out.save(new)
        return out

    @staticmethod
    def verify(ptau, logger=None):
        from .ceremony import ptau_ops
        from .formats import ptau as ptau_fmt

        if isinstance(ptau, (str, bytes)):
            ptau = ptau_fmt.read_ptau(ptau)
        return ptau_ops.verify(ptau, logger=logger)

    @staticmethod
    def truncate(ptau, power, logger=None):
        from .ceremony import ptau_ops
        from .formats import ptau as ptau_fmt

        if isinstance(ptau, (str, bytes)):
            ptau = ptau_fmt.read_ptau(ptau)
        return ptau_ops.truncate(ptau, power)

    @staticmethod
    def export_challenge(ptau, out=None):
        from .ceremony import ptau_ops
        from .formats import ptau as ptau_fmt

        if isinstance(ptau, (str, bytes)):
            ptau = ptau_fmt.read_ptau(ptau)
        data = ptau_ops.export_challenge(ptau)
        if out:
            with open(out, "wb") as f:
                f.write(data)
        return data

    @staticmethod
    def challenge_contribute(curve, challenge, response=None, **kw):
        from .ceremony import ptau_ops

        if isinstance(challenge, str):
            with open(challenge, "rb") as f:
                challenge = f.read()
        data = ptau_ops.challenge_contribute(curve, challenge, **kw)
        if response:
            with open(response, "wb") as f:
                f.write(data)
        return data

    @staticmethod
    def import_response(old, response, new=None, **kw):
        from .ceremony import ptau_ops
        from .formats import ptau as ptau_fmt

        if isinstance(old, (str, bytes)):
            old = ptau_fmt.read_ptau(old)
        if isinstance(response, str):
            with open(response, "rb") as f:
                response = f.read()
        out = ptau_ops.import_response(old, response, **kw)
        if new:
            out.save(new)
        return out

    @staticmethod
    def convert(old, new=None, logger=None):
        from .ceremony import ptau_ops
        from .formats import ptau as ptau_fmt

        if isinstance(old, (str, bytes)):
            old = ptau_fmt.read_ptau(old)
        out = ptau_ops.convert(old, logger=logger)
        if new:
            out.save(new)
        return out

    @staticmethod
    def export_json(ptau, logger=None):
        from .ceremony import ptau_ops
        from .formats import ptau as ptau_fmt

        if isinstance(ptau, (str, bytes)):
            ptau = ptau_fmt.read_ptau(ptau)
        return ptau_ops.export_json(ptau)


class _Zkey(_NS):
    @staticmethod
    def new_zkey(r1cs, ptau, zkey_path=None, logger=None):
        from .formats import ptau as ptau_fmt
        from .formats.r1cs import read_r1cs
        from .protocols import groth16_setup

        if isinstance(r1cs, (str, bytes)):
            r1cs = read_r1cs(r1cs)
        if isinstance(ptau, (str, bytes)):
            ptau = ptau_fmt.read_ptau(ptau)
        data = groth16_setup.setup_from_ptau(r1cs, ptau, logger=logger)
        if zkey_path:
            with open(zkey_path, "wb") as f:
                f.write(data)
        return data

    @staticmethod
    def contribute(old, new=None, name="", entropy=None, logger=None):
        from .ceremony import zkey_mpc

        data, _chash = zkey_mpc.contribute(_load_bytes(old), name=name,
                                           entropy=entropy)
        if new:
            with open(new, "wb") as f:
                f.write(data)
        return data

    @staticmethod
    def beacon(old, beacon_hash, num_iterations_exp=10, new=None, name="",
               logger=None):
        from .ceremony import ptau_ops, zkey_mpc

        if isinstance(beacon_hash, str):
            beacon_hash = ptau_ops.parse_beacon_hash(beacon_hash)
        data, _chash = zkey_mpc.beacon(_load_bytes(old), beacon_hash,
                                       int(num_iterations_exp), name=name)
        if new:
            with open(new, "wb") as f:
                f.write(data)
        return data

    @staticmethod
    def verify_from_r1cs(r1cs, ptau, zkey, logger=None):
        from .ceremony import zkey_mpc
        from .formats import ptau as ptau_fmt
        from .formats.r1cs import read_r1cs

        if isinstance(r1cs, (str, bytes)):
            r1cs = read_r1cs(r1cs)
        if isinstance(ptau, (str, bytes)):
            ptau = ptau_fmt.read_ptau(ptau)
        return zkey_mpc.verify_from_r1cs(r1cs, ptau, _load_bytes(zkey),
                                         logger=logger)

    @staticmethod
    def verify_from_init(init_zkey, ptau, zkey, logger=None):
        from .ceremony import zkey_mpc
        from .formats import ptau as ptau_fmt

        if isinstance(ptau, (str, bytes)):
            ptau = ptau_fmt.read_ptau(ptau)
        return zkey_mpc.verify_from_init(_load_bytes(init_zkey), ptau,
                                         _load_bytes(zkey), logger=logger)

    @staticmethod
    def export_verification_key(zkey, out=None):
        from .formats import zkey as zkey_fmt
        from .protocols import fflonk, groth16, plonk

        proto = zkey_fmt.zkey_protocol(zkey)
        if proto == "groth16":
            vk = groth16.export_verification_key(
                zkey_fmt.read_groth16_zkey(zkey))
        elif proto == "plonk":
            vk = plonk.export_verification_key(zkey_fmt.read_plonk_zkey(zkey))
        else:
            vk = fflonk.export_verification_key(
                zkey_fmt.read_fflonk_zkey(zkey))
        if out:
            with open(out, "w") as f:
                json.dump(vk, f, indent=1)
        return vk

    @staticmethod
    def export_solidity_verifier(zkey, out=None):
        from .export import solidity

        vk = _Zkey.export_verification_key(zkey)
        src = solidity.export_verifier(vk)
        if out:
            with open(out, "w") as f:
                f.write(src)
        return src


class _Wtns(_NS):
    @staticmethod
    def calculate(input_map, wasm, wtns_path=None):
        from .wasm.witness_calculator import calculate_wtns

        data = calculate_wtns(_load_json(input_map), wasm)
        if wtns_path:
            with open(wtns_path, "wb") as f:
                f.write(data)
        return data

    @staticmethod
    def check(r1cs, wtns, logger=None):
        from . import tools
        from .formats import wtns as wtns_fmt
        from .formats.r1cs import read_r1cs

        if isinstance(r1cs, (str, bytes)):
            r1cs = read_r1cs(r1cs)
        if isinstance(wtns, (str, bytes)):
            wtns = wtns_fmt.read_wtns(wtns)
        return tools.wtns_check(r1cs, wtns, logger=logger)

    @staticmethod
    def debug(input_map, wasm, sym=None, logger=None, **kw):
        from . import tools

        return tools.wtns_debug(_load_json(input_map), wasm, sym_path=sym,
                                logger=logger, **kw)

    @staticmethod
    def export_json(wtns):
        from . import tools
        from .formats import wtns as wtns_fmt

        if isinstance(wtns, (str, bytes)):
            wtns = wtns_fmt.read_wtns(wtns)
        return tools.wtns_export_json(wtns)


class _R1cs(_NS):
    @staticmethod
    def info(r1cs, logger=None):
        from . import tools
        from .formats.r1cs import read_r1cs

        if isinstance(r1cs, (str, bytes)):
            r1cs = read_r1cs(r1cs)
        return tools.r1cs_info(r1cs, logger=logger)

    @staticmethod
    def print_constraints(r1cs, sym, logger=None):
        from . import tools
        from .formats.r1cs import read_r1cs

        if isinstance(r1cs, (str, bytes)):
            r1cs = read_r1cs(r1cs)
        return tools.r1cs_print(r1cs, tools.load_syms(sym), logger=logger)

    @staticmethod
    def export_json(r1cs):
        from . import tools
        from .formats.r1cs import read_r1cs

        if isinstance(r1cs, (str, bytes)):
            r1cs = read_r1cs(r1cs)
        return tools.r1cs_export_json(r1cs)


groth16 = _Groth16()
plonk = _Plonk()
fflonk = _Fflonk()
powersOfTau = _PowersOfTau()
powers_of_tau = powersOfTau
zKey = _Zkey()
zkey = zKey
wtns = _Wtns()
r1cs = _R1cs()
