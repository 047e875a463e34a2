"""snarkjs_tpu — TPU-native zkSNARK toolkit with the iden3/snarkjs API
surface (reference main.js:1-8): `snarkjs_tpu.groth16.prove(...)`,
`snarkjs_tpu.powersOfTau.verify(...)`, etc.  Namespaces import lazily so
`import snarkjs_tpu` stays cheap (no jax import until compute is needed).
"""

_NAMESPACES = ("groth16", "plonk", "fflonk", "powersOfTau", "powers_of_tau",
               "zKey", "zkey", "wtns", "r1cs")

__all__ = list(_NAMESPACES)


def __getattr__(name):
    if name in _NAMESPACES:
        from . import api

        return getattr(api, name)
    raise AttributeError(name)
