"""Optimal-ate pairing properties (curves/host_curve.py).

The pairing engine is the reduced optimal ate — the canonical value
ffjavascript computes (reference src/groth16_verify.js:72-78, Gt export
src/zkey_export_verificationkey.js:59).  Bilinearity + order-r +
non-degeneracy pin the construction: a wrong loop constant or a missing
BN frobenius line correction breaks bilinearity.
"""

import random

import pytest

from snarkjs_tpu.curves import host_curve as hc
from snarkjs_tpu.curves import tower as tw


@pytest.mark.parametrize("name", ["bn128", "bls12381"])
def test_ate_bilinear_order_nondegenerate(name):
    cv = hc.get_curve(name)
    r, p, xi = cv.fr.p, cv.fq.p, cv.xi
    rng = random.Random(1234)
    a, b = rng.randrange(1, r), rng.randrange(1, r)
    e = hc.pairing(cv, cv.g1, cv.g2)
    assert e != tw.f12_one()
    assert tw.f12_pow(e, r, p, xi) == tw.f12_one()
    e_ab = hc.pairing(cv, hc.g1_mul(cv, cv.g1, a), hc.g2_mul(cv, cv.g2, b))
    assert e_ab == tw.f12_pow(e, a * b % r, p, xi)
    # argument splitting: e(aP, Q) == e(P, aQ)
    assert hc.pairing(cv, hc.g1_mul(cv, cv.g1, a), cv.g2) == \
        tw.f12_pow(e, a, p, xi)


def test_vk_alphabeta_12_matches_direct_pairing():
    """export_verification_key's Gt field == e(alpha, beta) recomputed."""
    cv = hc.get_curve("bn128")
    rng = random.Random(7)
    alpha = hc.g1_mul(cv, cv.g1, rng.randrange(1, cv.fr.p))
    beta = hc.g2_mul(cv, cv.g2, rng.randrange(1, cv.fr.p))
    from snarkjs_tpu.protocols.groth16 import _gt_obj

    obj = _gt_obj(hc.pairing(cv, alpha, beta))
    assert len(obj) == 2 and all(len(f6) == 3 for f6 in obj)
    assert all(len(f2) == 2 for f6 in obj for f2 in f6)
    # decimal strings, reduced mod p
    assert all(0 <= int(c) < cv.fq.p for f6 in obj for f2 in f6 for c in f2)
