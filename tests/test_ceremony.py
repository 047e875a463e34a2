"""Powers-of-tau ceremony end-to-end, mirroring reference
test/fullprocess.js:6-60 at a reduced power (in-memory, no fixtures):

  new -> contribute -> export challenge -> challenge contribute ->
  import response -> beacon -> preparePhase2 -> verify
  (+ negative checks, truncate, round-trip through bytes)
"""

import numpy as np
import pytest

from snarkjs_tpu.ceremony import ptau_ops as ops
from snarkjs_tpu.curves import host_curve as hc
from snarkjs_tpu.formats import ptau as ptau_fmt
from snarkjs_tpu.utils.chacha import ChaCha

POWER = 4


@pytest.fixture(scope="module")
def ceremony():
    cv = hc.BN254
    pt0 = ops.new_accumulator(cv, POWER)

    pt1, resp1 = ops.contribute(pt0, name="first", rng=ChaCha([1] * 8))

    challenge = ops.export_challenge(pt1)
    response = ops.challenge_contribute(cv, challenge, rng=ChaCha([2] * 8))
    pt2 = ops.import_response(pt1, response, name="second")

    pt3, _ = ops.beacon(pt2, bytes.fromhex("00" * 32), 10, name="beacon")
    pt4 = ops.prepare_phase2(pt3)
    return cv, pt0, pt1, pt2, pt3, pt4


def test_verify_full_ceremony(ceremony):
    cv, pt0, pt1, pt2, pt3, pt4 = ceremony
    rng = np.random.default_rng(7)
    assert ops.verify(pt4, rng=rng)


def test_verify_before_prepare(ceremony):
    cv, pt0, pt1, pt2, pt3, pt4 = ceremony
    assert ops.verify(pt3, rng=np.random.default_rng(8))


def test_no_contributions_rejected(ceremony):
    cv, pt0, *_ = ceremony
    assert not ops.verify(pt0, rng=np.random.default_rng(9))


def test_tampered_section_rejected(ceremony):
    cv, pt0, pt1, pt2, pt3, pt4 = ceremony
    bad = ptau_fmt.PtauFile(cv, pt3.power, pt3.ceremony_power,
                            sections=dict(pt3.sections),
                            contributions=list(pt3.contributions))
    # swap two tauG1 points -> power sequence breaks
    s = bytearray(bad.sections[2])
    sz = 2 * cv.fq.n8
    s[sz:2 * sz], s[2 * sz:3 * sz] = s[2 * sz:3 * sz], s[sz:2 * sz]
    bad.sections[2] = bytes(s)
    assert not ops.verify(bad, rng=np.random.default_rng(10))


def test_file_roundtrip(ceremony, tmp_path):
    cv, pt0, pt1, pt2, pt3, pt4 = ceremony
    path = str(tmp_path / "final.ptau")
    pt4.save(path)
    back = ptau_fmt.read_ptau(path)
    assert back.power == POWER
    assert back.sections[2] == pt4.sections[2]
    assert back.sections[12] == pt4.sections[12]
    assert len(back.contributions) == len(pt4.contributions)
    assert (back.contributions[-1].next_challenge
            == pt4.contributions[-1].next_challenge)
    assert ops.verify(back, rng=np.random.default_rng(11))


def test_truncate(ceremony):
    cv, pt0, pt1, pt2, pt3, pt4 = ceremony
    tr = ops.truncate(pt4, POWER - 1)
    n = 1 << (POWER - 1)
    assert len(tr.sections[2]) == (2 * n - 1) * 2 * cv.fq.n8
    # truncated file fails the nextChallenge check only if power==ceremony
    # power; reference skips it for reduced files, and so do we
    assert ops.verify(tr, rng=np.random.default_rng(12))


def test_lagrange_matches_host_ifft(ceremony):
    """Section 12 at power p: IFFT([tau^i G]) == [L_j(tau) G] with L_j from
    host Lagrange interpolation at a known tau (cross-check the group NTT
    against an independent bigint computation for a tiny case)."""
    cv = hc.BN254
    fr, fq = cv.fr, cv.fq
    tau = 1234567
    p = 3
    n = 1 << p
    pts = [hc.g1_mul(cv, cv.g1, pow(tau, i, fr.p)) for i in range(n)]
    lem = b"".join(ptau_fmt.g1_lem(fq, pt) for pt in pts)
    out = ops.group_lagrange_lem(cv, lem, n, g2=False)
    from snarkjs_tpu.formats import points as pcodec
    got = pcodec.g1_lem_to_ints(fq, out, n)

    # L_j(tau) = (1/n) sum_i w^{-ij} tau^i
    w = fr.w[p]
    ninv = pow(n, fr.p - 2, fr.p)
    for j in range(n):
        lj = 0
        for i in range(n):
            lj = (lj + pow(w, (-i * j) % (fr.p - 1), fr.p) * pow(tau, i, fr.p)) % fr.p
        lj = lj * ninv % fr.p
        assert got[j] == hc.g1_mul(cv, cv.g1, lj)
