"""Powers-of-tau ceremony operations (reference src/powersoftau_*.js).

TPU-first redesign: the reference fans `G.batchApplyKey` / `G.lagrangeEvaluations`
chunks to WASM worker threads (src/powersoftau_contribute.js:119-158,
src/powersoftau_preparephase2.js:67-139); here the whole section is a
limb-major jax array and the heavy ops are single jitted programs —
per-point scalar multiplication (double-and-add scan over 2-adic scalar
powers) and a radix-2 group-element NTT whose butterflies run branch-free
jacobian adds over the full batch.  Hash chains (blake2b challenge /
response / nextChallenge) are bit-compatible with the reference, including
the 216-byte partial-hash resume trick (src/misc.js:89-127).

Operations:
  new_accumulator      src/powersoftau_new.js:73-144
  contribute           src/powersoftau_contribute.js:33-117
  beacon               src/powersoftau_beacon.js:25+
  export_challenge     src/powersoftau_export_challenge.js:45-115
  challenge_contribute src/powersoftau_challenge_contribute.js:46-115
  import_response      src/powersoftau_import.js:28-95
  verify               src/powersoftau_verify.js:129-289,340-491
  prepare_phase2       src/powersoftau_preparephase2.js:24-49
  truncate             src/powersoftau_truncate.js:23-58
  convert              src/powersoftau_convert.js:25-45
  export_json          src/powersoftau_export_json.js
"""

from __future__ import annotations

import functools
import hashlib
import secrets

import numpy as np

from ..curves import host_curve as hc
from ..curves import msm as msm_mod
from ..curves.gops import FqOps, Fq2Ops
from ..curves import jac
from ..fields import fjnp
from ..utils.blake2b import Blake2b
from ..utils.spool import SpooledOut
from ..utils.chacha import ChaCha
from . import keypair
from ..formats import points as pcodec
from ..formats import ptau as ptau_fmt
from ..formats.ptau import (
    PtauFile, Contribution, CONTRIB_BEACON, CONTRIB_MPC,
    first_challenge_hash, pubkey_to_bytes, pubkey_from_bytes, pubkey_size,
)


# ---------------------------------------------------------------------------
# RNGs (reference src/misc.js:182-228)

def random_rng(entropy: str | bytes | None = None) -> ChaCha:
    """blake2b(64 random bytes || entropy) -> BE u32 seed (misc.getRandomRng)."""
    h = hashlib.blake2b(digest_size=64)
    h.update(secrets.token_bytes(64))
    if entropy:
        h.update(entropy.encode() if isinstance(entropy, str) else entropy)
    return ChaCha(_seed_be(h.digest()))


def rng_from_beacon(beacon_hash: bytes, num_iterations_exp: int) -> ChaCha:
    """iterated sha256 (misc.rngFromBeaconParams, src/misc.js:201-228)."""
    cur = beacon_hash
    for _ in range(1 << num_iterations_exp):
        cur = hashlib.sha256(cur).digest()
    return ChaCha(_seed_be(cur))


def key_from_beacon(cv, challenge: bytes, beacon_hash: bytes,
                    num_iterations_exp: int) -> dict:
    """src/powersoftau_utils.js:361-368."""
    rng = rng_from_beacon(beacon_hash, num_iterations_exp)
    return keypair.create_ptau_key(cv, challenge, rng)


def _seed_be(h: bytes):
    return [int.from_bytes(h[4 * i:4 * i + 4], "big") for i in range(8)]


def parse_beacon_hash(s: str) -> bytes:
    b = bytes.fromhex(s[2:] if s.startswith("0x") else s)
    if len(b) == 0 or len(b) % 2 != 0:
        raise ValueError("Invalid beacon hash")
    return b


# ---------------------------------------------------------------------------
# device batchApplyKey — points[i] *= first * inc^i

_APPLY_CHUNK = 1 << 15


@functools.lru_cache(maxsize=None)
def _apply_key_fn(fq_name: str, fr_name: str, ext: int, n: int):
    import jax
    import jax.numpy as jnp

    fqctx = fjnp.get_ctx(fq_name)
    frctx = fjnp.get_ctx(fr_name)
    f = FqOps(fqctx) if ext == 1 else Fq2Ops(fqctx)
    nbits = frctx.fp.p.bit_length()

    @jax.jit
    def fn(px, py, pinf, first_m, inc_m):
        # scalar powers first*inc^i via log-depth scan (Montgomery)
        factors = jnp.concatenate(
            [first_m, jnp.broadcast_to(inc_m, (frctx.nl, n - 1))], axis=1
        ) if n > 1 else first_m
        powers_m = jax.lax.associative_scan(
            lambda a, b: fjnp.mont_mul(frctx, a, b), factors, axis=1)
        powers = fjnp.from_mont(frctx, powers_m)
        bits = jac.scalar_bits_from_limbs(powers, nbits)
        P = jac.from_affine(f, px, py, pinf)
        Q = jac.batch_scalar_mul(f, P, bits)
        return jac.to_affine_batch(f, Q, f.batch_inv)

    return fn


_AK_SHARD_CACHE = {}


def _apply_key_fn_sharded(fq_name: str, fr_name: str, ext: int, n_loc: int,
                          mesh):
    """batchApplyKey over a mesh: points sharded on 'd', each device gets
    its own `first` (the power ladder restarts at its shard offset)."""
    key = (fq_name, fr_name, ext, n_loc, id(mesh))
    fn = _AK_SHARD_CACHE.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    shard_map = (jax.shard_map if hasattr(jax, "shard_map")
                 else jax.experimental.shard_map.shard_map)
    fqctx = fjnp.get_ctx(fq_name)
    frctx = fjnp.get_ctx(fr_name)
    f = FqOps(fqctx) if ext == 1 else Fq2Ops(fqctx)
    nbits = frctx.fp.p.bit_length()

    def local(px, py, pinf, first_m, inc_m):
        factors = jnp.concatenate(
            [first_m, jnp.broadcast_to(inc_m, (frctx.nl, n_loc - 1))],
            axis=1) if n_loc > 1 else first_m
        powers_m = jax.lax.associative_scan(
            lambda a, b: fjnp.mont_mul(frctx, a, b), factors, axis=1)
        powers = fjnp.from_mont(frctx, powers_m)
        bits = jac.scalar_bits_from_limbs(powers, nbits)
        Pt = jac.from_affine(f, px, py, pinf)
        Q = jac.batch_scalar_mul(f, Pt, bits)
        return jac.to_affine_batch(f, Q, f.batch_inv)

    elem = P(None, "d")
    xspec = elem if ext == 1 else (elem, elem)
    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(xspec, xspec, P("d"), P(None, "d"), P(None, None)),
        out_specs=(xspec, xspec, P("d")),
        check_vma=False))
    _AK_SHARD_CACHE[key] = fn
    return fn


def _apply_key_sharded(cv, lem: bytes, n: int, first: int, inc: int,
                       mesh, ext: int) -> bytes:
    """Mesh-sharded batchApplyKey over a LEM section (both groups)."""
    import jax
    import jax.numpy as jnp

    fq, fr = cv.fq, cv.fr
    ndev = mesh.shape["d"]
    sz = (4 if ext == 2 else 2) * fq.n8
    conv_in = pcodec.g2_lem_from_bytes if ext == 2 else pcodec.g1_lem_from_bytes
    out = SpooledOut()
    t = first % fr.p
    SC = _APPLY_CHUNK * ndev
    for i0 in range(0, n, SC):
        m = min(SC, n - i0)
        loc = _pad_pow2(-(-m // ndev))
        mp = loc * ndev
        x, y, inf = conv_in(fq, lem[i0 * sz:], m)
        padc = lambda a: np.pad(a, ((0, 0), (0, mp - m)))
        x = jax.tree.map(padc, x)
        y = jax.tree.map(padc, y)
        inf = np.pad(inf, (0, mp - m), constant_values=True)
        firsts = fjnp.np_from_ints(
            fr, [fr.to_mont(t * pow(inc, j * loc, fr.p) % fr.p)
                 for j in range(ndev)])
        im = fjnp.np_from_ints(fr, [fr.to_mont(inc)])
        fn = _apply_key_fn_sharded(fq.name, fr.name, ext, loc, mesh)
        ox, oy, oinf = fn(jax.tree.map(jnp.asarray, x),
                          jax.tree.map(jnp.asarray, y),
                          jnp.asarray(inf), jnp.asarray(firsts),
                          jnp.asarray(im))
        if ext == 2:
            out.write(pcodec.g2_lem_to_bytes(
                fq, tuple(np.asarray(c)[:, :m] for c in ox),
                tuple(np.asarray(c)[:, :m] for c in oy),
                np.asarray(oinf)[:m]))
        else:
            out.write(pcodec.g1_lem_to_bytes(
                fq, np.asarray(ox)[:, :m], np.asarray(oy)[:, :m],
                np.asarray(oinf)[:m]))
        t = t * pow(inc, m, fr.p) % fr.p
    return out.finish()


_HOST_MAX = 64      # below this, host bigint math beats an XLA compile


def _pad_pow2(m: int, lo: int = 16) -> int:
    p2 = lo
    while p2 < m:
        p2 *= 2
    return p2


def apply_key_g1(cv, lem: bytes, n: int, first: int, inc: int,
                 mesh=None) -> bytes:
    """G1.batchApplyKey on a LEM section (device; host for tiny sections).

    Chunks are padded to power-of-two sizes so repeated calls share one
    compiled kernel per size class.  mesh: shard points over axis 'd'
    (ceremony contribute at large powers, SURVEY 2.10 axis 1)."""
    fq, fr = cv.fq, cv.fr
    if mesh is not None and n > _HOST_MAX:
        return _apply_key_sharded(cv, lem, n, first, inc, mesh, 1)
    if n <= _HOST_MAX:
        pts = pcodec.g1_lem_to_ints(fq, lem, n)
        out, t = [], first % fr.p
        for P in pts:
            out.append(None if P is None else hc.g1_mul(cv, P, t))
            t = t * inc % fr.p
        return pcodec.g1_lem_from_ints(fq, out)
    out = SpooledOut()
    t = first % fr.p
    for i0 in range(0, n, _APPLY_CHUNK):
        m = min(_APPLY_CHUNK, n - i0)
        mp = _pad_pow2(m)
        x, y, inf = pcodec.g1_lem_from_bytes(fq, lem[i0 * 2 * fq.n8:], m)
        x = np.pad(x, ((0, 0), (0, mp - m)))
        y = np.pad(y, ((0, 0), (0, mp - m)))
        inf = np.pad(inf, (0, mp - m), constant_values=True)
        fn = _apply_key_fn(fq.name, fr.name, 1, mp)
        fm = fjnp.np_from_ints(fr, [fr.to_mont(t)])
        im = fjnp.np_from_ints(fr, [fr.to_mont(inc)])
        ox, oy, oinf = fn(x, y, inf, fm, im)
        out.write(pcodec.g1_lem_to_bytes(fq, np.asarray(ox)[:, :m],
                                         np.asarray(oy)[:, :m],
                                         np.asarray(oinf)[:m]))
        t = t * pow(inc, m, fr.p) % fr.p
    return out.finish()


def apply_key_g2(cv, lem: bytes, n: int, first: int, inc: int,
                 mesh=None) -> bytes:
    fq, fr = cv.fq, cv.fr
    if mesh is not None and n > _HOST_MAX:
        return _apply_key_sharded(cv, lem, n, first, inc, mesh, 2)
    if n <= _HOST_MAX:
        pts = pcodec.g2_lem_to_ints(fq, lem, n)
        out, t = [], first % fr.p
        for P in pts:
            out.append(None if P is None else hc.g2_mul_any(cv, P, t))
            t = t * inc % fr.p
        return pcodec.g2_lem_from_ints(fq, out)
    out = SpooledOut()
    t = first % fr.p
    for i0 in range(0, n, _APPLY_CHUNK):
        m = min(_APPLY_CHUNK, n - i0)
        mp = _pad_pow2(m)
        x, y, inf = pcodec.g2_lem_from_bytes(fq, lem[i0 * 4 * fq.n8:], m)
        x = tuple(np.pad(c, ((0, 0), (0, mp - m))) for c in x)
        y = tuple(np.pad(c, ((0, 0), (0, mp - m))) for c in y)
        inf = np.pad(inf, (0, mp - m), constant_values=True)
        fn = _apply_key_fn(fq.name, fr.name, 2, mp)
        fm = fjnp.np_from_ints(fr, [fr.to_mont(t)])
        im = fjnp.np_from_ints(fr, [fr.to_mont(inc)])
        (ox0, ox1), (oy0, oy1), oinf = fn(x, y, inf, fm, im)
        out.write(pcodec.g2_lem_to_bytes(
            fq, (np.asarray(ox0)[:, :m], np.asarray(ox1)[:, :m]),
            (np.asarray(oy0)[:, :m], np.asarray(oy1)[:, :m]),
            np.asarray(oinf)[:m]))
        t = t * pow(inc, m, fr.p) % fr.p
    return out.finish()


# ---------------------------------------------------------------------------
# section wire-format conversions for hashing (LEM -> U / C)

def lem_to_u(cv, lem: bytes, n: int, g2: bool) -> bytes:
    """batchLEMtoU: big-endian standard affine; F2 components swapped."""
    fq = cv.fq
    if g2:
        pts = pcodec.g2_lem_to_ints(fq, lem, n)
        return b"".join(pcodec.g2_uncompressed_be(fq, p) for p in pts)
    pts = pcodec.g1_lem_to_ints(fq, lem, n)
    return b"".join(pcodec.g1_uncompressed_be(fq, p) for p in pts)


def lem_to_c(cv, lem: bytes, n: int, g2: bool) -> bytes:
    """batchLEMtoC: compressed BE with 0x80 sign / 0x40 infinity flags."""
    fq = cv.fq
    if g2:
        pts = pcodec.g2_lem_to_ints(fq, lem, n)
        return b"".join(ptau_fmt.g2_compressed_be(fq, p) for p in pts)
    pts = pcodec.g1_lem_to_ints(fq, lem, n)
    return b"".join(ptau_fmt.g1_compressed_be(fq, p) for p in pts)


def c_to_lem(cv, data: bytes, n: int, g2: bool) -> bytes:
    """batchCtoLEM: decompress (sqrt) — host bigint path."""
    fq = cv.fq
    p = fq.p
    out = bytearray()
    if not g2:
        for i in range(n):
            b = data[i * fq.n8:(i + 1) * fq.n8]
            flags = b[0]
            if flags & 0x40:
                out += b"\0" * (2 * fq.n8)
                continue
            x = int.from_bytes(bytes([flags & 0x3F]) + b[1:], "big")
            y = keypair._fq_sqrt(fq, (x * x % p * x + cv.b) % p)
            if y is None:
                raise ValueError("point is not on the curve")
            if (int(y) > p >> 1) != bool(flags & 0x80):
                y = (-y) % p
            out += pcodec.g1_lem_from_ints(fq, [(x, y)])
        return bytes(out)
    from ..curves import tower as tw
    for i in range(n):
        b = data[i * 2 * fq.n8:(i + 1) * 2 * fq.n8]
        flags = b[0]
        if flags & 0x40:
            out += b"\0" * (4 * fq.n8)
            continue
        x1 = int.from_bytes(bytes([flags & 0x3F]) + b[1:fq.n8], "big")
        x0 = int.from_bytes(b[fq.n8:], "big")
        x = (x0, x1)
        x3b = tw.f2_add(tw.f2_mul(tw.f2_mul(x, x, p), x, p), cv.b2, p)
        y = keypair._f2_sqrt(fq, x3b)
        if y is None:
            raise ValueError("point is not on the curve")
        if keypair._f2_gt(p, y, tw.f2_neg(y, p)) != bool(flags & 0x80):
            y = tw.f2_neg(y, p)
        out += pcodec.g2_lem_from_ints(fq, [(x, y)])
    return bytes(out)


def u_to_lem(cv, data: bytes, n: int, g2: bool) -> bytes:
    """batchUtoLEM."""
    fq = cv.fq
    if g2:
        pts = [ptau_fmt.g2_u_to_ints(fq, data[i * 4 * fq.n8:(i + 1) * 4 * fq.n8])
               for i in range(n)]
        return b"".join(pcodec.g2_lem_from_ints(fq, [p]) for p in pts)
    pts = [ptau_fmt.g1_u_to_ints(fq, data[i * 2 * fq.n8:(i + 1) * 2 * fq.n8])
           for i in range(n)]
    return b"".join(pcodec.g1_lem_from_ints(fq, [p]) for p in pts)


# section metadata: sid -> (g2?, count(power), first/inc keys)
def _sections(power: int):
    n = 1 << power
    return [
        (2, False, 2 * n - 1, "tauG1"),
        (3, True, n, "tauG2"),
        (4, False, n, "alphaTauG1"),
        (5, False, n, "betaTauG1"),
        (6, True, 1, "betaG2"),
    ]


# ---------------------------------------------------------------------------
# operations

def new_accumulator(cv, power: int) -> PtauFile:
    """Blank accumulator: every point is the group generator (tau=1)."""
    pt = PtauFile(cv, power, power)
    n = 1 << power
    g1b = ptau_fmt.g1_lem(cv.fq, cv.g1)
    g2b = ptau_fmt.g2_lem(cv.fq, cv.g2)
    pt.sections[2] = g1b * (2 * n - 1)
    pt.sections[3] = g2b * n
    pt.sections[4] = g1b * n
    pt.sections[5] = g1b * n
    pt.sections[6] = g2b
    return pt


def contribute(pt: PtauFile, name: str = "", entropy=None,
               rng: ChaCha | None = None, logger=None,
               mesh=None) -> tuple[PtauFile, bytes]:
    """MPC contribution: scale all sections by the new key's powers
    (src/powersoftau_contribute.js:33-117).  Returns (new ptau, responseHash).
    """
    cv = pt.curve
    if pt.power != pt.ceremony_power:
        raise ValueError("This file has been reduced. "
                         "You cannot contribute into a reduced file.")
    last_challenge = pt.last_challenge()
    if rng is None:
        rng = random_rng(entropy)
    key = keypair.create_ptau_key(cv, last_challenge, rng)
    return _apply_contribution(pt, key, Contribution(name=name,
                                                     type=CONTRIB_MPC),
                               mesh=mesh)


def beacon(pt: PtauFile, beacon_hash: bytes, num_iterations_exp: int,
           name: str = "", logger=None, mesh=None) -> tuple[PtauFile, bytes]:
    """Deterministic beacon contribution (src/powersoftau_beacon.js)."""
    cv = pt.curve
    if not (0 < num_iterations_exp < 64):
        raise ValueError("Invalid numIterationsExp")
    last_challenge = pt.last_challenge()
    key = key_from_beacon(cv, last_challenge, beacon_hash, num_iterations_exp)
    contrib = Contribution(name=name, type=CONTRIB_BEACON,
                           num_iterations_exp=num_iterations_exp,
                           beacon_hash=beacon_hash)
    return _apply_contribution(pt, key, contrib, mesh=mesh)


def _hash_section(hasher, cv, lem, n: int, g2: bool, conv):
    """Chunked section hash (bounded host memory, src/powersoftau_contribute
    hashSection analogue)."""
    sz = (4 if g2 else 2) * cv.fq.n8
    mv = memoryview(lem)
    for i0 in range(0, n, _APPLY_CHUNK):
        m = min(_APPLY_CHUNK, n - i0)
        hasher.update(conv(cv, mv[i0 * sz:(i0 + m) * sz], m, g2))


def _apply_contribution(pt: PtauFile, key: dict, contrib: Contribution,
                        mesh=None):
    cv = pt.curve
    fr = cv.fr
    tau = key["tau"]["prvKey"]
    alpha = key["alpha"]["prvKey"]
    beta_ = key["beta"]["prvKey"]
    contrib.key = key

    new = PtauFile(cv, pt.power, pt.ceremony_power,
                   contributions=list(pt.contributions))

    response_h = Blake2b(64)
    response_h.update(pt.last_challenge())

    firsts = {}
    for sid, g2, n, _name in _sections(pt.power):
        first = {2: 1, 3: 1, 4: alpha, 5: beta_, 6: beta_}[sid]
        ap = apply_key_g2 if g2 else apply_key_g1
        out = ap(cv, pt.sections[sid], n, first, tau, mesh=mesh)
        new.sections[sid] = out
        _hash_section(response_h, cv, out, n, g2, lem_to_c)
        if g2:
            firsts[sid] = pcodec.g2_lem_to_ints(cv.fq, out, min(2, n))
        else:
            firsts[sid] = pcodec.g1_lem_to_ints(cv.fq, out, min(2, n))

    contrib.tau_g1 = firsts[2][1]
    contrib.tau_g2 = firsts[3][1]
    contrib.alpha_g1 = firsts[4][0]
    contrib.beta_g1 = firsts[5][0]
    contrib.beta_g2 = firsts[6][0]

    contrib.partial_hash = response_h.to_partial()
    response_h2 = Blake2b.from_partial(contrib.partial_hash)
    response_h2.update(pubkey_to_bytes(cv, key, montgomery=False))
    response_hash = response_h2.digest()

    next_h = Blake2b(64)
    next_h.update(response_hash)
    for sid, g2, n, _name in _sections(pt.power):
        _hash_section(next_h, cv, new.sections[sid], n, g2, lem_to_u)
    contrib.next_challenge = next_h.digest()
    new.contributions.append(contrib)
    return new, response_hash


def export_challenge(pt: PtauFile) -> bytes:
    """Bellman-compatible challenge file: lastResponseHash || U sections
    (src/powersoftau_export_challenge.js)."""
    cv = pt.curve
    if pt.contributions:
        last = pt.contributions[-1]
        last_response = last.response_hash(cv)
        cur_challenge = last.next_challenge
    else:
        last_response = Blake2b(64).digest()
        cur_challenge = first_challenge_hash(cv, pt.power)

    out = bytearray(last_response)
    to_hash = Blake2b(64)
    to_hash.update(last_response)
    for sid, g2, n, _name in _sections(pt.power):
        u = lem_to_u(cv, pt.sections[sid], n, g2)
        out += u
        to_hash.update(u)
    if to_hash.digest() != cur_challenge:
        raise ValueError("PTau file is corrupted. Calculated new challenge "
                         "hash does not match with the declared one")
    return bytes(out)


def challenge_contribute(cv, challenge: bytes, entropy=None,
                         rng: ChaCha | None = None) -> bytes:
    """Produce a Bellman-compatible compressed response file
    (src/powersoftau_challenge_contribute.js)."""
    fq = cv.fq
    s_g1, s_g2 = 2 * fq.n8, 4 * fq.n8
    domain = (len(challenge) + s_g1 - 64 - s_g2) // (4 * s_g1 + s_g2)
    power = domain.bit_length() - 1
    if 1 << power != domain:
        raise ValueError("Invalid file size")

    challenge_hash = Blake2b(64).update(challenge).digest()
    if rng is None:
        rng = random_rng(entropy)
    key = keypair.create_ptau_key(cv, challenge_hash, rng)
    tau, alpha, beta_ = (key[k]["prvKey"] for k in ("tau", "alpha", "beta"))

    out = bytearray(challenge_hash)
    pos = 64
    for sid, g2, n, _name in _sections(power):
        first = {2: 1, 3: 1, 4: alpha, 5: beta_, 6: beta_}[sid]
        sz = (s_g2 if g2 else s_g1) * n
        lem = u_to_lem(cv, challenge[pos:pos + sz], n, g2)
        pos += sz
        ap = apply_key_g2 if g2 else apply_key_g1
        out += lem_to_c(cv, ap(cv, lem, n, first, tau), n, g2)
    out += pubkey_to_bytes(cv, key, montgomery=False)
    return bytes(out)


def import_response(pt: PtauFile, response: bytes, name: str = "",
                    import_points: bool = True) -> PtauFile:
    """Import a compressed response into a new ptau
    (src/powersoftau_import.js:28-95)."""
    cv = pt.curve
    fq = cv.fq
    power = pt.power
    n = 1 << power
    sc_g1, sc_g2 = fq.n8, 2 * fq.n8
    expected = (64 + (2 * n - 1) * sc_g1 + n * sc_g2 + 2 * n * sc_g1 + sc_g2
                + 2 * fq.n8 * 6 + 4 * fq.n8 * 3)
    if len(response) != expected:
        raise ValueError("Size of the contribution is invalid")

    last_challenge = pt.last_challenge()
    prev_hash = response[:64]
    if last_challenge == b"\xff" * 64:
        last_challenge = prev_hash
        pt.contributions[-1].next_challenge = prev_hash
    if prev_hash != last_challenge:
        raise ValueError("Wrong contribution. This contribution is not "
                         "based on the previous hash")

    contrib = Contribution(name=name, type=CONTRIB_MPC)
    hasher = Blake2b(64)
    hasher.update(prev_hash)

    new = PtauFile(cv, power, pt.ceremony_power,
                   contributions=list(pt.contributions))
    pos = 64
    singulars = {}
    for sid, g2, np_, _name in _sections(power):
        scg = sc_g2 if g2 else sc_g1
        chunk = response[pos:pos + np_ * scg]
        pos += np_ * scg
        hasher.update(chunk)
        lem = c_to_lem(cv, chunk, np_, g2)
        new.sections[sid] = lem
        conv = pcodec.g2_lem_to_ints if g2 else pcodec.g1_lem_to_ints
        singulars[sid] = conv(fq, lem, min(2, np_))

    contrib.tau_g1 = singulars[2][1]
    contrib.tau_g2 = singulars[3][1]
    contrib.alpha_g1 = singulars[4][0]
    contrib.beta_g1 = singulars[5][0]
    contrib.beta_g2 = singulars[6][0]

    contrib.partial_hash = hasher.to_partial()
    key_bytes = response[pos:pos + pubkey_size(cv)]
    contrib.key = pubkey_from_bytes(cv, key_bytes, montgomery=False)
    hasher2 = Blake2b.from_partial(contrib.partial_hash)
    hasher2.update(key_bytes)
    response_hash = hasher2.digest()

    if import_points:
        next_h = Blake2b(64)
        next_h.update(response_hash)
        for sid, g2, np_, _name in _sections(power):
            next_h.update(lem_to_u(cv, new.sections[sid], np_, g2))
        contrib.next_challenge = next_h.digest()
    else:
        contrib.next_challenge = b"\xff" * 64
    new.contributions.append(contrib)
    return new


# ---------------------------------------------------------------------------
# verification (src/powersoftau_verify.js)

def _initial_contribution(cv, ceremony_power: int) -> Contribution:
    c = Contribution(tau_g1=cv.g1, tau_g2=cv.g2, alpha_g1=cv.g1,
                     beta_g1=cv.g1, beta_g2=cv.g2)
    c.next_challenge = first_challenge_hash(cv, ceremony_power)
    return c


def _verify_contribution(cv, cur: Contribution, prev: Contribution,
                         logger=None) -> bool:
    """Pairing checks linking cur to prev (src/powersoftau_verify.js:28-127)."""
    def err(msg):
        if logger:
            logger.error(msg)
        return False

    if cur.type == CONTRIB_BEACON:
        bkey = key_from_beacon(cv, prev.next_challenge, cur.beacon_hash,
                               cur.num_iterations_exp)
        for grp in ("tau", "alpha", "beta"):
            for nm in ("g1_s", "g1_sx", "g2_spx"):
                if cur.key[grp][nm] != bkey[grp][nm]:
                    return err(f"BEACON key ({grp}.{nm}) is not generated "
                               f"correctly in challenge #{cur.id}")

    for i, grp in enumerate(("tau", "alpha", "beta")):
        cur.key[grp]["g2_sp"] = keypair.get_g2sp(
            cv, i, prev.next_challenge,
            cur.key[grp]["g1_s"], cur.key[grp]["g1_sx"])
        if not hc.same_ratio(cv, cur.key[grp]["g1_s"], cur.key[grp]["g1_sx"],
                             cur.key[grp]["g2_sp"], cur.key[grp]["g2_spx"]):
            return err(f"INVALID key ({grp}) in challenge #{cur.id}")

    k = cur.key
    if not hc.same_ratio(cv, prev.tau_g1, cur.tau_g1,
                         k["tau"]["g2_sp"], k["tau"]["g2_spx"]):
        return err(f"INVALID tau*G1. challenge #{cur.id}")
    if not hc.same_ratio(cv, k["tau"]["g1_s"], k["tau"]["g1_sx"],
                         prev.tau_g2, cur.tau_g2):
        return err(f"INVALID tau*G2. challenge #{cur.id}")
    if not hc.same_ratio(cv, prev.alpha_g1, cur.alpha_g1,
                         k["alpha"]["g2_sp"], k["alpha"]["g2_spx"]):
        return err(f"INVALID alpha*G1. challenge #{cur.id}")
    if not hc.same_ratio(cv, prev.beta_g1, cur.beta_g1,
                         k["beta"]["g2_sp"], k["beta"]["g2_spx"]):
        return err(f"INVALID beta*G1. challenge #{cur.id}")
    if not hc.same_ratio(cv, k["beta"]["g1_s"], k["beta"]["g1_sx"],
                         prev.beta_g2, cur.beta_g2):
        return err(f"INVALID beta*G2. challenge #{cur.id}")
    return True


def _section_points(cv, pt: PtauFile, sid: int, g2: bool, n: int):
    conv = pcodec.g2_lem_to_ints if g2 else pcodec.g1_lem_to_ints
    return conv(cv.fq, pt.sections[sid], n)


def _msm_lem(cv, lem: bytes, scalars: list[int], g2: bool):
    """MSM over a LEM point slice (device Pippenger; host bigint loop for
    tiny inputs where an XLA compile would dominate)."""
    import jax.numpy as jnp

    fq, fr = cv.fq, cv.fr
    n = len(scalars)
    if n == 0:
        return None
    if n <= _HOST_MAX:
        conv = pcodec.g2_lem_to_ints if g2 else pcodec.g1_lem_to_ints
        pts = conv(fq, lem, n)
        acc = None
        for P, k in zip(pts, scalars):
            if P is None or k == 0:
                continue
            Q = _g_mul(cv, g2, P, k)
            acc = Q if acc is None else _g_add(cv, g2, acc, Q)
        return acc  # affine ints (or None), same as the device-path finish
    fqctx = fjnp.get_ctx(fq.name)
    m = msm_mod.MSMContext(fqctx, fq, extension=2 if g2 else 1)
    if g2:
        x, y, inf = pcodec.g2_lem_from_bytes(fq, lem, n)
        px = tuple(jnp.asarray(c) for c in x)
        py = tuple(jnp.asarray(c) for c in y)
    else:
        x, y, inf = pcodec.g1_lem_from_bytes(fq, lem, n)
        px, py = jnp.asarray(x), jnp.asarray(y)
    sc = jnp.asarray(fjnp.np_from_ints(fr, scalars))
    res = m.run(px, py, jnp.asarray(inf), sc, c=8, nbits=32,
                R=min(256, max(1, n // 4)))
    return msm_mod.host_jac_to_affine(fq, res, 2 if g2 else 1)


def _g_add(cv, g2, P, Q):
    return hc.g2_add(cv, P, Q) if g2 else hc.g1_add(cv, P, Q)


def _g_mul(cv, g2, P, k):
    return hc.g2_mul_any(cv, P, k) if g2 else hc.g1_mul(cv, P, k)


def _g_neg(cv, g2, P):
    return hc.g2_neg(cv, P) if g2 else hc.g1_neg(cv, P)


def verify(pt: PtauFile, logger=None, rng: "np.random.Generator" = None) -> bool:
    """Full ceremony verification (src/powersoftau_verify.js:129-289)."""
    cv = pt.curve
    power = pt.power

    def err(msg):
        if logger:
            logger.error(msg)
        return False

    if not pt.contributions:
        return err("This file has no contribution! "
                   "It cannot be used in production")

    initial = _initial_contribution(cv, pt.ceremony_power)
    cur = pt.contributions[-1]
    prev = pt.contributions[-2] if len(pt.contributions) > 1 else initial
    if not _verify_contribution(cv, cur, prev, logger):
        return False

    if rng is None:
        rng = np.random.default_rng(secrets.randbits(64))

    resp_h = Blake2b.from_partial(cur.partial_hash)
    resp_h.update(pubkey_to_bytes(cv, cur.key, montgomery=False))
    next_h = Blake2b(64)
    next_h.update(resp_h.digest())

    # random-linear-combination section consistency scan (:340-396):
    # R1 = sum r_i P_i (i<n-1), R2 = sum r_i P_{i+1}; then
    # sameRatio(R1, R2, G2, tauG2) proves P_{i+1} = tau P_i for all i.
    results = {}
    fq = cv.fq
    for sid, g2, n, name in _sections(power):
        if sid == 6:
            next_h.update(lem_to_u(cv, pt.sections[sid], 1, True))
            results[6] = _section_points(cv, pt, 6, True, 1)[0]
            continue
        next_h.update(lem_to_u(cv, pt.sections[sid], n, g2))
        scalars = [int(x) for x in rng.integers(0, 1 << 32, n - 1,
                                                dtype=np.uint64)]
        sz = (4 if g2 else 2) * fq.n8
        R1 = _msm_lem(cv, pt.sections[sid][:(n - 1) * sz], scalars, g2)
        R2 = _msm_lem(cv, pt.sections[sid][sz:], scalars, g2)
        pts01 = _section_points(cv, pt, sid, g2, min(2, n))
        results[sid] = (R1, R2, pts01)

    rt1_r1, rt1_r2, tau1_pts = results[2]
    if not hc.same_ratio(cv, rt1_r1, rt1_r2, cv.g2, cur.tau_g2):
        return err("tauG1 section. Powers do not match")
    if tau1_pts[0] != cv.g1:
        return err("First element of tau*G1 section must be the generator")
    if tau1_pts[1] != cur.tau_g1:
        return err("Second element of tau*G1 section does not match the "
                   "one in the contribution section")

    rt2_r1, rt2_r2, tau2_pts = results[3]
    if not hc.same_ratio(cv, cv.g1, cur.tau_g1, rt2_r1, rt2_r2):
        return err("tauG2 section. Powers do not match")
    if tau2_pts[0] != cv.g2:
        return err("First element of tau*G2 section must be the generator")
    if tau2_pts[1] != cur.tau_g2:
        return err("Second element of tau*G2 section does not match the "
                   "one in the contribution section")

    ra_r1, ra_r2, a_pts = results[4]
    if not hc.same_ratio(cv, ra_r1, ra_r2, cv.g2, cur.tau_g2):
        return err("alphaTauG1 section. Powers do not match")
    if a_pts[0] != cur.alpha_g1:
        return err("First element of alpha*tau*G1 section (alpha*G1) does "
                   "not match the one in the contribution section")

    rb_r1, rb_r2, b_pts = results[5]
    if not hc.same_ratio(cv, rb_r1, rb_r2, cv.g2, cur.tau_g2):
        return err("betaTauG1 section. Powers do not match")
    if b_pts[0] != cur.beta_g1:
        return err("First element of beta*tau*G1 section (beta*G1) does "
                   "not match the one in the contribution section")

    if results[6] != cur.beta_g2:
        return err("betaG2 element in betaG2 section does not match the "
                   "one in the contribution section")

    if power == pt.ceremony_power:
        if next_h.digest() != cur.next_challenge:
            return err("Hash of the values does not match the next "
                       "challenge of the last contributor")

    # verify the remaining contribution chain
    for i in range(len(pt.contributions) - 2, -1, -1):
        c = pt.contributions[i]
        p = pt.contributions[i - 1] if i > 0 else initial
        if not _verify_contribution(cv, c, p, logger):
            return False

    # phase-2 Lagrange sections (:398-491)
    if all(sid in pt.sections for sid in (12, 13, 14, 15)):
        for tau_sid, lag_sid, g2, name in ((2, 12, False, "tauG1"),
                                           (3, 13, True, "tauG2"),
                                           (4, 14, False, "alphaTauG1"),
                                           (5, 15, False, "betaTauG1")):
            if not _verify_lagrange(cv, pt, tau_sid, lag_sid, g2, rng,
                                    logger):
                return err(f"Phase2 calculation does not match with powers "
                           f"of tau ({name})")
    elif logger:
        logger.warn("this file does not contain phase2 precalculated "
                    "values. Please run preparephase2.")
    return True


def _verify_lagrange(cv, pt, tau_sid, lag_sid, g2, rng, logger=None) -> bool:
    """resTau == resLagrange via random-vector FFT (verify.js:398-491)."""
    from ..ntt import ntt as nttmod
    import jax.numpy as jnp

    fq, fr = cv.fq, cv.fr
    frctx = fjnp.get_ctx(fr.name)
    sz = (4 if g2 else 2) * fq.n8
    max_p = pt.power + (1 if tau_sid == 2 else 0)
    for p in range(0, max_p + 1):
        n = 1 << p
        rs = [int(x) for x in rng.integers(0, 1 << 32, n, dtype=np.uint64)]
        if p == pt.power + 1:
            rs[n - 1] = 0
            tau_lem = (bytes(pt.sections[tau_sid][:(n - 1) * sz])
                       + b"\0" * sz)
        else:
            tau_lem = pt.sections[tau_sid][:n * sz]
        res_tau = _msm_lem(cv, tau_lem, rs, g2)

        # fft of the random vector (plain->Montgomery->fft->plain)
        sc = fjnp.np_from_ints(fr, rs)
        scm = fjnp.to_mont(frctx, jnp.asarray(sc))
        ev = fjnp.from_mont(frctx, nttmod.ntt(frctx, scm))
        ev_ints = fjnp.np_to_ints(fr, np.asarray(ev))

        off = (n - 1) * sz
        lag_lem = pt.sections[lag_sid][off:off + n * sz]
        res_lag = _msm_lem(cv, lag_lem, ev_ints, g2)
        if res_tau != res_lag:
            return False
    return True


# ---------------------------------------------------------------------------
# preparePhase2: group-element inverse NTT per power (the flagship multi-chip
# benchmark op — sharded version in snarkjs_tpu.parallel.sharded)

@functools.lru_cache(maxsize=None)
def _group_intt_fn(fq_name: str, fr_name: str, ext: int, k: int):
    """Jitted radix-2 group IFFT of size 2^k (jacobian in/out).

    Butterfly: (a, b) -> (a + w^j b, a - w^j b) where w^j b is a per-lane
    scalar multiplication by the stage twiddle (inverse root powers), with
    the 1/n normalization folded in up front — the group-element analogue
    of the Fr NTT in snarkjs_tpu.ntt (ffjavascript G.ifft /
    lagrangeEvaluations, reference src/powersoftau_preparephase2.js:87).

    Compile-friendliness is the design driver (the suite runs this on XLA
    CPU, where program size is the wall-clock): ALL k stages run one
    fori_loop over a single stage body — butterfly lane indices are
    iota/bit arithmetic on the traced stage number, and twiddle scalars
    come from a factored root-power ladder (A Montgomery x B plain -> one
    Fr multiply), so the program holds one scalar-mul scan + two jac_adds
    regardless of k, and no O(n log n) constant tables are embedded.
    """
    import jax
    import jax.numpy as jnp
    from ..ntt.ntt import bit_reverse_perm

    fqctx = fjnp.get_ctx(fq_name)
    frctx = fjnp.get_ctx(fr_name)
    fr = frctx.fp
    f = FqOps(fqctx) if ext == 1 else Fq2Ops(fqctx)
    nbits = fr.p.bit_length()
    n = 1 << k
    h = n // 2

    root = fr.winv[k]
    # factored ladder of root powers covering exponents [0, h):
    # root^e = A[e & (s1-1)] * B[e >> log_s1];  A Montgomery, B plain, so
    # one mont_mul yields the PLAIN scalar value (limbs) per lane.
    log_s1 = (max(k - 1, 1) + 1) // 2
    s1 = 1 << log_s1
    n_b = -(-max(h, 1) // s1)
    A_tab = np.stack([fjnp.np_from_int(fr, fr.to_mont(pow(root, t, fr.p)))
                      for t in range(s1)], axis=-1)
    B_tab = np.stack([fjnp.np_from_int(fr, pow(root, s1 * u, fr.p))
                      for u in range(n_b)], axis=-1)
    ninv = pow(n, fr.p - 2, fr.p)
    ninv_bits = np.asarray(
        np.tile(_bits_of_ints([ninv], nbits), (1, h)), dtype=np.uint32)

    perm = bit_reverse_perm(k)

    @jax.jit
    def fn(px, py, pinf):
        P = jac.from_affine(f, f.gather(px, perm), f.gather(py, perm),
                            pinf[perm])
        # 1/n normalization first (linear, commutes with the butterflies);
        # two h-wide halves so the scalar-mul scan shape matches the stage
        # body's and XLA compiles the body once.
        nb = jnp.asarray(ninv_bits)
        halves = [jac.batch_scalar_mul(
            f, jax.tree.map(lambda a: a[..., sl], P), nb)
            for sl in (slice(0, h), slice(h, n))]
        P = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=-1),
                         halves[0], halves[1])

        At = jnp.asarray(A_tab)
        Bt = jnp.asarray(B_tab)
        j = jnp.arange(h, dtype=jnp.int32)
        q = jnp.arange(n, dtype=jnp.int32)

        def stage(i, P):
            # stage s = i+1: blocks of 2m with m = 2^i
            off = j & ((1 << i) - 1)
            lo_idx = ((j >> i) << (i + 1)) | off
            hi_idx = lo_idx + (1 << i)
            # twiddle scalar w_s^off = root^(off << (k-1-i))
            e = off << (k - 1 - i)
            tw = fjnp.mont_mul(frctx, At[:, e & (s1 - 1)], Bt[:, e >> log_s1])
            bits = jac.scalar_bits_from_limbs(tw, nbits)
            lo = jax.tree.map(lambda a: a[..., lo_idx], P)
            hi = jax.tree.map(lambda a: a[..., hi_idx], P)
            t = jac.batch_scalar_mul(f, hi, bits)
            top = jac.jac_add(f, lo, t)
            bot = jac.jac_add(f, lo, jac.jac_neg(f, t))
            cat = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=-1),
                               top, bot)
            # scatter back: output position q holds pair j(q), top if the
            # 2^i bit of q is clear else bot
            jq = ((q >> (i + 1)) << i) | (q & ((1 << i) - 1))
            cat_idx = jq + h * ((q >> i) & 1)
            return jax.tree.map(lambda a: a[..., cat_idx], cat)

        P = jax.lax.fori_loop(0, k, stage, P)
        return jac.to_affine_batch(f, P, f.batch_inv)

    return fn


def _bits_of_ints(vals, nbits):
    """list of ints -> (nbits, len) 0/1 array, MSB first."""
    out = np.zeros((nbits, len(vals)), dtype=np.uint32)
    for j, v in enumerate(vals):
        for i in range(nbits):
            out[nbits - 1 - i, j] = (v >> i) & 1
    return out


def host_group_ifft(cv, g2: bool, pts, k: int):
    """Radix-2 group IFFT on host bigint affine points (None = infinity).

    O(n log n) reference oracle for the device path and the small-size
    fast path (an XLA compile costs far more than bigint math at n <= a
    few hundred)."""
    fr = cv.fr
    n = 1 << k
    assert len(pts) == n
    # bit-reverse copy
    out = [pts[int(format(i, f"0{k}b")[::-1], 2)] for i in range(n)] \
        if k else list(pts)
    root = fr.winv[k]
    for s in range(1, k + 1):
        m = 1 << (s - 1)
        ws = pow(root, 1 << (k - s), fr.p)
        wj = 1
        for j in range(m):
            for b in range(0, n, 2 * m):
                lo, hi = out[b + j], out[b + j + m]
                t = None if hi is None else _g_mul(cv, g2, hi, wj)
                tn = None if t is None else _g_neg(cv, g2, t)
                out[b + j] = _g_add(cv, g2, lo, t)
                out[b + j + m] = _g_add(cv, g2, lo, tn)
            wj = wj * ws % fr.p
    ninv = pow(n, fr.p - 2, fr.p)
    return [None if P is None else _g_mul(cv, g2, P, ninv) for P in out]


def _host_ifft_threshold() -> int:
    """Below this size the host bigint IFFT beats spinning up a compile;
    XLA CPU (the test backend) compiles the group-NTT program in ~a
    minute, so the cutover is much higher there."""
    import jax

    return 16 if jax.default_backend() == "tpu" else 256


def group_lagrange_lem(cv, lem: bytes, n: int, g2: bool,
                       force_device: bool = False, mesh=None) -> bytes:
    """G.lagrangeEvaluations on a LEM slice: group IFFT -> Lagrange-basis
    points [L_j(tau) G]_j (device).

    mesh: jax.sharding.Mesh with axis 'd' — runs the four-step sharded
    group NTT (parallel.sharded.group_intt_sharded) when the size is
    mesh-divisible; the north-star power-24 preparePhase2 config."""
    fq, fr = cv.fq, cv.fr
    k = n.bit_length() - 1
    assert 1 << k == n
    if n == 1:
        return lem[: (4 if g2 else 2) * fq.n8]
    if mesh is not None and n >= (4 * mesh.shape["d"]) ** 2:
        import jax
        import jax.numpy as jnp

        from ..parallel import sharded

        if g2:
            x, y, inf = pcodec.g2_lem_from_bytes(fq, lem, n)
        else:
            x, y, inf = pcodec.g1_lem_from_bytes(fq, lem, n)
        jj = lambda a: jax.tree.map(jnp.asarray, a)
        ox, oy, oinf = sharded.group_intt_sharded(
            mesh, cv, g2, jj(x), jj(y), jnp.asarray(inf))
        if g2:
            return pcodec.g2_lem_to_bytes(
                fq, tuple(np.asarray(c) for c in ox),
                tuple(np.asarray(c) for c in oy), np.asarray(oinf))
        return pcodec.g1_lem_to_bytes(fq, np.asarray(ox), np.asarray(oy),
                                      np.asarray(oinf))
    if n <= _host_ifft_threshold() and not force_device:
        conv_in = pcodec.g2_lem_to_ints if g2 else pcodec.g1_lem_to_ints
        conv_out = pcodec.g2_lem_from_ints if g2 else pcodec.g1_lem_from_ints
        pts = conv_in(fq, lem, n)
        return conv_out(fq, host_group_ifft(cv, g2, pts, k))
    fn = _group_intt_fn(fq.name, fr.name, 2 if g2 else 1, k)
    if g2:
        x, y, inf = pcodec.g2_lem_from_bytes(fq, lem, n)
        ox, oy, oinf = fn(x, y, inf)
        return pcodec.g2_lem_to_bytes(
            fq, tuple(np.asarray(c) for c in ox),
            tuple(np.asarray(c) for c in oy), np.asarray(oinf))
    x, y, inf = pcodec.g1_lem_from_bytes(fq, lem, n)
    ox, oy, oinf = fn(x, y, inf)
    return pcodec.g1_lem_to_bytes(fq, np.asarray(ox), np.asarray(oy),
                                  np.asarray(oinf))


def prepare_phase2(pt: PtauFile, logger=None, mesh=None) -> PtauFile:
    """Append Lagrange sections 12-15 (src/powersoftau_preparephase2.js).

    mesh: optional jax.sharding.Mesh with axis 'd' — large powers run the
    four-step sharded group NTT across the mesh (SURVEY 3.4 north star)."""
    cv = pt.curve
    fq = cv.fq
    new = PtauFile(cv, pt.power, pt.ceremony_power,
                   sections=dict(pt.sections),
                   contributions=list(pt.contributions))
    for old_sid, new_sid, g2, name in ((2, 12, False, "tauG1"),
                                       (3, 13, True, "tauG2"),
                                       (4, 14, False, "alphaTauG1"),
                                       (5, 15, False, "betaTauG1")):
        sz = (4 if g2 else 2) * fq.n8
        out = SpooledOut()   # spills past the threshold: bounded RSS
        max_p = pt.power + (1 if old_sid == 2 else 0)
        for p in range(0, max_p + 1):
            if logger:
                logger.debug(f"lagrange {name} power {p}")
            n = 1 << p
            if p == pt.power + 1:
                lem = bytes(pt.sections[old_sid][:(n - 1) * sz]) + b"\0" * sz
            else:
                lem = pt.sections[old_sid][:n * sz]
            out.write(group_lagrange_lem(cv, lem, n, g2, mesh=mesh))
        new.sections[new_sid] = out.finish()
    return new


def truncate(pt: PtauFile, p: int) -> PtauFile:
    """One truncated power-p file (src/powersoftau_truncate.js:41-58)."""
    cv = pt.curve
    fq = cv.fq
    s_g1, s_g2 = 2 * fq.n8, 4 * fq.n8
    n = 1 << p
    new = PtauFile(cv, p, pt.ceremony_power,
                   contributions=list(pt.contributions))
    new.sections[2] = pt.sections[2][: (2 * n - 1) * s_g1]
    new.sections[3] = pt.sections[3][: n * s_g2]
    new.sections[4] = pt.sections[4][: n * s_g1]
    new.sections[5] = pt.sections[5][: n * s_g1]
    new.sections[6] = pt.sections[6][:s_g2]
    if 12 in pt.sections:
        new.sections[12] = pt.sections[12][: (2 ** (p + 1) * 2 - 1) * s_g1]
        new.sections[13] = pt.sections[13][: (2 * n - 1) * s_g2]
        new.sections[14] = pt.sections[14][: (2 * n - 1) * s_g1]
        new.sections[15] = pt.sections[15][: (2 * n - 1) * s_g1]
    return new


def convert(pt: PtauFile, logger=None) -> PtauFile:
    """Recompute section 12 only (src/powersoftau_convert.js)."""
    cv = pt.curve
    fq = cv.fq
    new = PtauFile(cv, pt.power, pt.ceremony_power,
                   sections=dict(pt.sections),
                   contributions=list(pt.contributions))
    sz = 2 * fq.n8
    out = bytearray()
    for p in range(0, pt.power + 2):
        n = 1 << p
        if p == pt.power + 1:
            lem = bytes(pt.sections[2][:(n - 1) * sz]) + b"\0" * sz
        else:
            lem = pt.sections[2][:n * sz]
        out += group_lagrange_lem(cv, lem, n, False)
    new.sections[12] = bytes(out)
    return new


def export_json(pt: PtauFile) -> dict:
    """JSON dump of all sections (src/powersoftau_export_json.js)."""
    cv = pt.curve
    fq = cv.fq

    def g1s(lem, n):
        return [[str(p[0]), str(p[1]), "1"] if p else ["0", "1", "0"]
                for p in pcodec.g1_lem_to_ints(fq, lem, n)]

    def g2s(lem, n):
        return [[[str(p[0][0]), str(p[0][1])], [str(p[1][0]), str(p[1][1])],
                 ["1", "0"]] if p else [["0", "0"], ["1", "0"], ["0", "0"]]
                for p in pcodec.g2_lem_to_ints(fq, lem, n)]

    n = 1 << pt.power
    out = {
        "power": pt.power,
        "ceremonyPower": pt.ceremony_power,
        "tauG1": g1s(pt.sections[2], 2 * n - 1),
        "tauG2": g2s(pt.sections[3], n),
        "alphaTauG1": g1s(pt.sections[4], n),
        "betaTauG1": g1s(pt.sections[5], n),
        "betaG2": g2s(pt.sections[6], 1),
    }
    for sid, key, g2 in ((12, "lTauG1", False), (13, "lTauG2", True),
                         (14, "lAlphaTauG1", False), (15, "lBetaTauG1", False)):
        if sid not in pt.sections:
            continue
        conv = g2s if g2 else g1s
        sz = (4 if g2 else 2) * fq.n8
        lst, off = [], 0
        max_p = pt.power + (1 if sid == 12 else 0)
        for p in range(0, max_p + 1):
            m = 1 << p
            lst.append(conv(pt.sections[sid][off:off + m * sz], m))
            off += m * sz
        out[key] = lst
    return out
