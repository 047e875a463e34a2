"""Pure-Python BLAKE2b-512 with midstate export/import.

The ceremony stores a 216-byte blake2b midstate in every contribution record
(reference src/misc.js:89-127 toPartialHash/fromPartialHash over
@noble/hashes internals) so the response hash can be finished later with the
public key appended.  hashlib can't export state, so this implementation
mirrors the noble layout: 128-byte pending buffer + 8x64-bit h state split in
(lo,hi) u32 pairs + compressed-length + buffer-pos.

For bulk hashing use hashlib.blake2b (C speed) — this class is only required
where a midstate must be serialized or resumed.
"""

from __future__ import annotations

import struct

MASK64 = (1 << 64) - 1

IV = [
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
    0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
]

SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
]


def _rotr64(x, n):
    return ((x >> n) | (x << (64 - n))) & MASK64


class Blake2b:
    """Unkeyed blake2b, digest_size bytes (default 64)."""

    def __init__(self, digest_size: int = 64):
        self.digest_size = digest_size
        self.h = list(IV)
        self.h[0] ^= 0x01010000 ^ digest_size
        self.buf = bytearray(128)
        self.pos = 0          # bytes pending in buf
        self.length = 0       # total bytes absorbed (incl. pending)

    def _compress(self, block: bytes, t: int, last: bool):
        m = struct.unpack("<16Q", block)
        v = self.h + IV[:]
        v[12] ^= t & MASK64
        v[13] ^= (t >> 64) & MASK64
        if last:
            v[14] ^= MASK64

        def G(r, i, a, b, c, d):
            v[a] = (v[a] + v[b] + m[SIGMA[r][2 * i]]) & MASK64
            v[d] = _rotr64(v[d] ^ v[a], 32)
            v[c] = (v[c] + v[d]) & MASK64
            v[b] = _rotr64(v[b] ^ v[c], 24)
            v[a] = (v[a] + v[b] + m[SIGMA[r][2 * i + 1]]) & MASK64
            v[d] = _rotr64(v[d] ^ v[a], 16)
            v[c] = (v[c] + v[d]) & MASK64
            v[b] = _rotr64(v[b] ^ v[c], 63)

        for r in range(12):
            G(r, 0, 0, 4, 8, 12)
            G(r, 1, 1, 5, 9, 13)
            G(r, 2, 2, 6, 10, 14)
            G(r, 3, 3, 7, 11, 15)
            G(r, 4, 0, 5, 10, 15)
            G(r, 5, 1, 6, 11, 12)
            G(r, 6, 2, 7, 8, 13)
            G(r, 7, 3, 4, 9, 14)
        for i in range(8):
            self.h[i] ^= v[i] ^ v[i + 8]

    def update(self, data: bytes) -> "Blake2b":
        """noble-compatible absorb: a full buffer is only compressed once
        MORE input arrives (so a midstate exported on a 128-byte boundary
        keeps pos=128, matching @noble/hashes)."""
        data = bytes(data)
        off, n = 0, len(data)
        self.length += n
        while n > 0:
            if self.pos == 128:
                self._compress(bytes(self.buf), self.length_compressed() + 128,
                               False)
                self._n_compressed = self.length_compressed() + 128
                self.pos = 0
            take = min(128 - self.pos, n)
            self.buf[self.pos:self.pos + take] = data[off:off + take]
            self.pos += take
            off += take
            n -= take
        return self

    def length_compressed(self) -> int:
        return getattr(self, "_n_compressed", 0)

    def digest(self) -> bytes:
        h = Blake2b.__new__(Blake2b)
        h.digest_size = self.digest_size
        h.h = list(self.h)
        h.buf = bytearray(self.buf)
        h.pos = self.pos
        h.length = self.length
        h._n_compressed = self.length_compressed()
        block = bytes(h.buf[:h.pos]) + b"\0" * (128 - h.pos)
        h._compress(block, h._n_compressed + h.pos, True)
        out = struct.pack("<8Q", *h.h)
        return out[:h.digest_size]

    # ---- 216-byte midstate (reference src/misc.js:89-127 layout) ----

    def to_partial(self) -> bytes:
        out = bytearray(216)
        out[0:128] = self.buf
        u32 = []
        for i in range(8):
            u32.append(self.h[i] & 0xFFFFFFFF)
            u32.append((self.h[i] >> 32) & 0xFFFFFFFF)
        comp = self.length_compressed()
        u32 += [comp & 0xFFFFFFFF, (comp >> 32) & 0xFFFFFFFF,
                self.pos & 0xFFFFFFFF, 0]
        out[128:208] = struct.pack("<20I", *u32)
        return bytes(out)

    @classmethod
    def from_partial(cls, partial: bytes) -> "Blake2b":
        assert len(partial) >= 208
        h = cls()
        h.buf = bytearray(partial[0:128])
        u32 = struct.unpack("<20I", partial[128:208])
        h.h = [u32[2 * i] | (u32[2 * i + 1] << 32) for i in range(8)]
        comp = u32[16] | (u32[17] << 32)
        h.pos = u32[18]
        h._n_compressed = comp
        h.length = comp + h.pos
        return h
