"""iden3 binfile container: read/write.

Layout (reference: @iden3/binfileutils, inlined at
reference build/browser.esm.js:937-1067):

    magic:    4 ASCII bytes (file type, e.g. "zkey", "wtns", "ptau", "r1cs")
    version:  ULE32
    nSections:ULE32
    sections: nSections x { type: ULE32, size: ULE64, payload: size bytes }

Sections may appear in any order and a type may repeat; readers address them
by type id.  This implementation is host-side (numpy/bytes) — artifacts are
streamed section-by-section to the device by the protocol layers.
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass


@dataclass
class Section:
    pos: int
    size: int


class BinFile:
    """Random-access reader over bytes (memory-mapped files work too)."""

    def __init__(self, data, expected_type: str | None = None,
                 max_version: int = 2):
        self.data = data
        magic = bytes(data[0:4])
        if expected_type is not None and magic != expected_type.encode():
            raise ValueError(
                f"invalid file magic {magic!r}, expected {expected_type!r}")
        self.ftype = magic.decode("latin1")
        self.version = struct.unpack_from("<I", data, 4)[0]
        if self.version > max_version:
            raise ValueError(f"version {self.version} not supported")
        n_sections = struct.unpack_from("<I", data, 8)[0]
        self.sections: dict[int, list[Section]] = {}
        pos = 12
        for _ in range(n_sections):
            stype = struct.unpack_from("<I", data, pos)[0]
            ssize = struct.unpack_from("<Q", data, pos + 4)[0]
            pos += 12
            self.sections.setdefault(stype, []).append(Section(pos, ssize))
            pos += ssize

    @classmethod
    def load(cls, path: str, expected_type: str | None = None,
             max_version: int = 2) -> "BinFile":
        """Memory-map the file: reading a 97 GB power-28 ptau costs page
        cache, not RSS (the reference's fastfile streaming analogue)."""
        import mmap

        f = open(path, "rb")
        try:
            data = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        except (ValueError, OSError):
            data = f.read()       # empty or unmappable file
            f.close()
            return cls(data, expected_type, max_version)
        bf = cls(data, expected_type, max_version)
        bf._file = f              # keep the fd alive with the mapping
        return bf

    def view_section(self, stype: int, idx: int = 0):
        """Zero-copy view of a section payload."""
        s = self.section(stype, idx)
        return memoryview(self.data)[s.pos:s.pos + s.size]

    def section(self, stype: int, idx: int = 0) -> Section:
        if stype not in self.sections or idx >= len(self.sections[stype]):
            raise KeyError(f"section {stype}[{idx}] missing")
        return self.sections[stype][idx]

    def read_section(self, stype: int, idx: int = 0) -> bytes:
        s = self.section(stype, idx)
        return bytes(self.data[s.pos : s.pos + s.size])

    def reader(self, stype: int, idx: int = 0) -> "SectionReader":
        s = self.section(stype, idx)
        return SectionReader(self.data, s.pos, s.size)


class SectionReader:
    def __init__(self, data, pos, size):
        self.data = data
        self.pos = pos
        self.end = pos + size

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.data, self.pos)[0]
        self.pos += 4
        return v

    def u64(self) -> int:
        v = struct.unpack_from("<Q", self.data, self.pos)[0]
        self.pos += 8
        return v

    def big(self, n8: int) -> int:
        v = int.from_bytes(self.data[self.pos : self.pos + n8], "little")
        self.pos += n8
        return v

    def raw(self, n: int) -> bytes:
        v = bytes(self.data[self.pos : self.pos + n])
        self.pos += n
        return v

    def remaining(self) -> int:
        return self.end - self.pos


class BinFileWriter:
    def __init__(self, ftype: str, version: int = 1):
        self.ftype = ftype
        self.version = version
        self.chunks: list[tuple[int, bytes]] = []

    def add_section(self, stype: int, payload: bytes):
        self.chunks.append((stype, bytes(payload)))

    def tobytes(self) -> bytes:
        out = io.BytesIO()
        out.write(self.ftype.encode()[:4].ljust(4, b"\0"))
        out.write(struct.pack("<I", self.version))
        out.write(struct.pack("<I", len(self.chunks)))
        for stype, payload in self.chunks:
            out.write(struct.pack("<I", stype))
            out.write(struct.pack("<Q", len(payload)))
            out.write(payload)
        return out.getvalue()

    def save(self, path: str):
        with open(path, "wb") as f:
            f.write(self.tobytes())


class SectionWriter:
    """Helper to build a section payload."""

    def __init__(self):
        self.buf = io.BytesIO()

    def u32(self, v: int):
        self.buf.write(struct.pack("<I", v))

    def u64(self, v: int):
        self.buf.write(struct.pack("<Q", v))

    def big(self, v: int, n8: int):
        self.buf.write(int(v).to_bytes(n8, "little"))

    def raw(self, b: bytes):
        self.buf.write(b)

    def tobytes(self) -> bytes:
        return self.buf.getvalue()
