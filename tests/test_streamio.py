"""Bounded-memory artifact writes (reference streams 2^16-element chunks
between files, src/mpc_applykey.js:30-47; binfileutils
startWriteSection/endWriteSection, build/browser.esm.js:983-1001)."""

import os
import resource

import numpy as np

from snarkjs_tpu.formats.binfile import (BinFile, BinFileWriter,
                                         StreamingBinFileWriter)
from snarkjs_tpu.utils.spool import SpooledOut


def _rss() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024


def test_streaming_writer_roundtrip(tmp_path):
    path = str(tmp_path / "s.bin")
    with StreamingBinFileWriter(path, "ptau", 1) as w:
        w.start_section(1)
        w.write(b"hello")
        w.end_section()
        w.start_section(9)
        for i in range(100):
            w.write(bytes([i % 256]) * 1000)
        w.end_section()
    bf = BinFile.load(path, "ptau")
    assert bf.read_section(1) == b"hello"
    s9 = bf.read_section(9)
    assert len(s9) == 100_000 and s9[:1000] == b"\0" * 1000


def test_spooled_sections_bounded_rss(tmp_path):
    """A multi-hundred-MB artifact written via SpooledOut sections +
    BinFileWriter.save must not grow peak RSS by the artifact size."""
    total = 384 * 1024 * 1024
    chunk = 4 * 1024 * 1024
    base = _rss()
    sp = SpooledOut(threshold=8 * 1024 * 1024)
    blk = np.random.default_rng(0).integers(
        0, 256, chunk, dtype=np.uint8).tobytes()
    for _ in range(total // chunk):
        sp.write(blk)
    payload = sp.finish()           # mmap view, reclaimable page cache
    assert len(payload) == total

    w = BinFileWriter("ptau", 1)
    w.add_section(1, b"\x01" * 16)
    w.add_section(2, payload)
    path = str(tmp_path / "big.ptau")
    w.save(path)

    grown = _rss() - base
    # the data passed through a small spool buffer + 16 MB write chunks;
    # allow generous slack for allocator noise but far below 384 MB
    assert grown < 128 * 1024 * 1024, f"RSS grew by {grown>>20} MiB"
    assert os.path.getsize(path) > total
    bf = BinFile.load(path, "ptau")
    assert bf.section(2).size == total
    assert bytes(bf.view_section(2)[:64]) == blk[:64]
