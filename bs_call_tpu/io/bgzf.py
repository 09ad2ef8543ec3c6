"""BGZF (blocked gzip) codec.

Self-contained replacement for htslib's bgzf layer: BGZF files are
concatenated gzip members, each at most 64 KiB of payload, carrying a BC
extra subfield with the compressed block size, terminated by a 28-byte EOF
block. Reading uses zlib directly per block; plain (non-blocked) gzip and
raw uncompressed streams are auto-detected.
"""

from __future__ import annotations

import gzip
import io
import struct
import zlib

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

_HEADER = struct.Struct("<BBBBIBBH")


def is_gzip(path: str) -> bool:
    with open(path, "rb") as f:
        magic = f.read(2)
    return magic == b"\x1f\x8b"


def is_bgzf(path: str) -> bool:
    with open(path, "rb") as f:
        head = f.read(18)
    if len(head) < 18 or head[:2] != b"\x1f\x8b":
        return False
    flg = head[3]
    if not flg & 4:  # FEXTRA
        return False
    xlen = struct.unpack_from("<H", head, 10)[0]
    # scan extra subfields for BC
    return xlen >= 6 and head[12:14] == b"BC"


def open_reader(path: str):
    """Open path for binary reading, transparently decompressing
    gzip/BGZF."""
    if is_gzip(path):
        return gzip.open(path, "rb")
    return open(path, "rb")


class BgzfWriter:
    """Streaming BGZF writer (used for .vcf.gz / BAM test fixtures).

    With threads > 1 (and the native library available), complete 64K
    payloads are batched and deflated in parallel by
    native/bsc_bgzf.cpp — the reference's htslib output thread pool
    (parse_args.c:196-211). Blocks are compressed independently at the
    same zlib level, so the output bytes are identical to the serial
    path."""

    # buffer this much before a native batch (64 payloads ≈ 4 MiB)
    _BATCH = 64 * 0xFF00

    def __init__(self, fileobj, level: int = 6, threads: int = 0):
        self._f = fileobj
        self._level = level
        self._buf = bytearray()
        self._closed = False
        self._native = None
        self._threads = max(1, int(threads or 0))
        if self._threads > 1:
            try:
                from bs_call_tpu.native import load

                self._native = load()
            except Exception:
                self._native = None

    def write(self, data: bytes) -> int:
        self._buf += data
        if self._native is not None:
            if len(self._buf) >= self._BATCH:
                self._drain_native()
            return len(data)
        while len(self._buf) >= 0xFF00:
            self._flush_block(self._buf[:0xFF00])
            del self._buf[:0xFF00]
        return len(data)

    def _drain_native(self):
        """Compress all complete 64K payloads in one parallel batch."""
        import ctypes

        import numpy as np

        nblk = len(self._buf) // 0xFF00
        if not nblk:
            return
        take = nblk * 0xFF00
        # copy out of the bytearray: a frombuffer view would block the
        # `del self._buf[:take]` resize below (exported buffer)
        src = np.frombuffer(bytes(self._buf[:take]), dtype=np.uint8)
        cap = nblk * (0xFF00 + 1050)
        out = np.empty(cap, dtype=np.uint8)
        w = self._native.bsc_bgzf_deflate_batch(
            src.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(take),
            ctypes.c_int(self._level),
            ctypes.c_int(self._threads),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(cap),
        )
        if w < 0:  # zlib error: fall back to the serial path for good
            self._native = None
            while len(self._buf) >= 0xFF00:
                self._flush_block(self._buf[:0xFF00])
                del self._buf[:0xFF00]
            return
        self._f.write(memoryview(out.data)[:w])
        del self._buf[:take]

    def _flush_block(self, payload: bytes):
        co = zlib.compressobj(self._level, zlib.DEFLATED, -15)
        comp = co.compress(bytes(payload)) + co.flush()
        crc = zlib.crc32(bytes(payload)) & 0xFFFFFFFF
        # BSIZE field = total block length - 1; block is
        # header(12) + extra(6) + comp + crc/isize(8)
        bsize = len(comp) + 26 - 1
        block = (
            _HEADER.pack(0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6)
            + b"BC"
            + struct.pack("<HH", 2, bsize)
            + comp
            + struct.pack("<II", crc, len(payload) & 0xFFFFFFFF)
        )
        self._f.write(block)

    def flush(self):
        if self._native is not None:
            self._drain_native()
        while len(self._buf) >= 0xFF00:
            self._flush_block(self._buf[:0xFF00])
            del self._buf[:0xFF00]
        if self._buf:
            self._flush_block(self._buf)
            self._buf.clear()

    def close(self):
        if self._closed:
            return
        self.flush()
        self._f.write(BGZF_EOF)
        self._f.flush()
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def bgzf_compress(data: bytes, level: int = 6) -> bytes:
    """One-shot BGZF compression including the EOF block."""
    out = io.BytesIO()
    w = BgzfWriter(out, level)
    w.write(data)
    w.close()
    return out.getvalue()
