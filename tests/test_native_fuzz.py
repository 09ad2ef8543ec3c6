"""Native parser robustness: corrupt and truncated record streams must
fail cleanly (ValueError / skipped records), never crash the process or
grow memory without bound. Runs in a subprocess with an address-space
rlimit so a regression shows up as a failure, not an OOM'd test runner."""

import os
import subprocess
import sys

import pytest

from bs_call_tpu.native import load

pytestmark = pytest.mark.skipif(
    load() is None, reason="native toolchain unavailable"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import sys, resource, ctypes, tempfile, pathlib
import numpy as np
resource.setrlimit(resource.RLIMIT_AS, (6 << 30, 6 << 30))
sys.path.insert(0, %(repo)r)
from bs_call_tpu.config import CallerConfig
from bs_call_tpu.native.pipeline import NativePushPipeline
from bs_call_tpu.io.bam import BamHeader, BamWriter, BamReader, \
    encode_bam_record

d = pathlib.Path(tempfile.mkdtemp())
SEQ = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
hdr = BamHeader(
    text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:40\n",
    ref_names=["chr1"], ref_lens=[40],
)
w = BamWriter(str(d / "in.bam"), hdr)
for n, pos in enumerate(range(0, 28)):
    w.write(f"r{n}", 0, 0, pos, 60, [(12, 0)], -1, -1, 0,
            SEQ[pos:pos + 12], np.full(12, 40, np.uint8))
w.close()
blob = b"".join(encode_bam_record(r) for r in BamReader(str(d / "in.bam")))
cfg = CallerConfig()
rng = np.random.default_rng(%(seed)d)

def run_bytes(b):
    p = NativePushPipeline(lambda: iter(()), hdr, cfg, np.ones(1, np.int8))
    p._lib.bsp_push(ctypes.c_void_p(p._h), bytes(b),
                    ctypes.c_int64(len(b)))
    p._lib.bsp_push_eof(ctypes.c_void_p(p._h))
    try:
        while p.next_block() is not None:
            pass
    except ValueError:
        pass
    p.close()

for trial in range(150):
    b = bytearray(blob)
    for _ in range(int(rng.integers(1, 5))):
        b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
    run_bytes(b)
for cut in range(0, len(blob), 11):
    run_bytes(blob[:cut])
print("fuzz ok")
"""


@pytest.mark.parametrize("seed", [0, 7])
def test_corrupt_and_truncated_streams(seed):
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": REPO, "seed": seed}],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, (res.stdout + res.stderr)[-2000:]
    assert "fuzz ok" in res.stdout


def test_sorted_input_enforced(tmp_path):
    """A backwards position jump (corruption / unsorted input) raises a
    clean error instead of growing the open block unboundedly."""
    import ctypes

    import numpy as np

    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.io.bam import BamHeader, encode_bam_record, BamRec
    from bs_call_tpu.native.pipeline import NativePushPipeline

    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:1000\n",
        ref_names=["chr1"], ref_lens=[1000],
    )

    def rec(pos):
        return BamRec(
            name=f"x{pos}", flag=0, tid=0, pos=pos, mapq=60,
            cigar=[(10, 0)], mtid=-1, mpos=-1, isize=0,
            seq_code=np.ones(10, np.uint8),
            qual=np.full(10, 40, np.uint8), aux=b"", l_qseq=10,
        )

    blob = b"".join(
        encode_bam_record(rec(p)) for p in (100, 500, 120)
    )  # 120 < 500: unsorted
    p = NativePushPipeline(
        lambda: iter(()), hdr, CallerConfig(), np.ones(1, np.int8)
    )
    p._lib.bsp_push(
        ctypes.c_void_p(p._h), blob, ctypes.c_int64(len(blob))
    )
    p._lib.bsp_push_eof(ctypes.c_void_p(p._h))
    with pytest.raises(ValueError):
        while p.next_block() is not None:
            pass
    p.close()


SAM_SCRIPT = r"""
import sys, resource, ctypes
import numpy as np
resource.setrlimit(resource.RLIMIT_AS, (6 << 30, 6 << 30))
sys.path.insert(0, %(repo)r)
from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader
from bs_call_tpu.native.pipeline import NativePushPipeline

hdr = BamHeader(
    text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:4000\n",
    ref_names=["chr1"], ref_lens=[4000],
)
rng = np.random.default_rng(%(seed)d)
seq = "".join(rng.choice(list("ACGT"), 4000))
lines = []
pos = 1
for i in range(200):
    pos += int(rng.integers(0, 20))
    q = "".join(chr(int(v) + 33) for v in rng.integers(20, 41, 30))
    lines.append(
        f"r{i}\t0\tchr1\t{pos}\t60\t30M\t*\t0\t0\t"
        f"{seq[pos - 1:pos + 29]}\t{q}\tXB:A:C"
    )
sam = "\n".join(lines).encode() + b"\n"
names = b"chr1\x00"

def run_bytes(b):
    p = NativePushPipeline(
        lambda: iter(()), hdr, CallerConfig(), np.ones(1, np.int8)
    )
    p._lib.bsp_set_sam_mode(ctypes.c_void_p(p._h), names, len(names))
    p._lib.bsp_push(ctypes.c_void_p(p._h), bytes(b),
                    ctypes.c_int64(len(b)))
    p._lib.bsp_push_eof(ctypes.c_void_p(p._h))
    try:
        while p.next_block() is not None:
            pass
    except ValueError:
        pass
    p.close()

for trial in range(150):
    b = bytearray(sam)
    for _ in range(int(rng.integers(1, 6))):
        b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
    run_bytes(b)
for cut in range(0, len(sam), 41):
    run_bytes(sam[:cut])
for trial in range(20):
    run_bytes(rng.integers(0, 256, int(rng.integers(10, 5000)))
              .astype(np.uint8).tobytes())
print("sam fuzz ok")
"""


@pytest.mark.parametrize("seed", [1, 11])
def test_sam_text_fuzz(seed):
    res = subprocess.run(
        [sys.executable, "-c", SAM_SCRIPT % {"repo": REPO, "seed": seed}],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, (res.stdout + res.stderr)[-2000:]
    assert "sam fuzz ok" in res.stdout


def test_cram_native_decoder_fuzz(tmp_path):
    """Corrupt/truncated comp-header, core, and external blocks through
    bsc_cram_decode_slice must return a clean error code, never crash
    (parse_codec cursor jumps and negative ref positions were crashers)."""
    import ctypes

    import numpy as np

    from test_cram_foreign import _fixture
    from bs_call_tpu.io.cram import (
        CT_CORE,
        CT_EXTERNAL,
        CT_SLICE_HEADER,
        CramReader,
        read_itf8,
        read_ltf8,
    )
    from bs_call_tpu.native import load as _load

    lib = _load()
    ref, path = _fixture(tmp_path, n=150, seed=3)
    r = CramReader(path, reference=ref)
    blocks, meta = r._read_container()
    while meta["n_records"] == 0:
        blocks, meta = r._read_container()
    ch_raw = blocks[0].data
    i = 1
    while blocks[i].content_type != CT_SLICE_HEADER:
        i += 1
    sh = blocks[i].data
    off = 0
    s_ref, off = read_itf8(sh, off)
    s_start, off = read_itf8(sh, off)
    _sp, off = read_itf8(sh, off)
    s_nrec, off = read_itf8(sh, off)
    _c, off = read_ltf8(sh, off)
    s_nblocks, off = read_itf8(sh, off)
    core = b""
    ids, datas = [], []
    for b in blocks[i + 1 : i + 1 + s_nblocks]:
        if b.content_type == CT_CORE:
            core = b.data
        elif b.content_type == CT_EXTERNAL:
            ids.append(b.content_id)
            datas.append(b.data)
    rng = np.random.default_rng(0)
    rc_codes = np.zeros(10000, dtype=np.uint8)
    out_cap = 1 << 22
    out = ctypes.create_string_buffer(out_cap)

    def call(ch, cr, dat):
        blob = b"".join(dat)
        offs = np.zeros(len(ids) + 1, np.int64)
        offs[1:] = np.cumsum([len(x) for x in dat])
        ids_a = np.ascontiguousarray(ids, np.int32)
        return lib.bsc_cram_decode_slice(
            ch, len(ch), cr, len(cr), len(ids), ids_a.ctypes.data,
            offs.ctypes.data, blob, s_ref, s_start, s_nrec,
            rc_codes.ctypes.data, len(rc_codes), out, out_cap,
        )

    assert call(ch_raw, core, datas) > 0
    for which in range(3 + len(datas)):
        for _t in range(60):
            ch, cr, dat = ch_raw, core, list(datas)
            if which == 0 and ch_raw:
                b = bytearray(ch_raw)
                b[int(rng.integers(0, len(b)))] = int(rng.integers(256))
                ch = bytes(b)
            elif which == 1 and core:
                b = bytearray(core)
                b[int(rng.integers(0, len(b)))] = int(rng.integers(256))
                cr = bytes(b)
            elif which == 2:
                ch = ch_raw[: int(rng.integers(0, len(ch_raw)))]
            else:
                k = which - 3
                if not datas[k]:
                    continue
                b = bytearray(datas[k])
                b[int(rng.integers(0, len(b)))] = int(rng.integers(256))
                dat[k] = bytes(b)
            assert call(ch, cr, dat) >= -2
