"""Native CRAM slice decoder parity: the C++ decoder's raw-BAM blobs must
decode to exactly the records the Python CramReader yields, over
randomized paired/indel/clip/tag workloads and over foreign-remuxed codec
variants (VERDICT r1 item 4iv)."""

import struct

import numpy as np
import pytest

from bs_call_tpu.io.bam import encode_bam_record
from bs_call_tpu.io.cram import CramReader
from bs_call_tpu.native import load

from test_cram_foreign import METHODS, _fixture, remux

pytestmark = pytest.mark.skipif(
    load() is None, reason="native toolchain unavailable"
)


def _python_blob(path, ref):
    """Reference serialization: Python decode + encode_bam_record."""
    out = []
    for rec in CramReader(path, reference=ref):
        out.append(encode_bam_record(rec))
    return b"".join(out)


def _native_blob(path, ref):
    r = CramReader(path, reference=ref)
    return b"".join(blob for blob, _tid in r.iter_record_blobs())


@pytest.mark.parametrize("seed", [0, 3, 9])
def test_native_slice_decode_bitwise(tmp_path, seed):
    ref, path = _fixture(tmp_path, n=500, seed=seed)
    assert _native_blob(path, ref) == _python_blob(path, ref)


@pytest.mark.parametrize("name", ["bzip2", "rans1", "mixed"])
def test_native_decode_foreign_codecs(tmp_path, name):
    ref, path = _fixture(tmp_path, n=300, seed=1)
    raw = open(path, "rb").read()
    p2 = tmp_path / "v.cram"
    p2.write_bytes(remux(raw, METHODS[name]))
    assert _native_blob(str(p2), ref) == _python_blob(str(p2), ref)


def test_native_paired_cram(tmp_path):
    """Mate-downstream links and detached mates through the CramWriter's
    round trip must resolve identically."""
    from bs_call_tpu.io.bam import BamHeader, aux_tag
    from bs_call_tpu.io.cram_writer import CramWriter

    rng = np.random.default_rng(5)
    ctg_len = 5000
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
    ref = tmp_path / "ref.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n"
    )
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{ctg_len}\n",
        ref_names=["chr1"],
        ref_lens=[ctg_len],
    )
    path = tmp_path / "p.cram"
    w = CramWriter(str(path), hdr, reference=str(ref))
    recs = []
    for i in range(120):
        p1 = int(rng.integers(0, ctg_len - 300))
        rl = 70
        p2 = p1 + rl + int(rng.integers(0, 60))
        isz = p2 + rl - p1
        recs.append((p1, f"p{i}", 99, p1, p2, isz))
        recs.append((p2, f"p{i}", 147, p2, p1, -isz))
    recs.sort(key=lambda r: r[0])
    for pos, name, flag, p, mp, isz in recs:
        q = rng.integers(1, 44, 70).astype(np.uint8)
        w.write(
            name, flag, 0, p, 40, [(70, 0)], 0, mp, isz,
            seq[p : p + 70], q, aux=aux_tag("XB", "A", "G"),
        )
    w.close()
    assert _native_blob(str(path), str(ref)) == _python_blob(
        str(path), str(ref)
    )


def test_blob_structure_valid(tmp_path):
    """Blobs are well-formed [u32 size][body] streams."""
    ref, path = _fixture(tmp_path, n=100, seed=2)
    blob = _native_blob(path, ref)
    off = 0
    n = 0
    while off < len(blob):
        (sz,) = struct.unpack_from("<i", blob, off)
        assert 32 <= sz < 1 << 20
        off += 4 + sz
        n += 1
    assert off == len(blob)
    assert n == 100


def test_native_multiref_slice_decode_bitwise(tmp_path):
    """Multi-ref slices (ref_id -2, per-record RI) through the native
    decoder's two-pass per-tid reference table must match the Python
    decoder bit for bit."""
    from bs_call_tpu.io.bam import BamHeader
    from bs_call_tpu.io.cram_writer import CramWriter

    from test_cram import make_multicontig_dataset

    ref, hdr, recs = make_multicontig_dataset(tmp_path, seed=8)
    cram = tmp_path / "mr.cram"
    wc = CramWriter(str(cram), hdr, reference=ref, multi_ref=True)
    for r in recs:
        wc.write(*r)
    wc.close()
    assert _native_blob(str(cram), ref) == _python_blob(str(cram), ref)
