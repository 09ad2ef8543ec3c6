"""Hand-built CRAM 3.0 conformance fixture (VERDICT r04 item 8).

The in-repo CramWriter makes one narrow set of choices (one slice per
container, delta positions, EXTERNAL-everything, gzip/rANS-order-0
blocks), so round-trip tests can never prove the reader handles a
FOREIGN encoder. This module constructs a CRAM 3.0 file byte-by-byte
from the specification with deliberately different choices our writer
never produces:

  - a MULTI-SLICE container (two mapped slices in one container);
  - order-1 rANS compression on the quality-score external block, plus
    bzip2/lzma/rANS-order-0 on other blocks;
  - absolute (non-delta) alignment positions via a core BETA codec;
  - GAMMA mapq, zero-bit single-symbol HUFFMAN constants (read length,
    read group, tag-line index, tag length);
  - BYTE_ARRAY_STOP read names, BYTE_ARRAY_LEN soft clips and tags;
  - a permuted substitution matrix (SM) — X features only decode
    correctly if the reader honors the matrix rather than assuming the
    common default;
  - slice-header reference MD5s computed per spec;
  - the spec EOF container.

The records are mirrored into a BAM with BamWriter and the full caller
runs over both; VCF bytes must match — end-to-end proof that a
spec-conformant foreign CRAM is read identically to BAM.
"""

import gzip
import hashlib
import struct
import zlib

import bz2
import lzma
import numpy as np

from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.io.cram import (
    CramReader,
    read_itf8,
    write_itf8,
)
from bs_call_tpu.io.cram_codecs import rans_encode_o0, rans_encode_o1

CTG_LEN = 1200


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def bits(self, v, n):
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.n = 0

    def gamma(self, v, offset=0):
        # Elias gamma of (v + 1 + offset): n leading zero bits, then the
        # value's bits (mirrors GammaCodec.read_int)
        x = v + 1 + offset
        nb = x.bit_length()
        self.bits(0, nb - 1)
        self.bits(x, nb)

    def getvalue(self):
        if self.n:
            return bytes(self.out) + bytes([self.cur << (8 - self.n)])
        return bytes(self.out)


def _enc_codec_external(cid):
    params = write_itf8(cid)
    return write_itf8(1) + write_itf8(len(params)) + params


def _enc_codec_huffman_const(sym):
    params = write_itf8(1) + write_itf8(sym) + write_itf8(1) + write_itf8(0)
    return write_itf8(3) + write_itf8(len(params)) + params


def _enc_codec_beta(offset, nbits):
    params = write_itf8(offset) + write_itf8(nbits)
    return write_itf8(6) + write_itf8(len(params)) + params


def _enc_codec_gamma(offset):
    params = write_itf8(offset)
    return write_itf8(9) + write_itf8(len(params)) + params


def _enc_codec_bas(stop, cid):
    params = bytes([stop]) + write_itf8(cid)
    return write_itf8(5) + write_itf8(len(params)) + params


def _enc_codec_bal(len_codec, val_codec):
    params = len_codec + val_codec
    return write_itf8(4) + write_itf8(len(params)) + params


def _block(method, ctype, cid, raw, enc=None):
    data = enc if enc is not None else raw
    out = bytes([method, ctype]) + write_itf8(cid)
    out += write_itf8(len(data)) + write_itf8(len(raw)) + data
    out += struct.pack("<I", zlib.crc32(out) & 0xFFFFFFFF)
    return out


def _container(blocks_bytes, ref_id, start, span, n_records, counter,
               bases, landmarks=None):
    payload = b"".join(blocks_bytes)
    hdr = struct.pack("<i", len(payload))
    hdr += write_itf8(ref_id) + write_itf8(start) + write_itf8(span)
    hdr += write_itf8(n_records)
    hdr += write_itf8(counter) + write_itf8(bases)  # ltf8 1-byte forms
    hdr += write_itf8(len(blocks_bytes))
    lms = landmarks or []
    hdr += write_itf8(len(lms))
    for lm in lms:
        hdr += write_itf8(lm)
    hdr += struct.pack("<I", zlib.crc32(hdr) & 0xFFFFFFFF)
    return hdr + payload


# Permuted substitution matrix: for each reference base (ACGTN order),
# the 2-bit rank of each of the other four bases (ACGTN order, ref
# excluded) — deliberately NOT the frequency-sorted default.
_SM_RANKS = {
    "A": {"C": 3, "G": 0, "T": 2, "N": 1},
    "C": {"A": 2, "G": 3, "T": 0, "N": 1},
    "G": {"A": 1, "C": 2, "T": 3, "N": 0},
    "T": {"A": 0, "C": 1, "G": 2, "N": 3},
    "N": {"A": 3, "C": 2, "G": 1, "T": 0},
}


def _sm_bytes():
    out = bytearray()
    for r in "ACGTN":
        others = [b for b in "ACGTN" if b != r]
        byte = 0
        for k, b in enumerate(others):
            byte |= _SM_RANKS[r][b] << (6 - 2 * k)
        out.append(byte)
    return bytes(out)


def _bs_code(ref_base, alt_base):
    return _SM_RANKS[ref_base][alt_base]


def _comp_header_raw(tag_line):
    # preservation map: RN=1, AP=0 (absolute positions), RR=1, SM, TD
    td_blob = (
        b"".join(t.encode() + typ.encode() for t, typ in tag_line) + b"\x00"
    )
    pm = write_itf8(5)
    pm += b"RN" + b"\x01" + b"AP" + b"\x00" + b"RR" + b"\x01"
    pm += b"SM" + _sm_bytes()
    pm += b"TD" + write_itf8(len(td_blob)) + td_blob
    pres = write_itf8(len(pm)) + pm

    series = {
        "BF": _enc_codec_external(1),
        "CF": _enc_codec_external(2),
        "RL": _enc_codec_huffman_const(40),
        "AP": _enc_codec_beta(0, 12),
        "RG": _enc_codec_huffman_const(-1),
        "RN": _enc_codec_bas(0x00, 3),
        "MQ": _enc_codec_gamma(0),
        "FN": _enc_codec_external(4),
        "FC": _enc_codec_external(5),
        "FP": _enc_codec_external(6),
        "QS": _enc_codec_external(7),
        "BS": _enc_codec_external(11),
        "DL": _enc_codec_gamma(0),
        "SC": _enc_codec_bal(
            _enc_codec_external(10), _enc_codec_external(9)
        ),
        "TL": _enc_codec_huffman_const(0),
    }
    sm = write_itf8(len(series))
    for key, enc in series.items():
        sm += key.encode() + enc
    smap = write_itf8(len(sm)) + sm

    tag, typ = tag_line[0]
    key = (ord(tag[0]) << 16) | (ord(tag[1]) << 8) | ord(typ)
    tenc = _enc_codec_bal(
        _enc_codec_huffman_const(1), _enc_codec_external(12)
    )
    tm = write_itf8(1) + write_itf8(key) + tenc
    tmap = write_itf8(len(tm)) + tm
    return pres + smap + tmap


def _build_slice(seq, recs):
    """recs: list of dicts {name, pos(1-based), mapq, feats, quals}.
    feats: list of (read_pos_1based, kind, payload):
      ('X', alt_base) | ('D', dellen) | ('S', clip_bytes).
    Returns (slice_blocks_list, expected BAM tuples)."""
    core = _BitW()
    ext = {i: bytearray() for i in (1, 2, 3, 4, 5, 6, 7, 9, 10, 11, 12)}
    expected = []
    for r in recs:
        rl = 40
        ext[1] += write_itf8(0)  # BF: unpaired, mapped
        ext[2] += write_itf8(0x1)  # CF: quals preserved
        core.bits(r["pos"], 12)  # AP absolute (BETA, offset 0)
        ext[3] += r["name"].encode() + b"\x00"  # RN, stop 0x00
        # TL: huffman const 0 -> tag line 0; tag XB:A value
        ext[12] += r["tag"].encode()
        # features
        feats = r["feats"]
        ext[4] += write_itf8(len(feats))
        prev = 0
        seq_codes = []
        cigar = []
        # build expected sequence by replay
        out_i = 0
        ref_i = r["pos"] - 1
        exp_seq = []
        exp_cig = []

        def push(op, n):
            if exp_cig and exp_cig[-1][1] == op:
                exp_cig[-1] = (exp_cig[-1][0] + n, op)
            else:
                exp_cig.append((n, op))

        for fpos, kind, payload in feats:
            ext[5] += bytes([ord(kind)])
            ext[6] += write_itf8(fpos - prev)
            prev = fpos
            gap = fpos - 1 - out_i
            if gap > 0:
                exp_seq += list(seq[ref_i : ref_i + gap])
                push(0, gap)
                out_i += gap
                ref_i += gap
            if kind == "X":
                ref_b = seq[ref_i]
                ext[11] += write_itf8(_bs_code(ref_b, payload))
                exp_seq.append(payload)
                push(0, 1)
                out_i += 1
                ref_i += 1
            elif kind == "D":
                core.gamma(payload)  # DL via GAMMA
                push(2, payload)
                ref_i += payload
            elif kind == "S":
                ext[10] += write_itf8(len(payload))
                ext[9] += payload.encode()
                exp_seq += list(payload)
                push(4, len(payload))
                out_i += len(payload)
        tail = rl - out_i
        if tail > 0:
            exp_seq += list(seq[ref_i : ref_i + tail])
            push(0, tail)
        core.gamma(r["mapq"])  # MQ via GAMMA
        ext[7] += bytes(r["quals"])
        expected.append(
            (r["name"], 0, 0, r["pos"] - 1, r["mapq"], tuple(exp_cig),
             "".join(exp_seq), bytes(r["quals"]), r["tag"])
        )
    start = min(r["pos"] for r in recs)
    last = max(
        r["pos"] + 40 + sum(
            p for _f, k, p in r["feats"] if k == "D"
        ) - sum(len(p) for _f, k, p in r["feats"] if k == "S")
        for r in recs
    )
    span = last - start
    md5 = hashlib.md5(
        "".join(seq[start - 1 : start - 1 + span]).encode()
    ).digest()
    ids = sorted(ext)
    sh = write_itf8(0) + write_itf8(start) + write_itf8(span)
    sh += write_itf8(len(recs)) + write_itf8(0)  # counter (ltf8 1-byte)
    sh += write_itf8(1 + len(ids))  # core + externals
    sh += write_itf8(len(ids))
    for i in ids:
        sh += write_itf8(i)
    sh += write_itf8(-1)  # no embedded reference
    sh += md5
    blocks = [_block(0, 2, 0, sh)]
    blocks.append(_block(0, 5, 0, core.getvalue()))  # core, raw
    enc_by_id = {
        3: lambda b: (2, bz2.compress(b)),          # names: bzip2
        7: lambda b: (4, rans_encode_o1(bytes(b))),  # quals: rANS o1
        5: lambda b: (3, lzma.compress(b)),          # feature codes: lzma
        1: lambda b: (4, rans_encode_o0(bytes(b))),  # BF: rANS o0
    }
    for i in ids:
        raw = bytes(ext[i])
        if i in enc_by_id and len(raw) >= 4:
            method, enc = enc_by_id[i](raw)
        else:
            method, enc = 0, raw
        blocks.append(_block(method, 4, i, raw, enc=enc))
    return blocks, expected


def _eof_container():
    # spec special container: empty, ref -1, zero records/blocks
    return _container([], -1, 0, 0, 0, 0, 0)


def _build_fixture(tmp_path):
    rng = np.random.default_rng(5)
    seq = "".join(rng.choice(list("ACGT"), CTG_LEN))
    ref = tmp_path / "ref.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, CTG_LEN, 60))
        + "\n"
    )
    hdr_text = f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{CTG_LEN}\n"

    def mkrec(i, pos, feats):
        return {
            "name": f"q{i}",
            "pos": pos,
            "mapq": int(rng.integers(20, 60)),
            "feats": feats,
            "quals": rng.integers(20, 42, 40).astype(np.uint8),
            "tag": "C" if i % 2 == 0 else "G",
        }

    def alt(p):
        ref_b = seq[p - 1]
        return "ACGT"[("ACGT".index(ref_b) + 1) % 4]

    recs1, recs2 = [], []
    for i in range(6):
        pos = 20 + 30 * i
        recs1.append(mkrec(i, pos, [(7 + i, "X", alt(pos + 6 + i))]))
    for i in range(6):
        pos = 520 + 30 * i
        if i == 2:
            feats = [(1, "S", "TTT"), (10, "X", alt(pos + 9 - 3))]
        elif i == 4:
            feats = [(12, "X", alt(pos + 11)), (21, "D", 5)]
        else:
            feats = [(5 + i, "X", alt(pos + 4 + i))]
        recs2.append(mkrec(6 + i, pos, feats))

    slice1, exp1 = _build_slice(seq, recs1)
    slice2, exp2 = _build_slice(seq, recs2)
    tag_line = [("XB", "A")]
    ch_raw = _comp_header_raw(tag_line)
    blocks = [_block(1, 1, 0, ch_raw, enc=gzip.compress(ch_raw))]
    blocks += slice1 + slice2
    start = 20
    span = (520 + 30 * 5 + 45) - start
    cont = _container(blocks, 0, start, span, 12, 0, 0)

    raw_hdr = struct.pack("<i", len(hdr_text)) + hdr_text.encode()
    hdr_cont = _container([_block(0, 0, 0, raw_hdr)], -1, 0, 0, 0, 0, 0)

    cram = tmp_path / "foreign.cram"
    cram.write_bytes(
        b"CRAM" + bytes([3, 0]) + b"foreign-fixture-0000"
        + hdr_cont + cont + _eof_container()
    )
    return str(ref), str(cram), hdr_text, exp1 + exp2, seq


def test_foreign_cram_decodes_exactly(tmp_path):
    ref, cram, hdr_text, expected, seq = _build_fixture(tmp_path)
    got = []
    code2base = "NACGT"
    for r in CramReader(cram, reference=ref):
        got.append(
            (r.name, r.flag, r.tid, r.pos, r.mapq, tuple(r.cigar),
             "".join(code2base[c] for c in r.seq_code),
             r.qual.tobytes(), r.aux)
        )
    want = [
        (n, f, t, p, mq,
         tuple(cig), s, q, b"XBA" + tag.encode())
        for (n, f, t, p, mq, cig, s, q, tag) in expected
    ]
    assert len(got) == 12
    assert got == want


def test_foreign_cram_pipeline_matches_bam(tmp_path):
    """Full caller over the hand-built CRAM == the same records through
    BAM: the end-to-end conformance claim."""
    import io as iomod

    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.io.bam import aux_tag
    from bs_call_tpu.pipeline.runner import run_caller

    ref, cram, hdr_text, expected, seq = _build_fixture(tmp_path)
    bam = tmp_path / "twin.bam"
    hdr = BamHeader(
        text=hdr_text, ref_names=["chr1"], ref_lens=[CTG_LEN]
    )
    w = BamWriter(str(bam), hdr)
    for (name, flag, tid, pos, mapq, cig, s, quals, tag) in sorted(
        expected, key=lambda e: e[3]
    ):
        w.write(
            name, flag, tid, pos, mapq, list(cig), -1, -1, 0, s,
            np.frombuffer(quals, dtype=np.uint8),
            aux=aux_tag("XB", "A", tag),
        )
    w.close()
    outs = {}
    for label, path in (("cram", cram), ("bam", str(bam))):
        cfg = CallerConfig(
            input_file=path, reference_file=ref, benchmark_mode=True,
            all_positions=True,
        )
        buf = iomod.BytesIO()
        run_caller(cfg, out_fileobj=buf)
        outs[label] = buf.getvalue()
    assert outs["cram"] == outs["bam"]
    assert outs["bam"].count(b"\nchr1\t") > 100
