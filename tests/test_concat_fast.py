"""Trusted fast-path concat (contig-granular raw byte copies) vs the
validated record-level merge.

run_sharded/multihost call concat_vcfs(trusted=True): whole-contig
record runs are located by byte search and copied verbatim. Every
shape must be byte-identical to the untrusted merge; anything
irregular (a contig split across files, compressed inputs) must fall
back to the merge, not mis-copy."""

import gzip
import os

import pytest

from bs_call_tpu import constants as C
from bs_call_tpu.parallel.shard_runner import concat_vcfs

HDR = "##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\n"


def _shard(tmp_path, name, records):
    p = tmp_path / name
    with open(p, "w") as f:
        f.write(HDR)
        for ctg, pos in records:
            f.write(f"{ctg}\t{pos}\t.\tA\tC\n")
    return str(p)


def _both(paths, tmp_path, order, **kw):
    a = str(tmp_path / "fast.vcf")
    b = str(tmp_path / "slow.vcf")
    concat_vcfs(paths, a, contig_order=order, trusted=True, **kw)
    concat_vcfs(paths, b, contig_order=order, trusted=False, **kw)
    return open(a, "rb").read(), open(b, "rb").read()


def test_fast_concat_matches_merge(tmp_path):
    order = ["chr1", "chr2", "chr3", "chr4"]
    # LPT-style assignment: non-adjacent contigs in one shard
    p1 = _shard(tmp_path, "s1.vcf", [("chr1", i) for i in range(1, 50)]
                + [("chr4", i) for i in range(1, 30)])
    p2 = _shard(tmp_path, "s2.vcf", [("chr2", i) for i in range(1, 40)]
                + [("chr3", i) for i in range(1, 20)])
    a, b = _both([p1, p2], tmp_path, order)
    assert a == b
    assert a.count(b"\n") == HDR.count("\n") + 49 + 29 + 39 + 19


def test_fast_concat_empty_and_headeronly_shards(tmp_path):
    order = ["chr1", "chr2"]
    p1 = _shard(tmp_path, "s1.vcf", [("chr1", i) for i in range(1, 9)])
    p2 = _shard(tmp_path, "s2.vcf", [])  # header only
    a, b = _both([p1, p2], tmp_path, order)
    assert a == b


def test_fast_concat_gz_output(tmp_path):
    order = ["chr1", "chr2"]
    p1 = _shard(tmp_path, "s1.vcf", [("chr2", i) for i in range(1, 9)])
    p2 = _shard(tmp_path, "s2.vcf", [("chr1", i) for i in range(1, 5)])
    out = str(tmp_path / "o.vcf.gz")
    concat_vcfs([p1, p2], out, contig_order=order,
                out_file_type=C.FT_VCF_GZ, trusted=True)
    plain = str(tmp_path / "o.vcf")
    concat_vcfs([p1, p2], plain, contig_order=order, trusted=False)
    assert gzip.open(out, "rb").read() == open(plain, "rb").read()


def test_fast_concat_split_contig_falls_back(tmp_path):
    """A contig whose records span two files cannot be copied at contig
    granularity: the trusted call must produce the same record-level
    merge as untrusted."""
    order = ["chr1"]
    p1 = _shard(tmp_path, "s1.vcf", [("chr1", i) for i in (1, 3, 5)])
    p2 = _shard(tmp_path, "s2.vcf", [("chr1", i) for i in (2, 4, 6)])
    a, b = _both([p1, p2], tmp_path, order)
    assert a == b
    body = [ln for ln in a.decode().splitlines() if not ln.startswith("#")]
    assert [int(r.split("\t")[1]) for r in body] == [1, 2, 3, 4, 5, 6]


def test_fast_concat_compressed_input_falls_back(tmp_path):
    order = ["chr1", "chr2"]
    p1 = _shard(tmp_path, "s1.vcf", [("chr1", i) for i in range(1, 6)])
    raw = _shard(tmp_path, "s2r.vcf", [("chr2", i) for i in range(1, 4)])
    p2 = str(tmp_path / "s2.vcf.gz")
    with open(raw, "rb") as f, gzip.open(p2, "wb") as g:
        g.write(f.read())
    a, b = _both([p1, p2], tmp_path, order)
    assert a == b


def test_segments_binary_search_multi_contig(tmp_path):
    """_text_contig_segments finds every run boundary via binary search
    (no full-file scan): multi-contig shards, skipped-contig universes,
    out-of-order and foreign contigs."""
    from bs_call_tpu.parallel.shard_runner import _text_contig_segments

    hdr = "##fileformat=VCFv4.2\n#CHROM\tPOS\n"
    order = {f"chr{i}": i for i in range(1, 8)}
    names = list(order)

    def mk(path, runs):
        with open(path, "w") as f:
            f.write(hdr)
            for name, n in runs:
                for k in range(n):
                    f.write(f"{name}\t{k + 1}\tx\n")
        return str(path)

    # several runs, uneven sizes, universe gaps
    p = mk(tmp_path / "a.vcf",
           [("chr1", 1), ("chr3", 1000), ("chr6", 3), ("chr7", 1)])
    header_end, segs = _text_contig_segments(p, names, order)
    data = open(p, "rb").read()
    assert data[:header_end].endswith(b"#CHROM\tPOS\n")
    assert [r for r, _, _ in segs] == [1, 3, 6, 7]
    assert segs[0][1] == header_end and segs[-1][2] == len(data)
    for rank, start, end in segs:
        body = data[start:end].decode()
        name = names[rank - 1]
        assert all(l.startswith(name + "\t")
                   for l in body.splitlines())
    # single contig
    p = mk(tmp_path / "b.vcf", [("chr2", 5)])
    _, segs = _text_contig_segments(p, names, order)
    assert len(segs) == 1 and segs[0][0] == 2
    # out-of-order runs: generic merge
    p = mk(tmp_path / "c.vcf", [("chr5", 2), ("chr4", 2)])
    assert _text_contig_segments(p, names, order) is None
    # foreign contig: generic merge
    p = mk(tmp_path / "d.vcf", [("chrX", 2)])
    assert _text_contig_segments(p, names, order) is None
    # header only
    p = mk(tmp_path / "e.vcf", [])
    header_end, segs = _text_contig_segments(p, names, order)
    assert segs == []
