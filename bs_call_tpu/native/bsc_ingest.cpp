// bsc_ingest: native BAM ingest for bs_call_tpu.
//
// Role analogue: the reference's input path (htslib BGZF codec threads +
// input_sam.c record decode), re-built as a batch-oriented library: a
// multithreaded BGZF inflater feeds a record parser that fills
// struct-of-arrays buffers handed in from Python (ctypes). Per-record
// outputs include the packed (base | qual<<2) read bytes (input_sam.c:77-87
// encoding), the bisulfite-strand aux-tag classification
// (input_sam.c:144-220) and raw CIGAR words.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libbsc_ingest.so
//        bsc_ingest.cpp -lz -pthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

constexpr int MAX_QUAL = 43;

struct CompBlock {
    std::vector<uint8_t> comp;
    uint32_t isize = 0;
};

// ---------------- multithreaded BGZF stream ----------------

class BgzfStream {
  public:
    explicit BgzfStream(FILE *f, int nthreads)
        : f_(f), nthreads_(nthreads > 0 ? nthreads : 1) {}

    // Append decompressed bytes to out; returns bytes added (0 = EOF).
    size_t fill(std::vector<uint8_t> &out, size_t want) {
        size_t added = 0;
        while (added < want) {
            std::vector<CompBlock> blocks;
            for (int i = 0; i < 64; i++) {
                CompBlock b;
                if (!read_block(b)) { eof_ = true; break; }
                blocks.push_back(std::move(b));
            }
            if (blocks.empty()) break;
            std::vector<size_t> offs(blocks.size() + 1);
            offs[0] = out.size();
            for (size_t i = 0; i < blocks.size(); i++)
                offs[i + 1] = offs[i] + blocks[i].isize;
            out.resize(offs.back());
            size_t nb = blocks.size();
            unsigned nt = std::min<size_t>(nthreads_, nb);
            std::vector<std::thread> ths;
            std::atomic<size_t> next{0};
            auto worker = [&]() {
                for (;;) {
                    size_t i = next.fetch_add(1);
                    if (i >= nb) break;
                    inflate_block(blocks[i], out.data() + offs[i]);
                }
            };
            if (nt <= 1) {
                worker();
            } else {
                for (unsigned t = 0; t < nt; t++) ths.emplace_back(worker);
                for (auto &t : ths) t.join();
            }
            added += offs.back() - offs[0];
            if (eof_) break;
        }
        return added;
    }

    bool eof() const { return eof_; }

  private:
    bool read_block(CompBlock &b) {
        uint8_t hdr[12];
        if (fread(hdr, 1, 12, f_) != 12) return false;
        if (hdr[0] != 0x1f || hdr[1] != 0x8b) return false;
        uint16_t xlen = hdr[10] | (hdr[11] << 8);
        std::vector<uint8_t> extra(xlen);
        if (fread(extra.data(), 1, xlen, f_) != xlen) return false;
        int bsize = -1;
        for (int i = 0; i + 4 <= xlen;) {
            uint16_t slen = extra[i + 2] | (extra[i + 3] << 8);
            if (extra[i] == 'B' && extra[i + 1] == 'C' && slen == 2)
                bsize = extra[i + 4] | (extra[i + 5] << 8);
            i += 4 + slen;
        }
        if (bsize < 0) return false;
        size_t csize = (size_t)bsize + 1 - 12 - xlen - 8;
        b.comp.resize(csize);
        if (fread(b.comp.data(), 1, csize, f_) != csize) return false;
        uint8_t tail[8];
        if (fread(tail, 1, 8, f_) != 8) return false;
        b.isize = tail[4] | (tail[5] << 8) | (tail[6] << 16) |
                  ((uint32_t)tail[7] << 24);
        return true;
    }

    static void inflate_block(const CompBlock &b, uint8_t *dst) {
        if (b.isize == 0) return;
        z_stream zs{};
        inflateInit2(&zs, -15);
        zs.next_in = const_cast<Bytef *>(b.comp.data());
        zs.avail_in = (uInt)b.comp.size();
        zs.next_out = dst;
        zs.avail_out = b.isize;
        inflate(&zs, Z_FINISH);
        inflateEnd(&zs);
    }

    FILE *f_;
    size_t nthreads_;
    bool eof_ = false;
};

// ---------------- BAM parsing ----------------

struct Reader {
    FILE *f = nullptr;
    BgzfStream *stream = nullptr;
    std::vector<uint8_t> buf;   // decompressed stream window
    size_t pos = 0;             // parse offset into buf
    std::string header_text;
    std::vector<std::string> ref_names;
    std::vector<int32_t> ref_lens;
    bool eof = false;

    bool ensure(size_t n) {
        while (buf.size() - pos < n) {
            // compact
            if (pos > (1u << 22)) {
                buf.erase(buf.begin(), buf.begin() + pos);
                pos = 0;
            }
            size_t got = stream->fill(buf, n - (buf.size() - pos));
            if (got == 0) return buf.size() - pos >= n;
        }
        return true;
    }

    uint32_t u32() {
        uint32_t v;
        memcpy(&v, buf.data() + pos, 4);
        pos += 4;
        return v;
    }
};

const uint8_t NIB2CODE[16] = {0, 1, 2, 0, 3, 0, 0, 0, 4, 0, 0, 0, 0, 0, 0, 0};

// bisulfite strand from aux data (input_sam.c:144-220); later tags win
int scan_bs_strand(const uint8_t *s, const uint8_t *end) {
    int strand = 0;
    while (s + 4 <= end) {
        int aligner = 0;  // 1=GEM 2=BOWTIE 3=NOV 4=BSMAP 5=BWAMETH
        if (s[0] == 'Z') {
            if (s[1] == 'B') aligner = 3;
            else if (s[1] == 'S') aligner = 4;
        } else if (s[0] == 'X') {
            if (s[1] == 'G') aligner = 2;
            else if (s[1] == 'B') aligner = 1;
        } else if (s[0] == 'Y' && s[1] == 'D') aligner = 5;
        s += 2;
        uint8_t type = *s++;
        switch (type) {
        case 'A':
            if (aligner == 1) {
                if (*s == 'C') strand = 1;
                else if (*s == 'G') strand = 2;
            }
            s++;
            break;
        case 'C': case 'c': s++; break;
        case 'S': case 's': s += 2; break;
        case 'I': case 'i': case 'f': s += 4; break;
        case 'd': s += 8; break;
        case 'Z':
            if (aligner == 2 || aligner == 3) {
                if (*s == 'C') strand = 1;
                else if (*s == 'G') strand = 2;
            } else if (aligner == 4) {
                if (*s == '+') strand = 1;
                else if (*s == '-') strand = 2;
            } else if (aligner == 5) {
                if (*s == 'f') strand = 1;
                else if (*s == 'r') strand = 2;
            }
            // fallthrough
        case 'H':
            while (s < end && *s) s++;
            if (s < end) s++; else return strand;
            break;
        case 'B': {
            if (s >= end) return strand;
            uint8_t sub = *s++;
            int sz = (sub == 'c' || sub == 'C') ? 1
                   : (sub == 's' || sub == 'S') ? 2
                   : (sub == 'i' || sub == 'I' || sub == 'f') ? 4 : 0;
            if (sz == 0 || s + 4 > end) return strand;
            uint32_t n;
            memcpy(&n, s, 4);
            s += 4 + (size_t)n * sz;
            break;
        }
        default:
            return strand;
        }
    }
    return strand;
}

}  // namespace

extern "C" {

void *bsc_open(const char *path, int nthreads) {
    FILE *f = fopen(path, "rb");
    if (!f) return nullptr;
    Reader *r = new Reader();
    r->f = f;
    r->stream = new BgzfStream(f, nthreads);
    if (!r->ensure(12)) { delete r; return nullptr; }
    if (memcmp(r->buf.data(), "BAM\x01", 4) != 0) { delete r; return nullptr; }
    r->pos = 4;
    uint32_t l_text = r->u32();
    if (!r->ensure(l_text + 4)) { delete r; return nullptr; }
    r->header_text.assign((const char *)r->buf.data() + r->pos, l_text);
    r->pos += l_text;
    uint32_t n_ref = r->u32();
    for (uint32_t i = 0; i < n_ref; i++) {
        if (!r->ensure(8)) { delete r; return nullptr; }
        uint32_t l_name = r->u32();
        if (!r->ensure(l_name + 4)) { delete r; return nullptr; }
        r->ref_names.emplace_back((const char *)r->buf.data() + r->pos,
                                  l_name - 1);
        r->pos += l_name;
        r->ref_lens.push_back((int32_t)r->u32());
    }
    return r;
}

void bsc_close(void *h) {
    Reader *r = (Reader *)h;
    if (!r) return;
    delete r->stream;
    fclose(r->f);
    delete r;
}

int bsc_n_refs(void *h) { return (int)((Reader *)h)->ref_names.size(); }
const char *bsc_ref_name(void *h, int i) {
    return ((Reader *)h)->ref_names[i].c_str();
}
int bsc_ref_len(void *h, int i) { return ((Reader *)h)->ref_lens[i]; }
const char *bsc_header_text(void *h) {
    return ((Reader *)h)->header_text.c_str();
}

// Fetch up to max_records records. Returns count (0 = EOF, -1 = error).
// seq_buf receives packed (base|qual<<2) bytes; seq_off[i] is each
// record's offset (seq_off[count] = total). name_buf/name_off likewise for
// NUL-free name bytes. cigar_off indexes cigar_buf (raw BAM words).
int bsc_next_batch(void *h, int max_records,
                   int32_t *tid, int32_t *posv, int32_t *mtid, int32_t *mposv,
                   int32_t *isize, uint16_t *flag, uint8_t *mapq,
                   int32_t *strand,
                   int64_t *cigar_off, uint32_t *cigar_buf, int64_t cigar_cap,
                   int64_t *seq_off, uint8_t *seq_buf, int64_t seq_cap,
                   int64_t *name_off, char *name_buf, int64_t name_cap) {
    Reader *r = (Reader *)h;
    int count = 0;
    int64_t cig_n = 0, seq_n = 0, name_n = 0;
    cigar_off[0] = seq_off[0] = name_off[0] = 0;
    while (count < max_records) {
        if (!r->ensure(4)) break;
        uint32_t block_size = r->u32();
        if (!r->ensure(block_size)) { r->pos -= 4; break; }
        const uint8_t *p = r->buf.data() + r->pos;
        int32_t rtid, rpos, rmtid, rmpos, risize, l_seq;
        memcpy(&rtid, p, 4);
        memcpy(&rpos, p + 4, 4);
        uint8_t l_read_name = p[8];
        uint8_t rmapq = p[9];
        uint16_t n_cigar, rflag;
        memcpy(&n_cigar, p + 12, 2);
        memcpy(&rflag, p + 14, 2);
        memcpy(&l_seq, p + 16, 4);
        memcpy(&rmtid, p + 20, 4);
        memcpy(&rmpos, p + 24, 4);
        memcpy(&risize, p + 28, 4);
        // capacity check
        if (cig_n + n_cigar > cigar_cap || seq_n + l_seq > seq_cap ||
            name_n + l_read_name > name_cap) {
            r->pos -= 4;
            break;
        }
        const uint8_t *q = p + 32;
        memcpy(name_buf + name_n, q, l_read_name - 1);
        name_n += l_read_name - 1;
        q += l_read_name;
        memcpy(cigar_buf + cig_n, q, (size_t)n_cigar * 4);
        cig_n += n_cigar;
        q += (size_t)n_cigar * 4;
        // seq nibbles + qual -> packed bytes
        const uint8_t *sq = q;
        const uint8_t *ql = q + (l_seq + 1) / 2;
        uint8_t *out = seq_buf + seq_n;
        for (int32_t k = 0; k < l_seq; k++) {
            uint8_t nib = (k & 1) ? (sq[k >> 1] & 0xF) : (sq[k >> 1] >> 4);
            uint8_t code = NIB2CODE[nib];
            uint8_t qv = ql[k];
            if (qv == 0xFF) qv = 0;  // missing qualities
            if (qv > MAX_QUAL) qv = MAX_QUAL;
            out[k] = code ? (uint8_t)((code - 1) | (qv << 2)) : 0;
        }
        seq_n += l_seq;
        const uint8_t *aux = ql + l_seq;
        strand[count] = scan_bs_strand(aux, p + block_size);
        tid[count] = rtid;
        posv[count] = rpos;
        mtid[count] = rmtid;
        mposv[count] = rmpos;
        isize[count] = risize;
        flag[count] = rflag;
        mapq[count] = rmapq;
        count++;
        cigar_off[count] = cig_n;
        seq_off[count] = seq_n;
        name_off[count] = name_n;
        r->pos += block_size;
    }
    return count;
}

}  // extern "C"
