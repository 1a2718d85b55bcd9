// Native FASTA/FASTQ batch reader: parse + 2-bit encode + halo-chunk,
// written straight into a caller-provided (rows, row_len) uint8 buffer.
//
// The TPU framework's replacement for gatb-core BankFasta (SURVEY.md C9):
// the reference parses with a C++ lexer over zlib streams
// (bank/impl/BankFasta.cpp); here the ENTIRE host hot path — gunzip,
// record parsing, base->code translation, (k-1)-halo chunking of long
// reads — happens in one C++ pass per batch, so Python only moves
// filled numpy buffers to the device.
//
// Semantics contract (must match dsk_tpu/io/batch.py + kmer/codec.py):
//   * codes: A/a=0, C/c=1, T/t=2, G/g=3, everything else INVALID=0xFF
//   * reads shorter than k are skipped
//   * reads longer than row_len are split into row_len chunks overlapping
//     by (k-1); a final partial chunk is emitted iff it holds >= k bases
//   * rows are padded with 0xFF
//   * FASTA: '>' headers, multi-line sequences;  FASTQ: @/seq/+/qual with
//     qual length == seq length;  gzip handled transparently (zlib gzopen
//     reads plain files too)
//
// Build: make -C dsk_tpu/io/native   (produces libdskio.so; linked -lz)

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <new>

namespace {

constexpr uint8_t INVALID = 0xFF;

struct Lut {
    uint8_t v[256];
    Lut() {
        std::memset(v, INVALID, sizeof(v));
        v['A'] = v['a'] = 0;
        v['C'] = v['c'] = 1;
        v['T'] = v['t'] = 2;
        v['G'] = v['g'] = 3;
    }
};
const Lut LUT;

enum class S {
    START,        // expecting '>' or '@'
    FA_HEADER,    // skipping a fasta header line
    FA_SEQ,       // consuming fasta sequence lines
    FQ_HEADER,    // skipping a fastq header line
    FQ_SEQ,       // consuming the fastq sequence line
    FQ_PLUS,      // skipping the '+' line
    FQ_QUAL,      // consuming quality chars (count == seq length)
};

constexpr int IOBUF = 1 << 20;
constexpr int MAX_ROW = 1 << 16;

struct Handle {
    gzFile f = nullptr;
    S state = S::START;
    // streaming chunker state for the current read
    uint8_t cur[MAX_ROW];
    int cur_len = 0;          // filled codes in cur
    long read_len = 0;        // bases of the current read so far
    long qual_left = 0;       // fastq quality chars still to skip
    bool fastq = false;
    // io buffer
    uint8_t buf[IOBUF];
    int buf_len = 0;
    int buf_pos = 0;
    bool eof = false;
    // batch-call stats
    long bases = 0;
    long reads = 0;
    int error = 0;            // sticky parse error code
};

// emit the current chunk into the batch if it holds >= k bases; carry the
// (k-1)-halo into the next chunk.  Returns false if the batch is full.
struct Batch {
    uint8_t* out;
    int rows, row_len, k;
    int row = 0;
};

inline bool emit_chunk(Handle* h, Batch* b, bool final_chunk) {
    if (h->cur_len < b->k) {
        if (final_chunk) h->cur_len = 0;
        return true;  // nothing to emit (short final chunk / short read)
    }
    if (b->row >= b->rows) return false;  // batch full, keep state
    uint8_t* dst = b->out + (size_t)b->row * b->row_len;
    std::memcpy(dst, h->cur, h->cur_len);
    std::memset(dst + h->cur_len, INVALID, b->row_len - h->cur_len);
    b->row++;
    if (final_chunk) {
        h->cur_len = 0;
    } else {
        // carry halo: last k-1 codes start the next chunk
        std::memmove(h->cur, h->cur + h->cur_len - (b->k - 1), b->k - 1);
        h->cur_len = b->k - 1;
    }
    return true;
}

inline bool push_base(Handle* h, Batch* b, uint8_t code) {
    if (h->cur_len == b->row_len) {
        if (!emit_chunk(h, b, false)) return false;
    }
    h->cur[h->cur_len++] = code;
    h->read_len++;
    h->bases++;
    return true;
}

inline bool end_read(Handle* h, Batch* b) {
    if (h->read_len > 0) h->reads++;
    bool ok = emit_chunk(h, b, true);
    h->read_len = 0;
    return ok;
}

inline bool fill(Handle* h) {
    if (h->eof) return false;
    int n = gzread(h->f, h->buf, IOBUF);
    if (n <= 0) {
        h->eof = true;
        if (n < 0) h->error = 2;  // gz read error
        return false;
    }
    h->buf_len = n;
    h->buf_pos = 0;
    return true;
}

}  // namespace

extern "C" {

void* fx_open(const char* path) {
    gzFile f = gzopen(path, "rb");
    if (!f) return nullptr;
    gzbuffer(f, IOBUF);
    Handle* h = new (std::nothrow) Handle();
    if (!h) {
        gzclose(f);
        return nullptr;
    }
    h->f = f;
    return h;
}

void fx_close(void* hv) {
    Handle* h = static_cast<Handle*>(hv);
    if (!h) return;
    if (h->f) gzclose(h->f);
    delete h;
}

int fx_error(void* hv) { return static_cast<Handle*>(hv)->error; }

// Fill out_codes (rows * row_len, row-major) with encoded chunked reads.
// Returns number of rows written; 0 means EOF (or error: check fx_error).
// out_bases/out_reads: input bases / whole reads consumed by THIS call.
int fx_next_batch(void* hv, uint8_t* out_codes, int rows, int row_len,
                  int k, long* out_bases, long* out_reads) {
    Handle* h = static_cast<Handle*>(hv);
    if (!h || h->error || row_len > MAX_ROW || k < 1 || k > row_len) {
        if (h && !(h->error)) h->error = 1;  // bad arguments
        return 0;
    }
    Batch b{out_codes, rows, row_len, k, 0};
    h->bases = 0;
    h->reads = 0;

    while (b.row < rows) {
        if (h->buf_pos >= h->buf_len && !fill(h)) break;
        // fast interior scan for sequence states
        while (h->buf_pos < h->buf_len && b.row < rows) {
            uint8_t c = h->buf[h->buf_pos];
            switch (h->state) {
                case S::START:
                    if (c == '>') {
                        h->fastq = false;
                        h->state = S::FA_HEADER;
                    } else if (c == '@') {
                        h->fastq = true;
                        h->state = S::FQ_HEADER;
                    } else if (c != '\n' && c != '\r') {
                        h->error = 3;  // not fasta/fastq
                        return 0;
                    }
                    h->buf_pos++;
                    break;
                case S::FA_HEADER:
                case S::FQ_HEADER: {
                    // skip to end of line
                    const uint8_t* nl = static_cast<const uint8_t*>(
                        std::memchr(h->buf + h->buf_pos, '\n',
                                    h->buf_len - h->buf_pos));
                    if (!nl) {
                        h->buf_pos = h->buf_len;
                    } else {
                        h->buf_pos = (int)(nl - h->buf) + 1;
                        h->state =
                            h->state == S::FA_HEADER ? S::FA_SEQ : S::FQ_SEQ;
                    }
                    break;
                }
                case S::FA_SEQ:
                    if (c == '>') {
                        if (!end_read(h, &b)) goto done;
                        h->state = S::FA_HEADER;
                        h->buf_pos++;
                    } else if (c == '\n' || c == '\r') {
                        h->buf_pos++;
                    } else {
                        if (!push_base(h, &b, LUT.v[c])) goto done;
                        h->buf_pos++;
                    }
                    break;
                case S::FQ_SEQ:
                    if (c == '\n' || c == '\r') {
                        if (c == '\n') {
                            h->qual_left = h->read_len;
                            if (!end_read(h, &b)) {
                                // end_read emitted what it could; if the
                                // batch filled we must not lose the state
                                // transition — qual_left already latched.
                                h->state = S::FQ_PLUS;
                                h->buf_pos++;
                                goto done;
                            }
                            h->state = S::FQ_PLUS;
                        }
                        h->buf_pos++;
                    } else {
                        if (!push_base(h, &b, LUT.v[c])) goto done;
                        h->buf_pos++;
                    }
                    break;
                case S::FQ_PLUS: {
                    const uint8_t* nl = static_cast<const uint8_t*>(
                        std::memchr(h->buf + h->buf_pos, '\n',
                                    h->buf_len - h->buf_pos));
                    if (!nl) {
                        h->buf_pos = h->buf_len;
                    } else {
                        h->buf_pos = (int)(nl - h->buf) + 1;
                        h->state = S::FQ_QUAL;
                    }
                    break;
                }
                case S::FQ_QUAL: {
                    // consume exactly read-length quality chars, newlines
                    // not counted
                    int avail = h->buf_len - h->buf_pos;
                    int take = 0;
                    while (take < avail && h->qual_left > 0) {
                        uint8_t q = h->buf[h->buf_pos + take];
                        if (q != '\n' && q != '\r') h->qual_left--;
                        take++;
                    }
                    h->buf_pos += take;
                    if (h->qual_left == 0) h->state = S::START;
                    break;
                }
            }
        }
    }
    // input exhausted: flush the trailing read (FASTA only; FASTQ reads
    // are flushed at their newline)
    if (h->eof && h->state == S::FA_SEQ) {
        if (end_read(h, &b)) h->state = S::START;
    }
done:
    *out_bases = h->bases;
    *out_reads = h->reads;
    return b.row;
}

}  // extern "C"
