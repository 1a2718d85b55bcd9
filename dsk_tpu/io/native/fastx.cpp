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

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <new>
#include <thread>
#include <utility>

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
    struct GzPipe* pipe = nullptr;  // threaded gz inflate (see below)
    long pipe_off = 0;              // uncompressed offset served so far
    S state = S::START;
    // streaming chunker state for the current read
    uint8_t cur[MAX_ROW];
    int cur_len = 0;          // filled codes in cur
    long read_len = 0;        // bases of the current read so far
    long qual_left = 0;       // fastq quality chars still to skip
    bool pending = false;     // cur holds a COMPLETE read whose emit
                              // failed on a full batch (FASTQ: the state
                              // machine advances past the newline, so
                              // the retry must happen at next-call entry
                              // or the next read appends onto cur)
    bool fastq = false;
    // io buffer
    uint8_t buf[IOBUF];
    int buf_len = 0;
    int buf_pos = 0;
    long buf_off = 0;         // file offset of buf[0] (uncompressed)
    bool eof = false;
    // byte-range mode: records whose header offset is >= range_end belong
    // to the next shard (range_end < 0: no limit)
    long range_end = -1;
    // batch-call stats
    long bases = 0;
    long reads = 0;
    int error = 0;            // sticky parse error code
};

// emit the current chunk into the batch if it holds >= k bases; carry the
// (k-1)-halo into the next chunk.  Returns false if the batch is full.
//
// Short reads are PACKED: consecutive whole reads share a row separated
// by one INVALID code (windows never span it — split-at-invalid
// semantics), so a 100 bp read doesn't waste a 256..1024-wide row.
// `col` is the open-row cursor; rows close when the next read doesn't
// fit, at continuation (full-row) chunks, and at the end of every
// fx_next_batch call (so no cross-call packing state exists and rows
// never span input units).  Must stay in lockstep with the Python
// fallback in dsk_tpu/io/batch.py (row-for-row tests).
// Soft per-row invalid-EVENT cap: the sparse "exc" wire format
// (io/packed.py pack_codes_exc, EXC_E) encodes at most 16 invalid
// positions per row, so the packer never overflows as long as rows
// close before accumulating more (separators between packed reads +
// in-read N's).  A SINGLE chunk with > 16 internal invalids still
// exceeds it (the chunk cannot be split here) — that rare case rides
// the engine's WireOverflow -> bitmap retry valve.  Must match
// io/batch.py ROW_EVENT_CAP (row-level lockstep tests).
constexpr int EVENT_CAP = 16;

struct Batch {
    uint8_t* out;
    int rows, row_len, k;
    int row = 0;
    int col = 0;  // open-row write cursor (0 = no open row)
    int ev = 0;   // invalid events in the open row (cap: EVENT_CAP)
};

inline void close_row(Batch* b) {
    if (b->col > 0) {
        b->row++;
        b->col = 0;
    }
    b->ev = 0;
}

inline bool emit_chunk(Handle* h, Batch* b, bool final_chunk) {
    if (h->cur_len < b->k) {
        if (final_chunk) h->cur_len = 0;
        return true;  // nothing to emit (short final chunk / short read)
    }
    int m = h->cur_len;
    if (!final_chunk) {
        // continuation chunk of a long read: always a full row
        close_row(b);
        if (b->row >= b->rows) return false;  // batch full, keep state
        std::memcpy(b->out + (size_t)b->row * b->row_len, h->cur, m);
        b->row++;
        // carry halo: last k-1 codes start the next chunk
        std::memmove(h->cur, h->cur + m - (b->k - 1), b->k - 1);
        h->cur_len = b->k - 1;
        return true;
    }
    // final (or whole-read) chunk: pack after a 1-code separator if it
    // fits the row AND the row's invalid-event budget (EVENT_CAP)
    int cinv = 0;
    for (int i = 0; i < m; i++) cinv += h->cur[i] > 3;
    if (b->col > 0 && (b->col + 1 + m > b->row_len ||
                       b->ev + 1 + cinv > EVENT_CAP))
        close_row(b);
    if (b->row >= b->rows) return false;  // batch full, keep state
    uint8_t* dst = b->out + (size_t)b->row * b->row_len;
    int at = b->col == 0 ? 0 : b->col + 1;
    if (b->col == 0) std::memset(dst, INVALID, b->row_len);
    std::memcpy(dst + at, h->cur, m);
    b->ev = at == 0 ? cinv : b->ev + 1 + cinv;
    b->col = at + m;
    if (b->col >= b->row_len) close_row(b);
    h->cur_len = 0;
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
    if (!ok) h->pending = true;
    return ok;
}

bool fill_from_pipe(Handle* h);

inline bool fill(Handle* h) {
    if (h->eof) return false;
    if (h->pipe) return fill_from_pipe(h);
    long off = gztell(h->f);
    int n = gzread(h->f, h->buf, IOBUF);
    if (n <= 0) {
        h->eof = true;
        if (n < 0) h->error = 2;  // gz read error
        return false;
    }
    h->buf_off = off;
    h->buf_len = n;
    h->buf_pos = 0;
    return true;
}

// current file offset of the char at buf_pos
inline long cur_off(const Handle* h) { return h->buf_off + h->buf_pos; }

// ---- byte-range resync -----------------------------------------------
//
// Reads one line starting at `off` (plain files only; gzseek is cheap on
// transparent streams).  Returns the line length INCLUDING the newline,
// 0 at EOF, capped at cap-1 bytes of content.
static long read_line_at(gzFile f, long off, char* out, int cap,
                         bool* complete) {
    if (gzseek(f, off, SEEK_SET) < 0) return 0;
    int n = gzread(f, out, cap - 1);
    if (n <= 0) return 0;
    out[n] = 0;
    const char* nl = static_cast<const char*>(std::memchr(out, '\n', n));
    if (nl) {
        long len = (long)(nl - out) + 1;
        out[len - 1] = 0;
        *complete = true;
        return len;
    }
    *complete = (n < cap - 1);  // EOF-terminated line
    return n;
}

// Find the first record-header offset at or after `start`.  FASTA: a line
// starting with '>'.  FASTQ: a line starting with '@' whose line+2 starts
// with '+' (quality lines may start with '@' but the line two ahead of a
// quality line is a sequence line, never '+').  Returns -1 if none.
static long resync_to_record(gzFile f, long start, bool fastq) {
    constexpr int CAP = 1 << 16;
    static thread_local char line[CAP];
    bool complete = false;
    long off = start;
    if (start > 0) {
        // a header at exactly `start` counts only if preceded by '\n';
        // otherwise skip the (possibly partial) line `start` lands inside
        if (gzseek(f, start - 1, SEEK_SET) < 0) return -1;
        char prev;
        if (gzread(f, &prev, 1) != 1) return -1;
        if (prev != '\n') {
            long len;
            do {
                len = read_line_at(f, off, line, CAP, &complete);
                if (len == 0) return -1;
                off += len;
            } while (!complete);  // giant FASTA line spanning buffers
        }
    }
    while (true) {
        long len = read_line_at(f, off, line, CAP, &complete);
        if (len == 0) return -1;
        char c0 = line[0];
        if (!fastq) {
            if (c0 == '>') return off;
        } else if (c0 == '@') {
            // verify: line+2 must start with '+' ('@' may also start a
            // quality line, but the line two ahead of a quality line is a
            // sequence line, never '+')
            long o1 = off + len;
            long l1 = read_line_at(f, o1, line, CAP, &complete);
            if (l1 == 0) return -1;
            long o2 = o1 + l1;
            long l2 = read_line_at(f, o2, line, CAP, &complete);
            if (l2 == 0) return -1;
            if (line[0] == '+') return off;
            // not a header (quality line): resume at the NEXT line (o1)
            off = o1;
            continue;
        }
        // skip continuation chunks of an incomplete (giant) line
        off += len;
        while (!complete) {
            len = read_line_at(f, off, line, CAP, &complete);
            if (len == 0) return -1;
            off += len;
        }
    }
}

// ---- threaded gz inflate pipe ------------------------------------------
//
// A single-member gzip file is ONE ReadUnit (no random access), so one
// reader thread used to pay inflate + parse SERIALLY — the measured
// ~105 Mbases/s gz-ingest plateau (plain files byte-range-parallelize
// to ~490; PERF.md round 3).  A whole-member libdeflate slurp was
// measured first and won only ~5% (level-1 gzip inflates fast in zlib
// too): the win is OVERLAP, not a faster inflate.  So gz handles run
// zlib inflate on a PRODUCER THREAD into a bounded chunk pipe and the
// parser consumes concurrently: ingest ~ max(inflate, parse) instead of
// the sum, with O(PIPE_AHEAD) memory.  DSK_TPU_NO_GZ_PIPE=1 forces the
// serial path (tests pin both paths row-identical).

constexpr size_t PIPE_CHUNK = 4u << 20;
constexpr size_t PIPE_AHEAD = 16;  // max chunks in flight (64 MB)

struct GzPipe {
    gzFile f = nullptr;
    std::deque<std::pair<uint8_t*, size_t>> chunks;
    size_t pos_in_front = 0;   // consumer offset into chunks.front()
    bool done = false;
    bool abort_flag = false;
    int err = 0;
    std::mutex mu;
    std::condition_variable cv;
    std::thread th;

    void run() {
        for (;;) {
            uint8_t* c = static_cast<uint8_t*>(std::malloc(PIPE_CHUNK));
            if (!c) {
                std::lock_guard<std::mutex> g(mu);
                err = 2;
                done = true;
                cv.notify_all();
                return;
            }
            int n = gzread(f, c, (unsigned)PIPE_CHUNK);
            std::unique_lock<std::mutex> g(mu);
            if (n <= 0 || abort_flag) {
                std::free(c);
                if (n < 0) err = 2;
                done = true;
                cv.notify_all();
                return;
            }
            chunks.emplace_back(c, (size_t)n);
            cv.notify_all();
            cv.wait(g, [&] {
                return abort_flag || chunks.size() < PIPE_AHEAD;
            });
            if (abort_flag) {
                done = true;
                cv.notify_all();
                return;
            }
        }
    }

    // copy up to cap bytes into out; 0 = EOF, -1 = error
    int read(uint8_t* out, size_t cap) {
        std::unique_lock<std::mutex> g(mu);
        size_t got = 0;
        while (got < cap) {
            cv.wait(g, [&] { return !chunks.empty() || done; });
            if (chunks.empty()) break;  // done and drained
            auto& front = chunks.front();
            size_t avail = front.second - pos_in_front;
            size_t n = avail < cap - got ? avail : cap - got;
            std::memcpy(out + got, front.first + pos_in_front, n);
            got += n;
            pos_in_front += n;
            if (pos_in_front == front.second) {
                std::free(front.first);
                chunks.pop_front();
                pos_in_front = 0;
                cv.notify_all();  // producer may be waiting on AHEAD
            }
            if (got == cap) break;
            // partial: loop (next chunk or wait for producer)
        }
        if (got == 0 && err) return -1;
        return (int)got;
    }

    ~GzPipe() {
        {
            std::lock_guard<std::mutex> g(mu);
            abort_flag = true;
            cv.notify_all();
        }
        if (th.joinable()) th.join();
        for (auto& c : chunks) std::free(c.first);
        if (f) gzclose(f);
    }
};

// Start a pipe for a real-gzip file (nullptr => use the plain path).
static GzPipe* try_gz_pipe(const char* path) {
    const char* off = std::getenv("DSK_TPU_NO_GZ_PIPE");
    if (off && off[0] && off[0] != '0') return nullptr;
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return nullptr;
    uint8_t magic[2];
    size_t n = std::fread(magic, 1, 2, fp);
    std::fclose(fp);
    if (n != 2 || magic[0] != 0x1f || magic[1] != 0x8b) return nullptr;
    gzFile f = gzopen(path, "rb");
    if (!f) return nullptr;
    gzbuffer(f, IOBUF);
    GzPipe* p = new (std::nothrow) GzPipe();
    if (!p) {
        gzclose(f);
        return nullptr;
    }
    p->f = f;
    p->th = std::thread([p] { p->run(); });
    return p;
}

bool fill_from_pipe(Handle* h) {
    int n = h->pipe->read(h->buf, IOBUF);
    if (n <= 0) {
        h->eof = true;
        if (n < 0) h->error = 2;
        return false;
    }
    h->buf_off = h->pipe_off;
    h->buf_len = n;
    h->buf_pos = 0;
    h->pipe_off += n;
    return true;
}

}  // namespace

extern "C" {

void* fx_open(const char* path) {
    Handle* h = new (std::nothrow) Handle();
    if (!h) return nullptr;
    h->pipe = try_gz_pipe(path);
    if (h->pipe) return h;
    gzFile f = gzopen(path, "rb");
    if (!f) {
        delete h;
        return nullptr;
    }
    gzbuffer(f, IOBUF);
    h->f = f;
    return h;
}

// Open a byte range [start, end) of a PLAIN (uncompressed) FASTA/FASTQ
// file: parsing resyncs to the first record header at offset >= start and
// stops at the first header at offset >= end (that record belongs to the
// next shard).  end < 0 means "to EOF".  `fastq` != 0 selects FASTQ
// resync rules (the caller sniffs the format from offset 0 — one file is
// one format).  Gzip members cannot be byte-range-split (no random
// access); callers keep .gz files whole.  Returns nullptr on error.
void* fx_open_range(const char* path, long start, long end, int fastq) {
    {
        // refuse gzip input in range mode (offsets would be meaningless)
        gzFile probe = gzopen(path, "rb");
        if (!probe) return nullptr;
        int direct = gzdirect(probe);  // 1 = plain passthrough
        gzclose(probe);
        if (!direct && (start > 0 || end >= 0)) return nullptr;
    }
    gzFile f = gzopen(path, "rb");
    if (!f) return nullptr;
    long first = start;
    if (start > 0) {
        first = resync_to_record(f, start, fastq != 0);
        if (first < 0 || (end >= 0 && first >= end)) {
            // no record starts inside this shard: empty handle
            first = -1;
        }
    }
    gzbuffer(f, IOBUF);
    Handle* h = new (std::nothrow) Handle();
    if (!h) {
        gzclose(f);
        return nullptr;
    }
    h->f = f;
    h->range_end = end;
    if (first < 0) {
        h->eof = true;
    } else {
        if (gzseek(f, first, SEEK_SET) < 0) {
            gzclose(f);
            delete h;
            return nullptr;
        }
        h->buf_off = first;
    }
    return h;
}

void fx_close(void* hv) {
    Handle* h = static_cast<Handle*>(hv);
    if (!h) return;
    if (h->f) gzclose(h->f);
    delete h->pipe;
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
    if (h->pending) {
        // re-emit the read whose end_read failed on the previous (full)
        // batch; the parser state already advanced past it
        if (emit_chunk(h, &b, true)) h->pending = false;
    }

    while (b.row < rows && !h->pending) {
        if (h->buf_pos >= h->buf_len && !fill(h)) break;
        // fast interior scan for sequence states
        while (h->buf_pos < h->buf_len && b.row < rows) {
            uint8_t c = h->buf[h->buf_pos];
            switch (h->state) {
                case S::START:
                    if (c == '>' || c == '@') {
                        if (h->range_end >= 0 &&
                            cur_off(h) >= h->range_end) {
                            // this record belongs to the next shard
                            h->eof = true;
                            h->buf_pos = h->buf_len;
                            break;
                        }
                        h->fastq = (c == '@');
                        h->state = c == '>' ? S::FA_HEADER : S::FQ_HEADER;
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
                        bool past = h->range_end >= 0 &&
                                    cur_off(h) >= h->range_end;
                        if (!end_read(h, &b)) goto done;
                        if (past) {
                            h->state = S::START;
                            h->eof = true;
                            h->buf_pos = h->buf_len;
                            break;
                        }
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
    close_row(&b);  // packing never spans next_batch calls
    *out_bases = h->bases;
    *out_reads = h->reads;
    return b.row;
}

// Pack a (rows, row_len) byte-code batch into the device wire format
// (dsk_tpu/io/packed.py): 16-base uint32 code words (base i at bits
// 2*(i%16), LSB-first) + 32-base validity bitmap.  row_len is padded up
// to a multiple of 32 with invalid tail bits.  Must stay bit-identical
// to the numpy pack_codes fallback (lockstep-tested).
void fx_pack_batch(const uint8_t* codes, int rows, int row_len,
                   uint32_t* out_words, uint32_t* out_bitmap) {
    int nb = (row_len + 31) / 32;
    int nw = nb * 2;
    for (int r = 0; r < rows; r++) {
        const uint8_t* src = codes + (size_t)r * row_len;
        uint32_t* wr = out_words + (size_t)r * nw;
        uint32_t* br = out_bitmap + (size_t)r * nb;
        for (int b = 0; b < nb; b++) {
            uint32_t w0 = 0, w1 = 0, vm = 0;
            int base = b * 32;
            int lim = row_len - base;
            if (lim > 32) lim = 32;
            for (int i = 0; i < lim; i++) {
                uint8_t c = src[base + i];
                if (c <= 3) {
                    vm |= 1u << i;
                    if (i < 16) w0 |= (uint32_t)c << (2 * i);
                    else        w1 |= (uint32_t)c << (2 * (i - 16));
                }
            }
            wr[2 * b] = w0;
            wr[2 * b + 1] = w1;
            br[b] = vm;
        }
    }
}

// Pack a (rows, row_len) byte-code batch into the SPARSE "exc" wire
// format (dsk_tpu/io/packed.py pack_codes_exc): 16-base uint32 code
// words + (1+E) uint16 meta per row (live length, then the ascending
// positions of invalid bases before it, 0xFFFF-padded).  Returns the
// worst per-row invalid-event count; the caller raises WireOverflow
// when it exceeds E (meta is still fully written — the first E slots).
// Must stay bit-identical to the numpy pack_codes_exc_numpy fallback.
int fx_pack_batch_exc(const uint8_t* codes, int rows, int row_len,
                      int E, uint32_t* out_words, uint16_t* out_meta) {
    int nb = (row_len + 31) / 32;
    int nw = nb * 2;
    int worst = 0;
    for (int r = 0; r < rows; r++) {
        const uint8_t* src = codes + (size_t)r * row_len;
        uint32_t* wr = out_words + (size_t)r * nw;
        uint16_t* mr = out_meta + (size_t)r * (1 + E);
        int live = 0;
        for (int b = 0; b < nb; b++) {
            uint32_t w0 = 0, w1 = 0;
            int base = b * 32;
            int lim = row_len - base;
            if (lim > 32) lim = 32;
            for (int i = 0; i < lim; i++) {
                uint8_t c = src[base + i];
                if (c <= 3) {
                    live = base + i + 1;
                    if (i < 16) w0 |= (uint32_t)c << (2 * i);
                    else        w1 |= (uint32_t)c << (2 * (i - 16));
                }
            }
            wr[2 * b] = w0;
            wr[2 * b + 1] = w1;
        }
        mr[0] = (uint16_t)live;
        int ev = 0;
        for (int i = 0; i < live; i++) {
            if (src[i] > 3) {
                if (ev < E) mr[1 + ev] = (uint16_t)i;
                ev++;
            }
        }
        for (int e = ev < E ? ev : E; e < E; e++) mr[1 + e] = 0xFFFF;
        if (ev > worst) worst = ev;
    }
    return worst;
}

}  // extern "C"
