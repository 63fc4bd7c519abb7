// t4io — native TensorBoard event writer + corpus readers.
//
// Completes the blueprint's native host runtime (SURVEY §7: "the
// interpreter, dictionary, TLSF arena manager, event queue, TB writer
// are C++"): event protos are assembled, CRC32C-framed and written
// entirely in C++; the Python Summary layer only decides WHAT to log.
// Reference behavior: src/tb/writer.h (TFRecord framing + hand-built
// Event/Summary protos), src/tb/encoder.h (wire-format encoder),
// src/ld/mnist.cpp (IDX big-endian reader), src/ld/cifar10.cpp
// (3073-byte records, NCHW->NHWC).
//
// Byte-compatibility contract: for the same (tag, value, wall, step)
// the records here are identical to tensorforth_tpu/tb/{encoder,
// writer}.py — pinned by tests/test_native_io.py.
//
// Build: g++ -O2 -shared -fPIC -o libt4io.so t4io.cpp -lz

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <vector>
#include <zlib.h>

// ---- CRC32C (same slice-by-8 as t4tb.cpp; duplicated so the lib is
// self-contained) -----------------------------------------------------
static uint32_t TBL[8][256];
static bool crc_inited = false;

static void crc_init() {
    if (crc_inited) return;
    const uint32_t POLY = 0x82F63B78u;
    for (int i = 0; i < 256; i++) {
        uint32_t c = (uint32_t)i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? (c >> 1) ^ POLY : c >> 1;
        TBL[0][i] = c;
    }
    for (int i = 0; i < 256; i++) {
        uint32_t c = TBL[0][i];
        for (int t = 1; t < 8; t++) {
            c = TBL[0][c & 0xFF] ^ (c >> 8);
            TBL[t][i] = c;
        }
    }
    crc_inited = true;
}

static uint32_t crc32c(const uint8_t *p, uint64_t n) {
    crc_init();
    uint32_t crc = 0xFFFFFFFFu;
    while (n >= 8) {
        uint64_t w;
        memcpy(&w, p, 8);
        w ^= crc;
        crc = TBL[7][w & 0xFF] ^ TBL[6][(w >> 8) & 0xFF]
            ^ TBL[5][(w >> 16) & 0xFF] ^ TBL[4][(w >> 24) & 0xFF]
            ^ TBL[3][(w >> 32) & 0xFF] ^ TBL[2][(w >> 40) & 0xFF]
            ^ TBL[1][(w >> 48) & 0xFF] ^ TBL[0][(w >> 56) & 0xFF];
        p += 8;
        n -= 8;
    }
    while (n--)
        crc = TBL[0][(crc ^ *p++) & 0xFF] ^ (crc >> 8);
    return crc ^ 0xFFFFFFFFu;
}

static uint32_t masked_crc(const uint8_t *p, uint64_t n) {
    uint32_t c = crc32c(p, n);
    return ((c >> 15) | (c << 17)) + 0xA282EAD8u;
}

// ---- protobuf wire-format encoder (reference tb/encoder.h) ----------
typedef std::vector<uint8_t> Buf;

static void put_varint(Buf &b, uint64_t n) {
    while (true) {
        uint8_t x = n & 0x7F;
        n >>= 7;
        if (n) b.push_back(x | 0x80);
        else { b.push_back(x); return; }
    }
}

static void put_key(Buf &b, int field, int wire) {
    put_varint(b, (uint64_t)((field << 3) | wire));
}

static void f_varint(Buf &b, int field, uint64_t n) {
    put_key(b, field, 0);
    put_varint(b, n);
}

static void f_double(Buf &b, int field, double v) {
    put_key(b, field, 1);
    uint8_t raw[8];
    memcpy(raw, &v, 8);
    b.insert(b.end(), raw, raw + 8);
}

static void f_float(Buf &b, int field, float v) {
    put_key(b, field, 5);
    uint8_t raw[4];
    memcpy(raw, &v, 4);
    b.insert(b.end(), raw, raw + 4);
}

static void f_bytes(Buf &b, int field, const uint8_t *p, uint64_t n) {
    put_key(b, field, 2);
    put_varint(b, n);
    b.insert(b.end(), p, p + n);
}

static void f_str(Buf &b, int field, const char *s) {
    f_bytes(b, field, (const uint8_t *)s, strlen(s));
}

static void f_msg(Buf &b, int field, const Buf &m) {
    f_bytes(b, field, m.data(), m.size());
}

static void f_packed_doubles(Buf &b, int field, const double *v, int n) {
    put_key(b, field, 2);
    put_varint(b, (uint64_t)n * 8);
    for (int i = 0; i < n; i++) {
        uint8_t raw[8];
        memcpy(raw, &v[i], 8);
        b.insert(b.end(), raw, raw + 8);
    }
}

// ---- event file writer ----------------------------------------------
// handle = FILE*; framing [len u64][masked-crc(len)][data][masked-crc]

extern "C" {

int64_t t4_tb_open(const char *path) {
    FILE *f = fopen(path, "wb");
    return (int64_t)(intptr_t)f;
}

void t4_tb_close(int64_t h) {
    if (h) fclose((FILE *)(intptr_t)h);
}

void t4_tb_flush(int64_t h) {
    if (h) fflush((FILE *)(intptr_t)h);
}

static int64_t write_record(FILE *f, const Buf &data) {
    uint8_t hdr[12];
    uint64_t len = data.size();
    memcpy(hdr, &len, 8);
    uint32_t c1 = masked_crc(hdr, 8);
    memcpy(hdr + 8, &c1, 4);
    uint32_t c2 = masked_crc(data.data(), data.size());
    if (fwrite(hdr, 1, 12, f) != 12) return -1;
    if (len && fwrite(data.data(), 1, len, f) != len) return -1;
    if (fwrite(&c2, 1, 4, f) != 4) return -1;
    fflush(f);
    return (int64_t)(len + 16);
}

// Event wrapper: wall_time(1 double) [step(2 varint)] + body fields
static int64_t write_event(int64_t h, double wall, int64_t step,
                           int use_step, const Buf &body) {
    if (!h) return -1;
    Buf ev;
    f_double(ev, 1, wall);
    if (use_step) f_varint(ev, 2, (uint64_t)step);
    ev.insert(ev.end(), body.begin(), body.end());
    return write_record((FILE *)(intptr_t)h, ev);
}

// raw pre-encoded body (GraphDef, projector, custom plugins stay
// assembled in the Summary layer; framing/wrapping is still native)
int64_t t4_tb_raw_body(int64_t h, const uint8_t *body, uint64_t n,
                       double wall, int64_t step, int use_step) {
    Buf b(body, body + n);
    return write_event(h, wall, step, use_step, b);
}

int64_t t4_tb_file_version(int64_t h, double wall) {
    Buf b;
    f_str(b, 3, "brain.Event:2");
    return write_event(h, wall, 0, 1, b);
}

int64_t t4_tb_scalar(int64_t h, const char *tag, float v,
                     int64_t step, double wall) {
    Buf val, summ, body;
    f_str(val, 1, tag);
    f_float(val, 2, v);
    f_msg(summ, 1, val);
    f_msg(body, 5, summ);
    return write_event(h, wall, step, 1, body);
}

int64_t t4_tb_text(int64_t h, const char *tag, const char *text,
                   int64_t step, double wall) {
    Buf tensor, meta, pd, val, summ, body;
    f_varint(tensor, 1, 7);                       // DT_STRING
    f_bytes(tensor, 8, (const uint8_t *)text, strlen(text));
    f_str(pd, 1, "text");
    f_msg(meta, 1, pd);
    f_str(val, 1, tag);
    f_msg(val, 8, tensor);
    f_msg(val, 9, meta);
    f_msg(summ, 1, val);
    f_msg(body, 5, summ);
    return write_event(h, wall, step, 1, body);
}

int64_t t4_tb_image(int64_t h, const char *tag, const uint8_t *png,
                    uint64_t n, int ih, int iw, int64_t step,
                    double wall) {
    Buf img, val, summ, body;
    f_varint(img, 1, (uint64_t)ih);
    f_varint(img, 2, (uint64_t)iw);
    f_varint(img, 3, 3);
    f_bytes(img, 4, png, n);
    f_str(val, 1, tag);
    f_msg(val, 4, img);
    f_msg(summ, 1, val);
    f_msg(body, 5, summ);
    return write_event(h, wall, step, 1, body);
}

// histogram proto from precomputed stats (bucket edges/counts are
// computed by the caller so binning matches np.histogram exactly)
int64_t t4_tb_histo(int64_t h, const char *tag, double mn, double mx,
                    double num, double sum, double sum2,
                    const double *edges, const double *counts, int bins,
                    int64_t step, double wall) {
    Buf msg, val, summ, body;
    f_double(msg, 1, mn);
    f_double(msg, 2, mx);
    f_double(msg, 3, num);
    f_double(msg, 4, sum);
    f_double(msg, 5, sum2);
    f_packed_doubles(msg, 6, edges, bins);
    f_packed_doubles(msg, 7, counts, bins);
    f_str(val, 1, tag);
    f_msg(val, 5, msg);
    f_msg(summ, 1, val);
    f_msg(body, 5, summ);
    return write_event(h, wall, step, 1, body);
}

// ---- corpus readers --------------------------------------------------
// gzFile reads both plain and .gz transparently (reference readers are
// plain-file only; the torchvision-era corpora ship gzipped).

static int64_t gz_read_all(const char *path, uint64_t skip, uint8_t *out,
                           uint64_t n) {
    gzFile f = gzopen(path, "rb");
    if (!f) return -1;
    uint8_t tmp[1 << 16];
    while (skip) {
        unsigned chunk = skip > sizeof(tmp) ? sizeof(tmp) : (unsigned)skip;
        int r = gzread(f, tmp, chunk);
        if (r <= 0) { gzclose(f); return -1; }
        skip -= (uint64_t)r;
    }
    uint64_t got = 0;
    while (got < n) {
        unsigned chunk = (n - got) > 0x40000000ull ? 0x40000000u
                                                   : (unsigned)(n - got);
        int r = gzread(f, out + got, chunk);
        if (r < 0) { gzclose(f); return -1; }
        if (r == 0) break;                         // EOF
        got += (uint64_t)r;
    }
    gzclose(f);
    return (int64_t)got;
}

static uint32_t be32(const uint8_t *p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16)
         | ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

// IDX header: out_dims = {magic, n, h, w} (h=w=1 for label files).
// Returns header size in bytes, or -1.
int64_t t4_ld_idx_info(const char *path, uint32_t *out_dims) {
    gzFile f = gzopen(path, "rb");
    if (!f) return -1;
    uint8_t hdr[16];
    if (gzread(f, hdr, 4) != 4) { gzclose(f); return -1; }
    uint32_t magic = be32(hdr);
    int ndim = magic & 0xFF;                       // 0x801=1-D, 0x803=3-D
    if ((magic & 0xFFFFFF00u) != 0x800 || ndim < 1 || ndim > 3) {
        gzclose(f);
        return -1;
    }
    out_dims[0] = magic;
    out_dims[1] = out_dims[2] = out_dims[3] = 1;
    for (int i = 0; i < ndim; i++) {
        if (gzread(f, hdr, 4) != 4) { gzclose(f); return -1; }
        out_dims[1 + i] = be32(hdr);
    }
    gzclose(f);
    return 4 + 4 * ndim;
}

// bulk IDX payload read (past the header) into caller buffer
int64_t t4_ld_idx_read(const char *path, uint64_t hdr_sz, uint8_t *out,
                       uint64_t n) {
    return gz_read_all(path, hdr_sz, out, n);
}

// CIFAR-10 binary batches: records of [label u8][3072 u8 CHW];
// emits NHWC data + labels.  Returns record count, or -1.
int64_t t4_ld_cifar(const char *path, uint8_t *data_out, uint8_t *lbl_out,
                    int64_t max_n) {
    const int64_t REC = 3073, HW = 32 * 32;
    gzFile f = gzopen(path, "rb");
    if (!f) return -1;
    std::vector<uint8_t> rec(REC);
    int64_t n = 0;
    while (n < max_n) {
        int64_t got = 0;
        while (got < REC) {
            int r = gzread(f, rec.data() + got, (unsigned)(REC - got));
            if (r < 0) { gzclose(f); return -1; }
            if (r == 0) break;
            got += r;
        }
        if (got < REC) break;                      // EOF / partial record
        lbl_out[n] = rec[0];
        const uint8_t *chw = rec.data() + 1;
        uint8_t *nhwc = data_out + n * HW * 3;
        for (int64_t px = 0; px < HW; px++) {      // CHW -> HWC
            nhwc[px * 3 + 0] = chw[px];
            nhwc[px * 3 + 1] = chw[HW + px];
            nhwc[px * 3 + 2] = chw[2 * HW + px];
        }
        n++;
    }
    gzclose(f);
    return n;
}

}  // extern "C"
