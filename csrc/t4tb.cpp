// t4tb — native TFRecord framing + CRC32-C for the TensorBoard writer.
//
// Reference behavior: src/tb/crc32c.h + src/tb/writer.h:156-178 (record
// framing [len u64][masked-crc(len)][data][masked-crc(data)]).  The
// Python writer calls these through ctypes; software CRC32-C here is
// slice-by-8 (~GB/s), which matters for image-tile events.
//
// Build: g++ -O2 -shared -fPIC -o libt4tb.so t4tb.cpp

#include <cstdint>
#include <cstring>

extern "C" {

static uint32_t TBL[8][256];
static bool inited = false;

static void init_tables() {
    if (inited) return;
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
    inited = true;
}

uint32_t t4_crc32c(const uint8_t *p, uint64_t n, uint32_t crc0) {
    init_tables();
    uint32_t crc = crc0 ^ 0xFFFFFFFFu;
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

uint32_t t4_masked_crc32c(const uint8_t *p, uint64_t n) {
    uint32_t crc = t4_crc32c(p, n, 0);
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

// frame a TFRecord into out (caller allocates n + 16 bytes);
// returns total bytes written
uint64_t t4_tfrecord_frame(const uint8_t *data, uint64_t n, uint8_t *out) {
    uint64_t len = n;
    memcpy(out, &len, 8);
    uint32_t c1 = t4_masked_crc32c(out, 8);
    memcpy(out + 8, &c1, 4);
    memcpy(out + 12, data, n);
    uint32_t c2 = t4_masked_crc32c(data, n);
    memcpy(out + 12 + n, &c2, 4);
    return n + 16;
}

}  // extern "C"
