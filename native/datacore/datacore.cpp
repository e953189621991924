// Native data-loader core: JPEG decode + random-crop batch assembly.
//
// The reference's host input tier is torch DataLoader worker *processes*
// doing PIL decode + torchvision transforms per epoch
// (`data_loaders_MT.py:47-77`).  This library is the native replacement for
// the decode hot path: libjpeg decode with OpenMP batch parallelism and a
// fused random-crop that writes straight into the caller's pinned batch
// buffer (no per-image Python allocations).
//
// C ABI (ctypes):
//   dc_jpeg_dims(buf, len, &h, &w)                     -> 0 ok
//   dc_decode_jpeg(buf, len, out /* h*w*3 */)          -> 0 ok
//   dc_decode_crop_batch(bufs, lens, n, views, crop,
//                        seeds, out /* n*v*crop*crop*3 */) -> #failures
//
// Build: g++ -O3 -fopenmp -shared -fPIC datacore.cpp -ljpeg -o libdatacore.so

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

namespace {

struct ErrMgr {
    jpeg_error_mgr pub;
    jmp_buf jb;
};

void on_error(j_common_ptr cinfo) {
    ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
    longjmp(err->jb, 1);
}

// xorshift64* — deterministic per-item crop RNG
inline uint64_t next_rand(uint64_t* s) {
    uint64_t x = *s;
    x ^= x >> 12;
    x ^= x << 25;
    x ^= x >> 27;
    *s = x;
    return x * 0x2545F4914F6CDD1DULL;
}

}  // namespace

extern "C" {

int dc_jpeg_dims(const uint8_t* buf, long len, int* h, int* w) {
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = on_error;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, len);
    jpeg_read_header(&cinfo, TRUE);
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

int dc_decode_jpeg(const uint8_t* buf, long len, uint8_t* out) {
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = on_error;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int stride = cinfo.output_width * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

int dc_decode_crop_batch(const uint8_t** bufs, const long* lens, int n,
                         int views, int crop, const uint64_t* seeds,
                         uint8_t* out) {
    int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
    for (int i = 0; i < n; ++i) {
        int h = 0, w = 0;
        if (dc_jpeg_dims(bufs[i], lens[i], &h, &w) != 0 || h < crop ||
            w < crop) {
            failures += 1;
            continue;
        }
        // decode full image into a thread-local buffer
        uint8_t* img = new uint8_t[static_cast<size_t>(h) * w * 3];
        if (dc_decode_jpeg(bufs[i], lens[i], img) != 0) {
            delete[] img;
            failures += 1;
            continue;
        }
        uint64_t seed = seeds[i] ? seeds[i] : 0x9E3779B97F4A7C15ULL;
        const size_t view_sz = static_cast<size_t>(views) * crop * crop * 3;
        for (int v = 0; v < views; ++v) {
            int top = static_cast<int>(next_rand(&seed) % (h - crop + 1));
            int left = static_cast<int>(next_rand(&seed) % (w - crop + 1));
            uint8_t* dst = out + static_cast<size_t>(i) * view_sz +
                           static_cast<size_t>(v) * crop * crop * 3;
            for (int r = 0; r < crop; ++r) {
                std::memcpy(dst + static_cast<size_t>(r) * crop * 3,
                            img + (static_cast<size_t>(top + r) * w + left) * 3,
                            static_cast<size_t>(crop) * 3);
            }
        }
        delete[] img;
    }
    return failures;
}

}  // extern "C"
