// w2x_host — native host-side runtime for the waifu2x TPU framework.
//
// The reference implements its entire host runtime in C++: OpenCV image
// decode/encode (main.cpp:74,190), an std::thread worker pool
// (modelHandler.cpp:42-69) and the block tiler (convertRoutine.cpp:84-168).
// In the TPU framework the *compute* moved into XLA/Pallas kernels, but the
// host-side serving path keeps the same native needs: image codecs, the
// zero-flop polyphase->raster u8 interleave that the fast path defers to
// the host (ops/s2d.py d2s_host), and a threaded batch loader that keeps
// the TPU fed. This library provides them via a plain C ABI consumed with
// ctypes (waifu2x_tpu/native.py); PIL/numpy remain as a pure-Python
// fallback so the framework works unbuilt.
//
// Build: `make -C native` (links libpng16, libjpeg, libz, pthread).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <jpeglib.h>
#include <png.h>
#include <pthread.h>

#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

// Decode a PNG file into tightly packed u8 BGR or BGRA (keep_alpha != 0 and
// the file has alpha). Returns 0 on success; fills *out (malloc'd, caller
// frees via w2x_free), *w, *h, *channels.
int w2x_decode_png(const char* path, uint8_t** out, int* w, int* h,
                   int* channels, int keep_alpha) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return -1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info) {
        if (png) png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -2;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -3;
    }
    png_init_io(png, fp);
    png_read_info(png, info);

    png_uint_32 width = png_get_image_width(png, info);
    png_uint_32 height = png_get_image_height(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);

    bool has_alpha = (color & PNG_COLOR_MASK_ALPHA) != 0 ||
                     png_get_valid(png, info, PNG_INFO_tRNS);
    int out_ch = (keep_alpha && has_alpha) ? 4 : 3;

    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (has_alpha && out_ch == 3) png_set_strip_alpha(png);
    png_set_bgr(png);  // emit BGR(A) directly — cv::imread channel order
    png_read_update_info(png, info);

    int nch = png_get_channels(png, info);
    if (nch != out_ch) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -4;
    }

    size_t stride = (size_t)width * out_ch;
    uint8_t* buf = (uint8_t*)malloc(stride * height);
    png_bytep* rows = (png_bytep*)malloc(sizeof(png_bytep) * height);
    if (!buf || !rows) {
        free(buf); free(rows);
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -5;
    }
    for (png_uint_32 r = 0; r < height; ++r) rows[r] = buf + r * stride;
    png_read_image(png, rows);
    png_read_end(png, nullptr);
    free(rows);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    *out = buf; *w = (int)width; *h = (int)height; *channels = out_ch;
    return 0;
}

// Encode tightly packed u8 BGR/BGRA to a PNG file. Returns 0 on success.
int w2x_encode_png(const char* path, const uint8_t* data, int w, int h,
                   int channels) {
    if (channels != 3 && channels != 4) return -4;
    FILE* fp = fopen(path, "wb");
    if (!fp) return -1;
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                              nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info) {
        if (png) png_destroy_write_struct(&png, &info);
        fclose(fp);
        return -2;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_write_struct(&png, &info);
        fclose(fp);
        return -3;
    }
    png_init_io(png, fp);
    png_set_IHDR(png, info, w, h, 8,
                 channels == 4 ? PNG_COLOR_TYPE_RGBA : PNG_COLOR_TYPE_RGB,
                 PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                 PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);
    png_set_bgr(png);  // input rows are BGR(A)
    size_t stride = (size_t)w * channels;
    for (int r = 0; r < h; ++r)
        png_write_row(png, (png_const_bytep)(data + (size_t)r * stride));
    png_write_end(png, nullptr);
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return 0;
}

// ---------------------------------------------------------------------------
// JPEG (decode only — the reference always writes PNG, main.cpp:173-190)
// ---------------------------------------------------------------------------

struct w2x_jpeg_err {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

static void w2x_jpeg_fail(j_common_ptr cinfo) {
    w2x_jpeg_err* e = (w2x_jpeg_err*)cinfo->err;
    longjmp(e->jb, 1);
}

int w2x_decode_jpeg(const char* path, uint8_t** out, int* w, int* h,
                    int* channels) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return -1;
    jpeg_decompress_struct cinfo;
    w2x_jpeg_err jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = w2x_jpeg_fail;
    uint8_t* buf = nullptr;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(fp);
        free(buf);
        return -3;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, fp);
    jpeg_read_header(&cinfo, TRUE);
#ifdef JCS_EXTENSIONS
    cinfo.out_color_space = JCS_EXT_BGR;  // libjpeg-turbo: BGR directly
#else
    cinfo.out_color_space = JCS_RGB;
#endif
    jpeg_start_decompress(&cinfo);
    int width = cinfo.output_width, height = cinfo.output_height;
    int nch = cinfo.output_components;
    size_t stride = (size_t)width * nch;
    buf = (uint8_t*)malloc(stride * height);
    if (!buf) {
        jpeg_destroy_decompress(&cinfo);
        fclose(fp);
        return -5;
    }
    while ((int)cinfo.output_scanline < height) {
        uint8_t* rowp = buf + stride * cinfo.output_scanline;
        jpeg_read_scanlines(&cinfo, &rowp, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
#ifndef JCS_EXTENSIONS
    for (size_t i = 0; i + 2 < stride * height; i += 3) {  // RGB -> BGR
        uint8_t t = buf[i]; buf[i] = buf[i + 2]; buf[i + 2] = t;
    }
#endif
    *out = buf; *w = width; *h = height; *channels = nch;
    return 0;
}

void w2x_free(uint8_t* p) { free(p); }

// ---------------------------------------------------------------------------
// Polyphase (s2d) -> raster interleave, u8
// ---------------------------------------------------------------------------

// src: [h, w, 4*c] u8 with channel (a*2+b)*c + k == full-res pixel
// (2i+a, 2j+b, k); dst: [2h, 2w, c] u8. This is the host half of the TPU
// fast path (the device emits u8 BGR in polyphase layout; see
// pipeline.scale2x_batch_u8_s2d) — a pure memory transform, done natively
// to keep host latency off the serving path.
void w2x_d2s_u8(const uint8_t* src, uint8_t* dst, int h, int w, int c) {
    size_t in_stride = (size_t)w * 4 * c;
    size_t out_stride = (size_t)(2 * w) * c;
    for (int i = 0; i < h; ++i) {
        const uint8_t* srow = src + i * in_stride;
        uint8_t* d0 = dst + (size_t)(2 * i) * out_stride;
        uint8_t* d1 = d0 + out_stride;
        for (int j = 0; j < w; ++j) {
            const uint8_t* px = srow + (size_t)j * 4 * c;
            uint8_t* o0 = d0 + (size_t)(2 * j) * c;
            uint8_t* o1 = d1 + (size_t)(2 * j) * c;
            memcpy(o0, px, c);              // (A,B) = (0,0)
            memcpy(o0 + c, px + c, c);      // (0,1)
            memcpy(o1, px + 2 * c, c);      // (1,0)
            memcpy(o1 + c, px + 3 * c, c);  // (1,1)
        }
    }
}

// ---------------------------------------------------------------------------
// Threaded batch decode — the host analogue of the reference's nJob pool
// (modelHandler.cpp:42-69): N images decoded on up to `threads` workers.
// ---------------------------------------------------------------------------

struct w2x_batch_item {
    const char* path;
    uint8_t* data;
    int w, h, channels;
    int status;
};

struct w2x_batch_ctx {
    w2x_batch_item* items;
    int n;
    int next;  // guarded by mu
    pthread_mutex_t mu;
};

static int w2x_decode_any(const char* path, uint8_t** out, int* w, int* h,
                          int* c) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return -1;
    unsigned char magic[4] = {0};
    size_t got = fread(magic, 1, 4, fp);
    fclose(fp);
    if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P')
        return w2x_decode_png(path, out, w, h, c, 0);
    if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8)
        return w2x_decode_jpeg(path, out, w, h, c);
    return -6;  // unknown format — caller falls back to PIL
}

static void* w2x_batch_worker(void* arg) {
    w2x_batch_ctx* ctx = (w2x_batch_ctx*)arg;
    for (;;) {
        pthread_mutex_lock(&ctx->mu);
        int i = ctx->next++;
        pthread_mutex_unlock(&ctx->mu);
        if (i >= ctx->n) return nullptr;
        w2x_batch_item* it = &ctx->items[i];
        it->status = w2x_decode_any(it->path, &it->data, &it->w, &it->h,
                                    &it->channels);
    }
}

// Decode `n` image files in parallel. items[] must have .path set; the
// worker fills data/w/h/channels/status per item. Returns 0.
int w2x_decode_batch(w2x_batch_item* items, int n, int threads) {
    if (threads < 1) threads = 1;
    if (threads > n) threads = n;
    w2x_batch_ctx ctx{items, n, 0, PTHREAD_MUTEX_INITIALIZER};
    if (threads == 1) {
        w2x_batch_worker(&ctx);
        return 0;
    }
    pthread_t* tids = (pthread_t*)malloc(sizeof(pthread_t) * threads);
    if (!tids) return -5;
    for (int t = 0; t < threads; ++t)
        pthread_create(&tids[t], nullptr, w2x_batch_worker, &ctx);
    for (int t = 0; t < threads; ++t) pthread_join(tids[t], nullptr);
    free(tids);
    return 0;
}

// Flatten BGRA onto a white background: c' = a*c + (1-a)*255 — the alpha
// handling of the original Lua loader (image_loader.lua:23-33).
void w2x_flatten_white(const uint8_t* bgra, uint8_t* bgr, int64_t npx) {
    for (int64_t i = 0; i < npx; ++i) {
        const uint8_t* s = bgra + i * 4;
        uint8_t* d = bgr + i * 3;
        int a = s[3];
        for (int k = 0; k < 3; ++k)
            d[k] = (uint8_t)((s[k] * a + 255 * (255 - a) + 127) / 255);
    }
}

int w2x_version(void) { return 1; }

}  // extern "C"
