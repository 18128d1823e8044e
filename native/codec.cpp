// Native host codec for imagestitching_tpu: libjpeg-turbo + libpng/zlib.
//
// TPU-native replacement for the image decode/encode the reference delegates
// to the WeChat runtime's C++ engine (SURVEY.md §2b): decode fires on
// `img.src = path` (utils/canvas.js:110) and PNG export on
// `wx.canvasToTempFilePath` (utils/canvas.js:205-242).  Here the same work is
// an explicit C ABI consumed from Python via ctypes; calls release the GIL,
// so the decode thread pool gets real parallelism (the reference had to
// *serialize* decodes to survive, pages/index/index.js:1125-1157 — a real
// allocator and real threads make that unnecessary).
//
// Contract notes:
//  * all decoders output tightly-packed RGB8 (w*h*3);
//  * PNG alpha is pre-composited onto opaque white with round-half-up,
//    matching core/oracle.to_uint8 (the draw loop always targets the white
//    canvas, index.js:1423-1424);
//  * JPEG decode supports DCT-domain scale_denom in {1,2,4,8} — the
//    downscale-on-decode analog of the reference's bitmap pixel budgets
//    (index.js:6-7);
//  * buffers are malloc'd here and released with isx_free.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------- errors

static thread_local char g_err[256];

const char* isx_last_error() { return g_err; }

static void set_err(const char* msg) {
    std::snprintf(g_err, sizeof(g_err), "%s", msg);
}

void isx_free(void* p) { std::free(p); }

// ---------------------------------------------------------------- JPEG

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
    char buf[JMSG_LENGTH_MAX];
    (*cinfo->err->format_message)(cinfo, buf);
    set_err(buf);
    longjmp(e->jump, 1);
}

// Decode JPEG bytes to RGB8. scale_denom in {1,2,4,8}.
// Returns 0 on success; *out is malloc'd (w*h*3).
int isx_decode_jpeg(const uint8_t* data, size_t len, int scale_denom,
                    uint8_t** out, int* out_w, int* out_h) {
    *out = nullptr;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    uint8_t* buf = nullptr;
    if (setjmp(jerr.jump)) {
        std::free(buf);
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
                 static_cast<unsigned long>(len));
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    if (scale_denom == 2 || scale_denom == 4 || scale_denom == 8) {
        cinfo.scale_num = 1;
        cinfo.scale_denom = static_cast<unsigned>(scale_denom);
    }
    jpeg_start_decompress(&cinfo);
    const int w = static_cast<int>(cinfo.output_width);
    const int h = static_cast<int>(cinfo.output_height);
    const size_t stride = static_cast<size_t>(w) * 3;
    buf = static_cast<uint8_t*>(std::malloc(stride * h));
    if (!buf) { set_err("oom"); longjmp(jerr.jump, 1); }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* rows[8];
        int n = 0;
        for (; n < 8 && cinfo.output_scanline + n < cinfo.output_height; ++n)
            rows[n] = buf + (cinfo.output_scanline + n) * stride;
        jpeg_read_scanlines(&cinfo, rows, n);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *out = buf;
    *out_w = w;
    *out_h = h;
    return 0;
}

// Encode RGB8 to JPEG bytes (quality 1..100).
int isx_encode_jpeg(const uint8_t* rgb, int w, int h, int quality,
                    uint8_t** out, size_t* out_len) {
    *out = nullptr;
    jpeg_compress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    unsigned char* mem = nullptr;
    unsigned long mem_len = 0;
    if (setjmp(jerr.jump)) {
        std::free(mem);
        jpeg_destroy_compress(&cinfo);
        return 1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &mem, &mem_len);
    cinfo.image_width = static_cast<JDIMENSION>(w);
    cinfo.image_height = static_cast<JDIMENSION>(h);
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    jpeg_start_compress(&cinfo, TRUE);
    const size_t stride = static_cast<size_t>(w) * 3;
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = const_cast<uint8_t*>(rgb)
                       + cinfo.next_scanline * stride;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    *out = mem;          // libjpeg mem dest uses malloc; freed by isx_free
    *out_len = mem_len;
    return 0;
}

// ---------------------------------------------------------------- PNG

struct PngReadCtx {
    const uint8_t* data;
    size_t len;
    size_t pos;
};

static void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
    PngReadCtx* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
    if (ctx->pos + n > ctx->len) {
        png_error(png, "png: truncated input");
        return;
    }
    std::memcpy(out, ctx->data + ctx->pos, n);
    ctx->pos += n;
}

// Decode PNG bytes to RGB8 (alpha composited on white, round-half-up).
int isx_decode_png(const uint8_t* data, size_t len,
                   uint8_t** out, int* out_w, int* out_h) {
    *out = nullptr;
    if (len < 8 || png_sig_cmp(data, 0, 8)) {
        set_err("png: bad signature");
        return 1;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) { set_err("png: alloc"); return 1; }
    png_infop info = png_create_info_struct(png);
    uint8_t* rgba = nullptr;
    uint8_t* buf = nullptr;
    png_bytep* rows = nullptr;
    if (setjmp(png_jmpbuf(png))) {
        std::free(rgba);
        std::free(buf);
        std::free(rows);
        png_destroy_read_struct(&png, &info, nullptr);
        if (!g_err[0]) set_err("png: decode error");
        return 1;
    }
    PngReadCtx ctx{data, len, 0};
    png_set_read_fn(png, &ctx, png_read_fn);
    png_read_info(png, info);
    png_set_expand(png);                    // palette/gray/tRNS -> 8-bit
    png_set_strip_16(png);
    png_set_gray_to_rgb(png);
    png_set_add_alpha(png, 0xFF, PNG_FILLER_AFTER);   // uniform RGBA
    png_read_update_info(png, info);
    const int w = static_cast<int>(png_get_image_width(png, info));
    const int h = static_cast<int>(png_get_image_height(png, info));
    const size_t stride4 = static_cast<size_t>(w) * 4;
    rgba = static_cast<uint8_t*>(std::malloc(stride4 * h));
    rows = static_cast<png_bytep*>(std::malloc(sizeof(png_bytep) * h));
    if (!rgba || !rows) { set_err("oom"); longjmp(png_jmpbuf(png), 1); }
    for (int y = 0; y < h; ++y) rows[y] = rgba + y * stride4;
    png_read_image(png, rows);
    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    std::free(rows);
    rows = nullptr;

    // composite on white: out = a*px + (1-a)*255, round-half-up
    const size_t stride3 = static_cast<size_t>(w) * 3;
    buf = static_cast<uint8_t*>(std::malloc(stride3 * h));
    if (!buf) { std::free(rgba); set_err("oom"); return 1; }
    const size_t n = static_cast<size_t>(w) * h;
    for (size_t i = 0; i < n; ++i) {
        const uint8_t* px = rgba + i * 4;
        uint8_t* dst = buf + i * 3;
        const unsigned a = px[3];
        if (a == 255) {
            dst[0] = px[0]; dst[1] = px[1]; dst[2] = px[2];
        } else {
            const unsigned ia = 255 - a;
            for (int c = 0; c < 3; ++c) {
                // (px*a + 255*ia) / 255 with round-half-up
                const unsigned v = px[c] * a + 255u * ia;
                dst[c] = static_cast<uint8_t>((2 * v + 255) / (2 * 255));
            }
        }
    }
    std::free(rgba);
    *out = buf;
    *out_w = w;
    *out_h = h;
    return 0;
}

struct PngWriteCtx {
    uint8_t* data;
    size_t len;
    size_t cap;
};

static void png_write_fn(png_structp png, png_bytep src, png_size_t n) {
    PngWriteCtx* ctx = static_cast<PngWriteCtx*>(png_get_io_ptr(png));
    if (ctx->len + n > ctx->cap) {
        size_t cap = ctx->cap ? ctx->cap * 2 : 1 << 16;
        while (cap < ctx->len + n) cap *= 2;
        uint8_t* p = static_cast<uint8_t*>(std::realloc(ctx->data, cap));
        if (!p) { png_error(png, "oom"); return; }
        ctx->data = p;
        ctx->cap = cap;
    }
    std::memcpy(ctx->data + ctx->len, src, n);
    ctx->len += n;
}

static void png_flush_fn(png_structp) {}

// Encode RGB8 to PNG bytes. compression: zlib level 0..9 (reference exports
// PNG at quality 1.0, i.e. max fidelity — PNG is lossless, the level only
// trades CPU for size).
int isx_encode_png(const uint8_t* rgb, int w, int h, int compression,
                   uint8_t** out, size_t* out_len) {
    *out = nullptr;
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                              nullptr, nullptr, nullptr);
    if (!png) { set_err("png: alloc"); return 1; }
    png_infop info = png_create_info_struct(png);
    PngWriteCtx ctx{nullptr, 0, 0};
    if (setjmp(png_jmpbuf(png))) {
        std::free(ctx.data);
        png_destroy_write_struct(&png, &info);
        if (!g_err[0]) set_err("png: encode error");
        return 1;
    }
    png_set_write_fn(png, &ctx, png_write_fn, png_flush_fn);
    png_set_compression_level(png, compression);
    // fixed Up filter: libpng's default per-row 5-filter heuristic costs
    // ~40% of encode time (measured) for a few percent of size on photo
    // content; the MT encoder uses the same fixed choice
    png_set_filter(png, 0, PNG_FILTER_UP);
    png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB,
                 PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                 PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);
    const size_t stride = static_cast<size_t>(w) * 3;
    for (int y = 0; y < h; ++y)
        png_write_row(png, const_cast<uint8_t*>(rgb) + y * stride);
    png_write_end(png, nullptr);
    png_destroy_write_struct(&png, &info);
    *out = ctx.data;
    *out_len = ctx.len;
    return 0;
}

}  // extern "C"

// --------------------------------------------------- PNG (streaming writer)
//
// Band-incremental PNG encoder: open once, feed row bands as they arrive
// (e.g. straight off device readback), close to finalize.  The whole canvas
// never needs to exist in host RAM, and the caller can overlap the next
// band's device->host transfer with this band's filter+deflate — on the
// stitch export path those two phases are IO-bound and CPU-bound
// respectively, so they hide under each other (the reference's export is one
// opaque native call, utils/canvas.js:205-242; a framework canvas can be
// 100+ MP, which makes the monolithic form a peak-RSS and latency problem).

extern "C" {

struct PngStream {
    FILE* f;
    png_structp png;
    png_infop info;
    int w, h, written;
};

// Returns an opaque handle, or nullptr (isx_last_error set).
void* isx_png_stream_open(const char* path, int w, int h, int compression) {
    // volatile: `s` must survive the longjmp back to the setjmp below
    PngStream* volatile s =
        static_cast<PngStream*>(std::calloc(1, sizeof(PngStream)));
    if (!s) { set_err("oom"); return nullptr; }
    s->f = std::fopen(path, "wb");
    if (!s->f) { set_err("png-stream: fopen failed"); std::free(s);
                 return nullptr; }
    s->png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                                     nullptr);
    s->info = s->png ? png_create_info_struct(s->png) : nullptr;
    if (!s->png || !s->info || setjmp(png_jmpbuf(s->png))) {
        if (!g_err[0]) set_err("png-stream: init failed");
        if (s->png) png_destroy_write_struct(&s->png, &s->info);
        std::fclose(s->f);
        std::free(s);
        return nullptr;
    }
    png_init_io(s->png, s->f);
    png_set_compression_level(s->png, compression);
    png_set_filter(s->png, 0, PNG_FILTER_UP);   // see isx_encode_png
    png_set_IHDR(s->png, s->info, w, h, 8, PNG_COLOR_TYPE_RGB,
                 PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                 PNG_FILTER_TYPE_DEFAULT);
    png_write_info(s->png, s->info);
    s->w = w;
    s->h = h;
    s->written = 0;
    return s;
}

// Append `nrows` packed RGB8 rows.  0 on success.
int isx_png_stream_write(void* handle, const uint8_t* rgb, int nrows) {
    PngStream* s = static_cast<PngStream*>(handle);
    if (!s || !s->png) { set_err("png-stream: bad handle"); return 1; }
    if (nrows < 0 || s->written + nrows > s->h) {
        set_err("png-stream: row overflow");
        return 1;
    }
    // the jmp_buf captured at open died with open's stack frame — rearm it
    // in every call that enters libpng
    if (setjmp(png_jmpbuf(s->png))) {
        if (!g_err[0]) set_err("png-stream: write error");
        return 1;
    }
    const size_t stride = static_cast<size_t>(s->w) * 3;
    for (int y = 0; y < nrows; ++y)
        png_write_row(s->png, const_cast<uint8_t*>(rgb) + y * stride);
    s->written += nrows;
    return 0;
}

// Finalize and free.  0 on success (all h rows were written and the file
// closed cleanly).  Always releases the handle — also the error/abort path.
int isx_png_stream_close(void* handle) {
    PngStream* s = static_cast<PngStream*>(handle);
    if (!s) { set_err("png-stream: bad handle"); return 1; }
    int rc = 0;
    if (s->png) {
        if (setjmp(png_jmpbuf(s->png))) {
            if (!g_err[0]) set_err("png-stream: finalize error");
            rc = 1;
        } else if (s->written == s->h) {
            png_write_end(s->png, nullptr);
        } else {
            set_err("png-stream: closed before all rows were written");
            rc = 1;
        }
        png_destroy_write_struct(&s->png, &s->info);
    }
    if (s->f && std::fclose(s->f) != 0 && rc == 0) {
        set_err("png-stream: fclose failed");
        rc = 1;
    }
    std::free(s);
    return rc;
}

// -------------------------------------------------- JPEG (streaming writer)
//
// Scanline-incremental twin of the PNG stream writer: same open/write/close
// contract, same overlap story (device readback hides under the DCT+huffman
// CPU work).  Output bytes are identical to isx_encode_jpeg at equal quality.

struct JpegStream {
    FILE* f;
    jpeg_compress_struct cinfo;
    JpegErr jerr;
    int w, h, written;
};

void* isx_jpeg_stream_open(const char* path, int w, int h, int quality) {
    // volatile: must survive the longjmp back to the setjmp below
    JpegStream* volatile s =
        static_cast<JpegStream*>(std::calloc(1, sizeof(JpegStream)));
    if (!s) { set_err("oom"); return nullptr; }
    s->f = std::fopen(path, "wb");
    if (!s->f) { set_err("jpeg-stream: fopen failed"); std::free(s);
                 return nullptr; }
    s->cinfo.err = jpeg_std_error(&s->jerr.mgr);
    s->jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(s->jerr.jump)) {
        if (!g_err[0]) set_err("jpeg-stream: init failed");
        jpeg_destroy_compress(&s->cinfo);
        std::fclose(s->f);
        std::free(const_cast<JpegStream*>(s));
        return nullptr;
    }
    jpeg_create_compress(&s->cinfo);
    jpeg_stdio_dest(&s->cinfo, s->f);
    s->cinfo.image_width = static_cast<JDIMENSION>(w);
    s->cinfo.image_height = static_cast<JDIMENSION>(h);
    s->cinfo.input_components = 3;
    s->cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&s->cinfo);
    jpeg_set_quality(&s->cinfo, quality, TRUE);
    jpeg_start_compress(&s->cinfo, TRUE);
    s->w = w;
    s->h = h;
    s->written = 0;
    return const_cast<JpegStream*>(s);
}

int isx_jpeg_stream_write(void* handle, const uint8_t* rgb, int nrows) {
    JpegStream* s = static_cast<JpegStream*>(handle);
    if (!s) { set_err("jpeg-stream: bad handle"); return 1; }
    if (nrows < 0 || s->written + nrows > s->h) {
        set_err("jpeg-stream: row overflow");
        return 1;
    }
    if (setjmp(s->jerr.jump)) {
        if (!g_err[0]) set_err("jpeg-stream: write error");
        return 1;
    }
    const size_t stride = static_cast<size_t>(s->w) * 3;
    int y = 0;
    while (y < nrows) {
        JSAMPROW rows[8];
        int n = 0;
        for (; n < 8 && y + n < nrows; ++n)
            rows[n] = const_cast<uint8_t*>(rgb) + (y + n) * stride;
        jpeg_write_scanlines(&s->cinfo, rows, static_cast<JDIMENSION>(n));
        y += n;
    }
    s->written += nrows;
    return 0;
}

int isx_jpeg_stream_close(void* handle) {
    JpegStream* s = static_cast<JpegStream*>(handle);
    if (!s) { set_err("jpeg-stream: bad handle"); return 1; }
    int rc = 0;
    if (setjmp(s->jerr.jump)) {
        if (!g_err[0]) set_err("jpeg-stream: finalize error");
        rc = 1;
    } else if (s->written == s->h) {
        jpeg_finish_compress(&s->cinfo);
    } else {
        set_err("jpeg-stream: closed before all rows were written");
        rc = 1;
    }
    jpeg_destroy_compress(&s->cinfo);
    if (s->f && std::fclose(s->f) != 0 && rc == 0) {
        set_err("jpeg-stream: fclose failed");
        rc = 1;
    }
    std::free(s);
    return rc;
}

}  // extern "C"

// ---------------------------------------------------------------- PNG (MT)
//
// Multi-threaded PNG encoder (pigz-style): row strips are filtered and
// deflated independently as raw streams joined by full flushes; the zlib
// wrapper (header + combined adler32) and the PNG container are assembled by
// hand.  Filters may reference the previous RAW row across strip boundaries
// (reconstruction is lossless), only the deflate window resets per strip —
// costing ~1% size for near-linear thread scaling.

extern "C" {

static void put_be32(uint8_t* p, uint32_t v) {
    p[0] = v >> 24; p[1] = v >> 16; p[2] = v >> 8; p[3] = v;
}

struct PngStrip {
    std::vector<uint8_t> filtered;   // (1 filter byte + w*3) per row
    std::vector<uint8_t> deflated;   // raw deflate, Z_FULL_FLUSH-terminated
    uLong adler = 1;
    int rc = 0;
};

static void filter_and_deflate(const uint8_t* rgb, int w, int h,
                               int row_lo, int row_hi, int level,
                               PngStrip* out) {
    const size_t stride = static_cast<size_t>(w) * 3;
    out->filtered.resize((stride + 1) * (row_hi - row_lo));
    uint8_t* dst = out->filtered.data();
    for (int y = row_lo; y < row_hi; ++y) {
        const uint8_t* cur = rgb + y * stride;
        const uint8_t* up = (y > 0) ? rgb + (y - 1) * stride : nullptr;
        *dst++ = up ? 2 : 1;              // filter: Up (Sub for first row)
        if (up) {
            for (size_t i = 0; i < stride; ++i)
                dst[i] = static_cast<uint8_t>(cur[i] - up[i]);
        } else {
            for (size_t i = 0; i < stride; ++i)
                dst[i] = static_cast<uint8_t>(cur[i] - (i >= 3 ? cur[i - 3]
                                                               : 0));
        }
        dst += stride;
    }
    out->adler = adler32(1L, out->filtered.data(),
                         static_cast<uInt>(out->filtered.size()));

    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    // raw deflate (windowBits -15): strips join into one zlib stream
    if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK) {
        out->rc = 1;
        return;
    }
    out->deflated.resize(deflateBound(&zs, out->filtered.size()) + 16);
    zs.next_in = out->filtered.data();
    zs.avail_in = static_cast<uInt>(out->filtered.size());
    zs.next_out = out->deflated.data();
    zs.avail_out = static_cast<uInt>(out->deflated.size());
    int rc = deflate(&zs, Z_FULL_FLUSH);   // ends at a byte boundary
    if (rc != Z_OK && rc != Z_BUF_ERROR) out->rc = 2;
    out->deflated.resize(zs.total_out);
    deflateEnd(&zs);
    out->filtered.clear();
    out->filtered.shrink_to_fit();
}

// Encode RGB8 to PNG using `threads` parallel deflate strips.
int isx_encode_png_mt(const uint8_t* rgb, int w, int h, int level,
                      int threads, uint8_t** out, size_t* out_len) {
    *out = nullptr;
    if (threads < 1) threads = 1;
    if (threads > h) threads = h;
    const int per = (h + threads - 1) / threads;
    std::vector<PngStrip> strips(threads);
    {
        std::vector<std::thread> pool;
        for (int t = 0; t < threads; ++t) {
            int lo = t * per, hi = lo + per < h ? lo + per : h;
            if (lo >= hi) { strips[t].rc = -1; continue; }
            pool.emplace_back(filter_and_deflate, rgb, w, h, lo, hi, level,
                              &strips[t]);
        }
        for (auto& th : pool) th.join();
    }
    size_t zlen = 2;                      // zlib header
    uLong adler = 1;                      // running adler over filtered bytes
    const size_t stride1 = static_cast<size_t>(w) * 3 + 1;
    for (int t = 0; t < threads; ++t) {
        if (strips[t].rc > 0) { set_err("png-mt: deflate failed"); return 1; }
        if (strips[t].rc < 0) continue;
        zlen += strips[t].deflated.size();
        int lo = t * per, hi = lo + per < h ? lo + per : h;
        adler = adler32_combine(adler, strips[t].adler,
                                static_cast<z_off_t>(stride1 * (hi - lo)));
    }
    zlen += 2 /* final empty block */ + 4 /* adler */;

    // PNG container: sig + IHDR + one IDAT + IEND
    const size_t total = 8 + (12 + 13) + (12 + zlen) + 12;
    uint8_t* buf = static_cast<uint8_t*>(std::malloc(total));
    if (!buf) { set_err("oom"); return 1; }
    uint8_t* p = buf;
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    std::memcpy(p, sig, 8); p += 8;
    // IHDR
    put_be32(p, 13); p += 4;
    uint8_t* ihdr = p;
    std::memcpy(p, "IHDR", 4); p += 4;
    put_be32(p, static_cast<uint32_t>(w)); p += 4;
    put_be32(p, static_cast<uint32_t>(h)); p += 4;
    *p++ = 8; *p++ = 2; *p++ = 0; *p++ = 0; *p++ = 0;  // 8-bit RGB
    put_be32(p, static_cast<uint32_t>(
        crc32(0L, ihdr, static_cast<uInt>(p - ihdr)))); p += 4;
    // IDAT
    put_be32(p, static_cast<uint32_t>(zlen)); p += 4;
    uint8_t* idat = p;
    std::memcpy(p, "IDAT", 4); p += 4;
    *p++ = 0x78; *p++ = 0xDA;             // zlib header (32K window, best)
    for (int t = 0; t < threads; ++t) {
        if (strips[t].rc < 0) continue;
        std::memcpy(p, strips[t].deflated.data(), strips[t].deflated.size());
        p += strips[t].deflated.size();
    }
    *p++ = 0x03; *p++ = 0x00;             // final empty fixed block (BFINAL)
    put_be32(p, static_cast<uint32_t>(adler)); p += 4;
    put_be32(p, static_cast<uint32_t>(
        crc32(0L, idat, static_cast<uInt>(p - idat)))); p += 4;
    // IEND
    put_be32(p, 0); p += 4;
    std::memcpy(p, "IEND", 4);
    put_be32(p + 4, static_cast<uint32_t>(crc32(0L,
        reinterpret_cast<const uint8_t*>("IEND"), 4)));
    p += 8;
    *out = buf;
    *out_len = static_cast<size_t>(p - buf);
    return 0;
}

}  // extern "C"
