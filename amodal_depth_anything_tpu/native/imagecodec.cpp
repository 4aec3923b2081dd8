// Native image decode for the data loader (PNG via libpng, JPEG via
// libjpeg). TPU-native counterpart of the torch DataLoader's C++ worker
// path (SURVEY.md §2.11): Python threads call these through ctypes —
// the GIL is released for the duration of the call, so the loader's
// prefetch pool decodes in parallel on real cores.
//
// Decodes are RAW: no gamma/linearization (16-bit depth PNGs must keep
// their exact stored values), 16-bit samples byte-swapped to host
// little-endian. Palette / sub-8-bit / tRNS PNGs are rejected at probe
// time (PIL's np.asarray semantics differ for those) so the loader
// falls back to PIL. Parity with PIL is pinned by tests/test_native.py.
//
// Build: g++ -O2 -shared -fPIC imagecodec.cpp -lpng -ljpeg -o libimagecodec.so

#include <csetjmp>
#include <cstdint>
#include <cstdio>  // jpeglib.h needs FILE declared
#include <cstring>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------- PNG

struct MemReader {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

static void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->size) {
    png_error(png, "read past end");
  }
  std::memcpy(out, r->data + r->pos, n);
  r->pos += n;
}

// Parses the header. Returns 0 on success; 4 for color types whose PIL
// decode differs from the libpng canonical transforms (palette PNGs —
// PIL returns the [H,W] index map, not expanded RGB; sub-8-bit gray —
// PIL mode-1 yields bool; tRNS chunks — PIL does not synthesize an alpha
// channel from them). Rejecting those makes _read_image fall back to PIL
// so shapes/dtypes never depend on whether the .so built.
// channels: 1/2/3/4; bit_depth: 8 or 16.
static int png_setup(png_structp png, png_infop info, MemReader* reader,
                     int* h, int* w, int* channels, int* bit_depth) {
  png_set_read_fn(png, reader, png_mem_read);
  png_read_info(png, info);

  png_uint_32 width, height;
  int depth, color_type;
  png_get_IHDR(png, info, &width, &height, &depth, &color_type,
               nullptr, nullptr, nullptr);

  if (color_type == PNG_COLOR_TYPE_PALETTE) return 4;
  if (depth < 8) return 4;
  if (png_get_valid(png, info, PNG_INFO_tRNS)) return 4;
  if (depth == 16) png_set_swap(png);  // PNG is big-endian; host is LE
  png_set_interlace_handling(png);     // Adam7: de-interlace across passes

  png_read_update_info(png, info);
  *w = static_cast<int>(png_get_image_width(png, info));
  *h = static_cast<int>(png_get_image_height(png, info));
  *channels = static_cast<int>(png_get_channels(png, info));
  *bit_depth = static_cast<int>(png_get_bit_depth(png, info));
  return 0;
}

int png_probe(const uint8_t* buf, size_t n, int* h, int* w, int* channels,
              int* bit_depth) {
  if (n < 8 || png_sig_cmp(buf, 0, 8)) return 1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return 2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 3;
  }
  MemReader reader{buf, n, 0};
  int rc = png_setup(png, info, &reader, h, w, channels, bit_depth);
  png_destroy_read_struct(&png, &info, nullptr);
  return rc;
}

// out must hold h*w*channels*(bit_depth/8) bytes (from png_probe).
int png_decode(const uint8_t* buf, size_t n, uint8_t* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return 2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 3;
  }
  MemReader reader{buf, n, 0};
  int h, w, channels, bit_depth;
  if (int rc = png_setup(png, info, &reader, &h, &w, &channels, &bit_depth)) {
    png_destroy_read_struct(&png, &info, nullptr);
    return rc;
  }

  // png_read_image (not per-row reads) so interlaced files accumulate
  // correctly over their passes. `rows` leaks h*8 bytes if libpng
  // longjmps out mid-read (corrupt file) — the caller then falls back to
  // PIL, so the leak is once-per-bad-file, not per-image.
  size_t stride = static_cast<size_t>(w) * channels * (bit_depth / 8);
  png_bytep* rows = new png_bytep[h];
  for (int y = 0; y < h; ++y) rows[y] = out + y * stride;
  png_read_image(png, rows);
  delete[] rows;
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// --------------------------------------------------------------- JPEG

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

int jpeg_probe(const uint8_t* buf, size_t n, int* h, int* w, int* channels) {
  if (n < 2 || buf[0] != 0xFF || buf[1] != 0xD8) return 1;
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), n);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_calc_output_dimensions(&cinfo);
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  *channels = cinfo.output_components;
  jpeg_destroy_decompress(&cinfo);
  // CMYK/YCCK (4-component, possibly Adobe-inverted) needs PIL's color
  // management — reject so the caller falls back
  if (*channels > 3) return 4;
  return 0;
}

int jpeg_decode(const uint8_t* buf, size_t n, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), n);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  size_t stride =
      static_cast<size_t>(cinfo.output_width) * cinfo.output_components;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
