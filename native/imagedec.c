/* d2r_tpu native image loader.
 *
 * The host-side per-item image work (JPEG/PNG decode -> PIL-style
 * antialiased bicubic shortest-side resize -> center crop -> CLIP
 * normalisation -> CHW float32) is the data pipeline's hot loop (the
 * reference burns 16 torch worker processes on it, ref: run.py:131). This C
 * implementation runs GIL-free under the Python thread-pool loader so
 * decode overlaps device steps even on few-core hosts.
 *
 * Exposed via ctypes (no CPython API):
 *   int d2r_load_image(const char* path, int image_size,
 *                      const float* mean, const float* std, float* out);
 * Returns 0 on success; non-zero error codes make the Python side fall back
 * to the PIL path (which in turn falls back to inf.png, preserving the
 * reference's corrupt-image chain, ref: processor/dataset.py:94-97).
 */

#include <math.h>
#include <setjmp.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <jpeglib.h>
#include <png.h>

#define ERR_OPEN 1
#define ERR_FORMAT 2
#define ERR_DECODE 3
#define ERR_ALLOC 4

/* ---------------- JPEG ---------------- */

struct jpeg_err_mgr {
  struct jpeg_error_mgr pub;
  jmp_buf jump;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  struct jpeg_err_mgr *err = (struct jpeg_err_mgr *)cinfo->err;
  longjmp(err->jump, 1);
}

static int decode_jpeg(FILE *f, unsigned char **rgb, int *w, int *h) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return ERR_DECODE;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return ERR_DECODE;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = (int)cinfo.output_width;
  *h = (int)cinfo.output_height;
  *rgb = (unsigned char *)malloc((size_t)(*w) * (*h) * 3);
  if (!*rgb) {
    jpeg_destroy_decompress(&cinfo);
    return ERR_ALLOC;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char *row = *rgb + (size_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

/* ---------------- PNG ---------------- */

static int decode_png(FILE *f, unsigned char **rgb, int *w, int *h) {
  unsigned char sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) return ERR_FORMAT;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
  if (!png) return ERR_ALLOC;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, NULL, NULL);
    return ERR_ALLOC;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, NULL);
    return ERR_DECODE;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  int color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  *w = (int)png_get_image_width(png, info);
  *h = (int)png_get_image_height(png, info);
  *rgb = (unsigned char *)malloc((size_t)(*w) * (*h) * 3);
  if (!*rgb) {
    png_destroy_read_struct(&png, &info, NULL);
    return ERR_ALLOC;
  }
  for (int y = 0; y < *h; y++) {
    png_bytep row = *rgb + (size_t)y * (*w) * 3;
    png_read_row(png, row, NULL);
  }
  png_destroy_read_struct(&png, &info, NULL);
  return 0;
}

/* ---------------- PIL-style antialiased bicubic resize ---------------- */

/* PIL's bicubic kernel (Catmull-Rom family, a = -0.5), support 2. */
static double bicubic(double x) {
  const double a = -0.5;
  if (x < 0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

/* One separable pass along the horizontal axis: in (h, in_w, 3) u8-as-float
 * -> out (h, out_w, 3). PIL semantics: kernel scaled by max(1, in/out),
 * weights normalised, result clipped to [0, 255]. */
static int resize_axis(const float *in, int h, int in_w, float *out, int out_w) {
  const double scale = (double)in_w / (double)out_w;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 2.0 * filterscale;
  const int kmax = (int)ceil(support) * 2 + 1;

  double *weights = (double *)malloc(sizeof(double) * kmax);
  if (!weights) return ERR_ALLOC;

  for (int xx = 0; xx < out_w; xx++) {
    const double center = ((double)xx + 0.5) * scale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_w) xmax = in_w;
    const int n = xmax - xmin;
    double wsum = 0.0;
    for (int i = 0; i < n; i++) {
      double wv = bicubic((((double)(xmin + i) + 0.5) - center) / filterscale);
      weights[i] = wv;
      wsum += wv;
    }
    if (wsum != 0.0)
      for (int i = 0; i < n; i++) weights[i] /= wsum;

    for (int y = 0; y < h; y++) {
      const float *row = in + ((size_t)y * in_w) * 3;
      for (int c = 0; c < 3; c++) {
        double acc = 0.0;
        for (int i = 0; i < n; i++)
          acc += weights[i] * row[(size_t)(xmin + i) * 3 + c];
        if (acc < 0.0) acc = 0.0;
        if (acc > 255.0) acc = 255.0;
        out[((size_t)y * out_w + xx) * 3 + c] = (float)acc;
      }
    }
  }
  free(weights);
  return 0;
}

/* Vertical pass: in (h, w, 3) -> out (out_h, w, 3); row-contiguous inner
 * loop keeps this cache-friendly without transposes. */
static int resize_vertical(const float *in, int h, int w, float *out, int out_h) {
  const double scale = (double)h / (double)out_h;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 2.0 * filterscale;
  const int kmax = (int)ceil(support) * 2 + 1;

  double *weights = (double *)malloc(sizeof(double) * kmax);
  if (!weights) return ERR_ALLOC;

  for (int yy = 0; yy < out_h; yy++) {
    const double center = ((double)yy + 0.5) * scale;
    int ymin = (int)(center - support + 0.5);
    if (ymin < 0) ymin = 0;
    int ymax = (int)(center + support + 0.5);
    if (ymax > h) ymax = h;
    const int n = ymax - ymin;
    double wsum = 0.0;
    for (int i = 0; i < n; i++) {
      double wv = bicubic((((double)(ymin + i) + 0.5) - center) / filterscale);
      weights[i] = wv;
      wsum += wv;
    }
    if (wsum != 0.0)
      for (int i = 0; i < n; i++) weights[i] /= wsum;

    float *dst = out + (size_t)yy * w * 3;
    memset(dst, 0, sizeof(float) * (size_t)w * 3);
    /* accumulate in float directly into the output row */
    for (int i = 0; i < n; i++) {
      const float wv = (float)weights[i];
      const float *row = in + (size_t)(ymin + i) * w * 3;
      for (int x = 0; x < w * 3; x++) dst[x] += wv * row[x];
    }
    for (int x = 0; x < w * 3; x++) {
      if (dst[x] < 0.0f) dst[x] = 0.0f;
      if (dst[x] > 255.0f) dst[x] = 255.0f;
    }
  }
  free(weights);
  return 0;
}

/* ---------------- entry point ---------------- */

int d2r_load_image(const char *path, int image_size, const float *mean,
                   const float *std, float *out /* 3*S*S CHW */) {
  FILE *f = fopen(path, "rb");
  if (!f) return ERR_OPEN;

  unsigned char magic[2] = {0, 0};
  if (fread(magic, 1, 2, f) != 2) {
    fclose(f);
    return ERR_FORMAT;
  }
  rewind(f);

  unsigned char *rgb = NULL;
  int w = 0, h = 0, rc;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg(f, &rgb, &w, &h);
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    rc = decode_png(f, &rgb, &w, &h);
  } else {
    rc = ERR_FORMAT;
  }
  fclose(f);
  if (rc != 0) {
    free(rgb);
    return rc;
  }
  if (w <= 0 || h <= 0) {
    free(rgb);
    return ERR_DECODE;
  }

  /* shortest-side resize target (PIL round-half-up on w*scale) */
  const double s = (double)image_size / (double)(w < h ? w : h);
  int new_w = (int)floor((double)w * s + 0.5);
  int new_h = (int)floor((double)h * s + 0.5);
  if (new_w < image_size) new_w = image_size;
  if (new_h < image_size) new_h = image_size;

  float *fin = (float *)malloc(sizeof(float) * (size_t)w * h * 3);
  float *pass1 = (float *)malloc(sizeof(float) * (size_t)h * new_w * 3);
  float *final = (float *)malloc(sizeof(float) * (size_t)new_h * new_w * 3);
  if (!fin || !pass1 || !final) {
    free(rgb); free(fin); free(pass1); free(final);
    return ERR_ALLOC;
  }
  for (size_t i = 0; i < (size_t)w * h * 3; i++) fin[i] = (float)rgb[i];
  free(rgb);

  rc = resize_axis(fin, h, w, pass1, new_w);            /* (h, new_w, 3) */
  free(fin);
  if (rc == 0)
    rc = resize_vertical(pass1, h, new_w, final, new_h); /* (new_h, new_w, 3) */
  free(pass1);
  if (rc != 0) {
    free(final);
    return rc;
  }

  /* center crop + normalise -> CHW */
  const int left = (new_w - image_size) / 2;
  const int top = (new_h - image_size) / 2;
  for (int c = 0; c < 3; c++) {
    const float m = mean[c], sd = std[c];
    for (int y = 0; y < image_size; y++) {
      const float *row = final + ((size_t)(top + y) * new_w + left) * 3;
      float *dst = out + ((size_t)c * image_size + y) * image_size;
      for (int x = 0; x < image_size; x++)
        dst[x] = (row[(size_t)x * 3 + c] / 255.0f - m) / sd;
    }
  }
  free(final);
  return 0;
}
