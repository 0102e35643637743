/* Conformance oracle for the from-scratch JPEG codec (tests only).
 *
 * Drives the system libjpeg(-turbo) through its PUBLIC API to
 * encode/decode images with Huffman or arithmetic (T.81 Annex D)
 * entropy coding. Used by tests/test_jpeg_arith.py to prove the
 * pure-Python arithmetic codec in kernel/jpeg.py agrees with the
 * reference implementation at the entropy layer:
 *
 *   encode mode: stdin = "W H GRAY\n" + raw RGB (or grey) bytes;
 *     argv: encode <quality> <arith 0|1> <subsamp 444|420> <restart>
 *     stdout = JFIF bytes.
 *   decode mode: stdin = JFIF bytes; stdout = "W H C\n" + raw bytes.
 *
 * Build: gcc -O2 -o jpeg_oracle jpeg_oracle.c -ljpeg
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_all(FILE *f, size_t *n) {
  size_t cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  for (;;) {
    if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
    size_t r = fread(buf + len, 1, cap - len, f);
    if (r == 0) break;
    len += r;
  }
  *n = len;
  return buf;
}

static int do_encode(int quality, int arith, int sub420, int restart) {
  int w, h, grey;
  if (scanf("%d %d %d\n", &w, &h, &grey) != 3) return 2;
  int ncomp = grey ? 1 : 3;
  size_t need = (size_t)w * h * ncomp, got = 0;
  unsigned char *raw = malloc(need);
  while (got < need) {
    size_t r = fread(raw + got, 1, need - got, stdin);
    if (r == 0) return 3;
    got += r;
  }
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  unsigned char *out = NULL;
  unsigned long outn = 0;
  jpeg_mem_dest(&cinfo, &out, &outn);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = ncomp;
  cinfo.in_color_space = grey ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  cinfo.optimize_coding = arith ? FALSE : TRUE;
  cinfo.restart_interval = restart;
  if (!grey) {
    cinfo.comp_info[0].h_samp_factor = sub420 ? 2 : 1;
    cinfo.comp_info[0].v_samp_factor = sub420 ? 2 : 1;
    cinfo.comp_info[1].h_samp_factor = 1;
    cinfo.comp_info[1].v_samp_factor = 1;
    cinfo.comp_info[2].h_samp_factor = 1;
    cinfo.comp_info[2].v_samp_factor = 1;
  }
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = raw + (size_t)cinfo.next_scanline * w * ncomp;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  fwrite(out, 1, outn, stdout);
  jpeg_destroy_compress(&cinfo);
  return 0;
}

static int do_decode(void) {
  size_t n;
  unsigned char *data = read_all(stdin, &n);
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height,
      c = cinfo.output_components;
  printf("%d %d %d\n", w, h, c);
  unsigned char *row = malloc((size_t)w * c);
  while ((int)cinfo.output_scanline < h) {
    JSAMPROW rp = row;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    fwrite(row, 1, (size_t)w * c, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 2 && strcmp(argv[1], "encode") == 0 && argc == 6)
    return do_encode(atoi(argv[2]), atoi(argv[3]),
                     strcmp(argv[4], "420") == 0, atoi(argv[5]));
  if (argc >= 2 && strcmp(argv[1], "decode") == 0)
    return do_decode();
  fprintf(stderr,
          "usage: %s encode <q> <arith> <444|420> <restart> | decode\n",
          argv[0]);
  return 1;
}
