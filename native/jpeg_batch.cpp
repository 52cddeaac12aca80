// Batch JPEG round-trip codec for the camera-degradation simulator.
//
// The reference degrades each training sample through a libjpeg
// encode/decode at a per-sample quality (tf.image.adjust_jpeg_quality,
// /root/reference/train.py:51-59).  This implements the same round trip as a
// C library: RGB in, RGB out (libjpeg JCS_RGB — the same colorspace TF uses,
// avoiding the BGR flips of the cv2 fallback), with an internal thread pool
// so a 16-image batch compresses in parallel while Python stays unblocked.
//
// C ABI (ctypes-friendly):
//   int shdr_jpeg_roundtrip_batch(const uint8_t* in, int b, int h, int w,
//                                 const int* qualities, uint8_t* out,
//                                 int n_threads);
// Returns 0 on success, negative on the first failing sample.

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <setjmp.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Round-trip one RGB image; returns 0 on success.
int roundtrip_one(const uint8_t* in, int h, int w, int quality, uint8_t* out) {
  // ---- encode to memory
  jpeg_compress_struct enc;
  ErrorMgr enc_err;
  enc.err = jpeg_std_error(&enc_err.pub);
  enc_err.pub.error_exit = error_exit;
  unsigned char* buf = nullptr;
  unsigned long buf_size = 0;
  if (setjmp(enc_err.jump)) {
    jpeg_destroy_compress(&enc);
    if (buf) free(buf);
    return -1;
  }
  jpeg_create_compress(&enc);
  jpeg_mem_dest(&enc, &buf, &buf_size);
  enc.image_width = w;
  enc.image_height = h;
  enc.input_components = 3;
  enc.in_color_space = JCS_RGB;
  jpeg_set_defaults(&enc);
  jpeg_set_quality(&enc, quality, TRUE);
  jpeg_start_compress(&enc, TRUE);
  const size_t stride = static_cast<size_t>(w) * 3;
  while (enc.next_scanline < enc.image_height) {
    JSAMPROW row = const_cast<uint8_t*>(in + enc.next_scanline * stride);
    jpeg_write_scanlines(&enc, &row, 1);
  }
  jpeg_finish_compress(&enc);
  jpeg_destroy_compress(&enc);

  // ---- decode back
  jpeg_decompress_struct dec;
  ErrorMgr dec_err;
  dec.err = jpeg_std_error(&dec_err.pub);
  dec_err.pub.error_exit = error_exit;
  if (setjmp(dec_err.jump)) {
    jpeg_destroy_decompress(&dec);
    free(buf);
    return -2;
  }
  jpeg_create_decompress(&dec);
  jpeg_mem_src(&dec, buf, buf_size);
  jpeg_read_header(&dec, TRUE);
  dec.out_color_space = JCS_RGB;
  jpeg_start_decompress(&dec);
  if (static_cast<int>(dec.output_width) != w ||
      static_cast<int>(dec.output_height) != h ||
      dec.output_components != 3) {
    jpeg_destroy_decompress(&dec);
    free(buf);
    return -3;
  }
  while (dec.output_scanline < dec.output_height) {
    JSAMPROW row = out + dec.output_scanline * stride;
    jpeg_read_scanlines(&dec, &row, 1);
  }
  jpeg_finish_decompress(&dec);
  jpeg_destroy_decompress(&dec);
  free(buf);
  return 0;
}

}  // namespace

extern "C" {

int shdr_jpeg_roundtrip_batch(const uint8_t* in, int b, int h, int w,
                              const int* qualities, uint8_t* out,
                              int n_threads) {
  if (b <= 0 || h <= 0 || w <= 0) return -10;
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > b) n_threads = b;

  const size_t img_bytes = static_cast<size_t>(h) * w * 3;
  std::atomic<int> next(0);
  std::atomic<int> status(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= b || status.load() != 0) return;
      int rc = roundtrip_one(in + i * img_bytes, h, w, qualities[i],
                             out + i * img_bytes);
      if (rc != 0) status.store(rc);
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return status.load();
}

// Library self-description for the ctypes loader.
const char* shdr_native_version() { return "shdr-native-1"; }

}  // extern "C"
