// Ground-truth EXR fixture generator (round 3: VERDICT item 7).
//
// Uses the OFFICIAL OpenEXR library (system libopenexr-dev) to write small
// B44 / B44A / crop-window (dataWindow != displayWindow) fixtures, then
// reads each one back with the same library and dumps the decoded pixels —
// composed into the display window, zero outside the data window — as a raw
// .bin (int32 h, int32 w, float32 h*w*4 RGBA). tests/test_exr.py pins the
// repo's from-scratch Python codec bit-for-bit against these dumps.
//
// Build & run (one-time; outputs are committed):
//   g++ -O2 scripts/gen_exr_fixtures.cpp -o /tmp/gen_exr \
//       -I/usr/include/OpenEXR -I/usr/include/Imath \
//       -lOpenEXR-3_1 -lImath-3_1 -lIex-3_1 && /tmp/gen_exr tests/fixtures

#include <ImfOutputFile.h>
#include <ImfTiledOutputFile.h>
#include <ImfInputFile.h>
#include <ImfChannelList.h>
#include <ImfFrameBuffer.h>
#include <ImfHeader.h>
#include <ImathBox.h>
#include <half.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

using namespace Imf;
using namespace Imath;

static void dump_display_rgba(const std::string &exr_path,
                              const std::string &bin_path) {
  InputFile f(exr_path.c_str());
  Box2i dw = f.header().dataWindow();
  Box2i sw = f.header().displayWindow();
  int W = sw.max.x - sw.min.x + 1, H = sw.max.y - sw.min.y + 1;
  int dW = dw.max.x - dw.min.x + 1;
  std::vector<float> buf((size_t)W * H * 4, 0.0f);
  // FrameBuffer base such that pixel (x, y) in file coords lands at
  // display-window position (x - sw.min.x, y - sw.min.y)
  const char *names[4] = {"R", "G", "B", "A"};
  FrameBuffer fb;
  for (int c = 0; c < 4; ++c) {
    char *base = (char *)(buf.data() + c) -
                 ((size_t)sw.min.y * W + sw.min.x) * 4 * sizeof(float);
    fb.insert(names[c],
              Slice(FLOAT, base, 4 * sizeof(float),
                    (size_t)W * 4 * sizeof(float), 1, 1,
                    c == 3 ? 1.0 : 0.0));  // A fill = 1 inside dataWindow
  }
  f.setFrameBuffer(fb);
  f.readPixels(dw.min.y, dw.max.y);
  (void)dW;
  FILE *out = fopen(bin_path.c_str(), "wb");
  int32_t hw[2] = {H, W};
  fwrite(hw, 4, 2, out);
  fwrite(buf.data(), sizeof(float), buf.size(), out);
  fclose(out);
  printf("wrote %s (%dx%d)\n", bin_path.c_str(), W, H);
}

// deterministic pseudo-random halfs (mix of smooth ramp, noise, negatives,
// and a flat region so B44A emits 3-byte blocks)
static half px(int x, int y, int c, int W, int H, bool flat_region) {
  if (flat_region && x >= W / 2 && y >= H / 2) return half(0.25f);
  uint32_t s = (uint32_t)(x * 73856093u) ^ (uint32_t)(y * 19349663u) ^
               (uint32_t)(c * 83492791u);
  s ^= s >> 13; s *= 0x5bd1e995u; s ^= s >> 15;
  float noise = (float)(s & 0xffff) / 65536.0f;
  float ramp = (float)(x + y) / (float)(W + H);
  float v = ramp * 4.0f + noise * 0.5f - 0.3f;
  return half(v);
}

static void write_scanline(const std::string &path, int W, int H,
                           Compression comp, bool flat, bool add_float_z,
                           Box2i *disp = nullptr) {
  Header hdr(W, H);
  if (disp) {
    hdr.displayWindow() = *disp;
    // dataWindow stays (0,0)-(W-1,H-1): a crop inside the display window
  }
  hdr.compression() = comp;
  hdr.channels().insert("R", Channel(HALF));
  hdr.channels().insert("G", Channel(HALF));
  hdr.channels().insert("B", Channel(HALF));
  std::vector<half> r(W * H), g(W * H), b(W * H);
  std::vector<float> z(W * H);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      r[y * W + x] = px(x, y, 0, W, H, flat);
      g[y * W + x] = px(x, y, 1, W, H, flat);
      b[y * W + x] = px(x, y, 2, W, H, flat);
      z[y * W + x] = 1.0f + 0.01f * (float)(x * H + y);
    }
  if (add_float_z) hdr.channels().insert("Z", Channel(FLOAT));
  OutputFile f(path.c_str(), hdr);
  FrameBuffer fb;
  fb.insert("R", Slice(HALF, (char *)r.data(), 2, 2 * W));
  fb.insert("G", Slice(HALF, (char *)g.data(), 2, 2 * W));
  fb.insert("B", Slice(HALF, (char *)b.data(), 2, 2 * W));
  if (add_float_z) fb.insert("Z", Slice(FLOAT, (char *)z.data(), 4, 4 * W));
  f.setFrameBuffer(fb);
  f.writePixels(H);
  printf("wrote %s\n", path.c_str());
}

static void write_crop(const std::string &path, Compression comp) {
  // displayWindow (0,0)-(31,23); dataWindow (8,6)-(23,17)
  Header hdr(Box2i(V2i(0, 0), V2i(31, 23)), Box2i(V2i(8, 6), V2i(23, 17)));
  hdr.compression() = comp;
  hdr.channels().insert("R", Channel(HALF));
  hdr.channels().insert("G", Channel(HALF));
  hdr.channels().insert("B", Channel(HALF));
  int W = 16, H = 12;  // data window size
  std::vector<half> r(W * H), g(W * H), b(W * H);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      r[y * W + x] = px(x, y, 0, W, H, false);
      g[y * W + x] = px(x, y, 1, W, H, false);
      b[y * W + x] = px(x, y, 2, W, H, false);
    }
  OutputFile f(path.c_str(), hdr);
  FrameBuffer fb;
  // slice base so that file pixel (8,6) maps to r[0]
  auto base = [&](half *p) {
    return (char *)p - (size_t)(6 * W + 8) * sizeof(half);
  };
  fb.insert("R", Slice(HALF, base(r.data()), 2, 2 * W));
  fb.insert("G", Slice(HALF, base(g.data()), 2, 2 * W));
  fb.insert("B", Slice(HALF, base(b.data()), 2, 2 * W));
  f.setFrameBuffer(fb);
  f.writePixels(H);
  printf("wrote %s\n", path.c_str());
}

static void write_crop_tiled(const std::string &path, Compression comp) {
  Header hdr(Box2i(V2i(0, 0), V2i(31, 23)), Box2i(V2i(5, 3), V2i(27, 19)));
  hdr.compression() = comp;
  hdr.setTileDescription(TileDescription(8, 8, ONE_LEVEL));
  hdr.channels().insert("R", Channel(HALF));
  hdr.channels().insert("G", Channel(HALF));
  int W = 23, H = 17;
  std::vector<half> r(W * H), g(W * H);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      r[y * W + x] = px(x, y, 0, W, H, false);
      g[y * W + x] = px(x, y, 1, W, H, false);
    }
  TiledOutputFile f(path.c_str(), hdr);
  FrameBuffer fb;
  auto base = [&](half *p) {
    return (char *)p - (size_t)(3 * W + 5) * sizeof(half);
  };
  fb.insert("R", Slice(HALF, base(r.data()), 2, 2 * W));
  fb.insert("G", Slice(HALF, base(g.data()), 2, 2 * W));
  f.setFrameBuffer(fb);
  f.writeTiles(0, f.numXTiles() - 1, 0, f.numYTiles() - 1);
  printf("wrote %s\n", path.c_str());
}

int main(int argc, char **argv) {
  std::string dir = argc > 1 ? argv[1] : "tests/fixtures";
  struct Job { std::string name; int kind; Compression comp; bool flat, fz; };
  // odd sizes force partial 4x4 edge blocks in B44
  write_scanline(dir + "/b44_rgb.exr", 21, 13, B44_COMPRESSION, false, false);
  write_scanline(dir + "/b44a_flat.exr", 24, 16, B44A_COMPRESSION, true, false);
  write_scanline(dir + "/b44_mixed_float.exr", 12, 9, B44_COMPRESSION, false,
                 true);
  // B44 with >32 scanlines: multiple chunks
  write_scanline(dir + "/b44_tall.exr", 10, 70, B44_COMPRESSION, false, false);
  write_scanline(dir + "/dwaa.exr", 16, 16, DWAA_COMPRESSION, false, false);
  write_crop(dir + "/crop_zip.exr", ZIP_COMPRESSION);
  write_crop(dir + "/crop_piz.exr", PIZ_COMPRESSION);
  write_crop_tiled(dir + "/crop_tiled_zip.exr", ZIP_COMPRESSION);

  const char *names[] = {"b44_rgb", "b44a_flat", "b44_mixed_float",
                         "b44_tall", "crop_zip", "crop_piz",
                         "crop_tiled_zip"};
  for (const char *n : names)
    dump_display_rgba(dir + "/" + n + ".exr", dir + "/" + n + ".bin");
  return 0;
}
