// pcis_io — native host-side I/O for the TPU segmentation framework.
//
// The reference's I/O is tifffile/libtiff via Python (split_zstack.py:50,64);
// here the hot path (uncompressed grayscale TIFF strips feeding the device
// loader) is a small C++ library with a ctypes ABI:
//
//   * read classic little-endian TIFFs (uncompressed, grayscale 8/16-bit,
//     single or multi page) straight into a caller buffer;
//   * write single-page uncompressed TIFFs;
//   * a pthread prefetch pool that decodes a list of files ahead of the
//     consumer (overlapping host decode with device compute).
//
// Compressed/exotic TIFFs fall back to the PIL codec on the Python side.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <thread>
#include <mutex>
#include <condition_variable>
#include <queue>
#include <atomic>

extern "C" {

// ---------------------------------------------------------------------------
// TIFF structures (classic, little-endian only)
// ---------------------------------------------------------------------------

struct TiffPageInfo {
  uint32_t width;
  uint32_t height;
  uint32_t bits_per_sample;   // 8 or 16
  uint32_t samples_per_pixel; // 1 (grayscale)
};

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  bool ok = true;
  uint16_t u16(size_t off) const { return off + 2 <= n ? (uint16_t)(p[off] | p[off + 1] << 8) : 0; }
  uint32_t u32(size_t off) const {
    return off + 4 <= n ? (uint32_t)(p[off] | p[off + 1] << 8 | p[off + 2] << 16 | (uint32_t)p[off + 3] << 24) : 0;
  }
};

struct Ifd {
  uint32_t width = 0, height = 0, bps = 8, spp = 1, compression = 1;
  uint32_t rows_per_strip = 0xffffffff;
  std::vector<uint64_t> strip_offsets, strip_counts;
  uint32_t next = 0;
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize((size_t)sz);
  size_t got = fread(out.data(), 1, (size_t)sz, f);
  fclose(f);
  return got == (size_t)sz;
}

// Parse one IFD at offset; returns false on structural error.
bool parse_ifd(const Reader& r, uint32_t off, Ifd* ifd) {
  if (off + 2 > r.n) return false;
  uint16_t count = r.u16(off);
  size_t base = off + 2;
  if (base + 12ull * count + 4 > r.n) return false;
  for (uint16_t i = 0; i < count; i++) {
    size_t e = base + 12ull * i;
    uint16_t tag = r.u16(e), type = r.u16(e + 2);
    uint32_t cnt = r.u32(e + 4);
    auto value_at = [&](uint32_t idx) -> uint64_t {
      size_t elt = type == 3 ? 2 : 4;  // SHORT or LONG
      size_t total = elt * cnt;
      size_t voff = total <= 4 ? e + 8 : r.u32(e + 8);
      size_t p = voff + elt * idx;
      return type == 3 ? (uint64_t)r.u16(p) : (uint64_t)r.u32(p);
    };
    switch (tag) {
      case 256: ifd->width = (uint32_t)value_at(0); break;
      case 257: ifd->height = (uint32_t)value_at(0); break;
      case 258: ifd->bps = (uint32_t)value_at(0); break;
      case 259: ifd->compression = (uint32_t)value_at(0); break;
      case 277: ifd->spp = (uint32_t)value_at(0); break;
      case 278: ifd->rows_per_strip = (uint32_t)value_at(0); break;
      case 273:
        ifd->strip_offsets.resize(cnt);
        for (uint32_t k = 0; k < cnt; k++) ifd->strip_offsets[k] = value_at(k);
        break;
      case 279:
        ifd->strip_counts.resize(cnt);
        for (uint32_t k = 0; k < cnt; k++) ifd->strip_counts[k] = value_at(k);
        break;
      default: break;
    }
  }
  ifd->next = r.u32(base + 12ull * count);
  return true;
}

// Walk IFD chain; fills pages. Returns false if not a supported TIFF.
bool parse_tiff(const std::vector<uint8_t>& buf, std::vector<Ifd>& pages) {
  Reader r{buf.data(), buf.size()};
  if (buf.size() < 8 || buf[0] != 'I' || buf[1] != 'I' || r.u16(2) != 42) return false;
  uint32_t off = r.u32(4);
  int guard = 0;
  while (off && guard++ < 65536) {
    Ifd ifd;
    if (!parse_ifd(r, off, &ifd)) return false;
    pages.push_back(ifd);
    off = ifd.next;
  }
  return !pages.empty();
}

}  // namespace

// Inspect: returns number of pages (≤0 on error / unsupported) and fills
// info with page-0 geometry.  Unsupported (compressed, big-endian, RGB)
// files return 0 so Python falls back to PIL.
int pcis_tiff_inspect(const char* path, TiffPageInfo* info) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return -1;
  std::vector<Ifd> pages;
  if (!parse_tiff(buf, pages)) return 0;
  for (const auto& p : pages) {
    if (p.compression != 1 || p.spp != 1 || (p.bps != 8 && p.bps != 16) ||
        p.width == 0 || p.height == 0 || p.strip_offsets.empty())
      return 0;
    // mixed-geometry multipage files (embedded thumbnails / pyramid levels)
    // would be packed misaligned into the (pages, h0, w0) caller buffer —
    // punt those to the PIL fallback
    if (p.width != pages[0].width || p.height != pages[0].height ||
        p.bps != pages[0].bps)
      return 0;
  }
  info->width = pages[0].width;
  info->height = pages[0].height;
  info->bits_per_sample = pages[0].bps;
  info->samples_per_pixel = pages[0].spp;
  return (int)pages.size();
}

// Read all pages into out (caller-allocated: pages*height*width*(bps/8)
// bytes, row-major, page-major).  Returns 0 on success.
int pcis_tiff_read(const char* path, uint8_t* out, uint64_t out_size) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return -1;
  std::vector<Ifd> pages;
  if (!parse_tiff(buf, pages)) return -2;
  for (const auto& p : pages)  // same geometry guard as inspect
    if (p.width != pages[0].width || p.height != pages[0].height ||
        p.bps != pages[0].bps)
      return -5;
  uint64_t cursor = 0;
  for (const auto& p : pages) {
    uint64_t page_bytes = (uint64_t)p.width * p.height * (p.bps / 8);
    uint64_t written = 0;
    for (size_t s = 0; s < p.strip_offsets.size(); s++) {
      uint64_t off = p.strip_offsets[s], cnt = p.strip_counts[s];
      if (off + cnt > buf.size() || cursor + written + cnt > out_size) return -3;
      if (written + cnt > page_bytes) cnt = page_bytes - written;
      memcpy(out + cursor + written, buf.data() + off, cnt);
      written += cnt;
    }
    if (written != page_bytes) return -4;
    cursor += page_bytes;
  }
  return 0;
}

// Write a single-page uncompressed grayscale TIFF (8 or 16 bit).
int pcis_tiff_write(const char* path, const uint8_t* data, uint32_t height,
                    uint32_t width, uint32_t bits_per_sample) {
  if (bits_per_sample != 8 && bits_per_sample != 16) return -1;
  uint64_t nbytes = (uint64_t)height * width * (bits_per_sample / 8);
  // layout: header(8) + data + IFD
  uint32_t data_off = 8;
  uint32_t ifd_off = (uint32_t)(8 + nbytes + (nbytes & 1));  // word-align
  FILE* f = fopen(path, "wb");
  if (!f) return -2;
  uint8_t header[8] = {'I', 'I', 42, 0, 0, 0, 0, 0};
  memcpy(header + 4, &ifd_off, 4);
  fwrite(header, 1, 8, f);
  fwrite(data, 1, nbytes, f);
  if (nbytes & 1) fputc(0, f);

  auto entry = [&](uint16_t tag, uint16_t type, uint32_t cnt, uint32_t val) {
    fwrite(&tag, 2, 1, f);
    fwrite(&type, 2, 1, f);
    fwrite(&cnt, 4, 1, f);
    fwrite(&val, 4, 1, f);
  };
  uint16_t n = 8;
  fwrite(&n, 2, 1, f);
  entry(256, 4, 1, width);             // ImageWidth
  entry(257, 4, 1, height);            // ImageLength
  entry(258, 3, 1, bits_per_sample);   // BitsPerSample
  entry(259, 3, 1, 1);                 // Compression = none
  entry(262, 3, 1, 1);                 // Photometric = BlackIsZero
  entry(273, 4, 1, data_off);          // StripOffsets
  entry(278, 4, 1, height);            // RowsPerStrip
  entry(279, 4, 1, (uint32_t)nbytes);  // StripByteCounts
  uint32_t zero = 0;
  fwrite(&zero, 4, 1, f);  // next IFD
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// threaded prefetch pool
// ---------------------------------------------------------------------------

struct Prefetcher {
  std::vector<std::string> paths;
  std::vector<std::vector<uint8_t>> results;  // decoded pixel buffers
  std::vector<int> status;                    // -1 pending, 0 ok, >0 error
  std::queue<size_t> work;
  std::mutex mu;
  std::condition_variable cv_done;
  std::vector<std::thread> threads;
  std::atomic<int> remaining{0};

  void worker() {
    for (;;) {
      size_t idx;
      {
        std::lock_guard<std::mutex> g(mu);
        if (work.empty()) return;
        idx = work.front();
        work.pop();
      }
      TiffPageInfo info;
      int pages = pcis_tiff_inspect(paths[idx].c_str(), &info);
      int st = 1;
      if (pages > 0) {
        uint64_t sz = (uint64_t)pages * info.height * info.width * (info.bits_per_sample / 8);
        std::vector<uint8_t> buf(sz);
        if (pcis_tiff_read(paths[idx].c_str(), buf.data(), sz) == 0) {
          st = 0;
          std::lock_guard<std::mutex> g(mu);
          results[idx] = std::move(buf);
        }
      }
      {
        std::lock_guard<std::mutex> g(mu);
        status[idx] = st;
      }
      remaining--;
      cv_done.notify_all();
    }
  }
};

void* pcis_prefetch_start(const char** path_array, int n_paths, int n_threads) {
  auto* p = new Prefetcher();
  p->paths.assign(path_array, path_array + n_paths);
  p->results.resize(n_paths);
  p->status.assign(n_paths, -1);
  p->remaining = n_paths;
  for (int i = 0; i < n_paths; i++) p->work.push((size_t)i);
  for (int t = 0; t < n_threads; t++)
    p->threads.emplace_back(&Prefetcher::worker, p);
  return p;
}

// Blocks until item idx is decoded; returns its byte size (0 on error).
uint64_t pcis_prefetch_wait(void* handle, int idx) {
  auto* p = (Prefetcher*)handle;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [&] { return p->status[idx] != -1; });
  return p->status[idx] == 0 ? p->results[idx].size() : 0;
}

// Copy decoded bytes for idx into out and free them. Returns 0 on success.
int pcis_prefetch_take(void* handle, int idx, uint8_t* out, uint64_t out_size) {
  auto* p = (Prefetcher*)handle;
  std::lock_guard<std::mutex> g(p->mu);
  if (p->status[idx] != 0 || p->results[idx].size() != out_size) return -1;
  memcpy(out, p->results[idx].data(), out_size);
  p->results[idx].clear();
  p->results[idx].shrink_to_fit();
  return 0;
}

void pcis_prefetch_free(void* handle) {
  auto* p = (Prefetcher*)handle;
  for (auto& t : p->threads) t.join();
  delete p;
}

}  // extern "C"
