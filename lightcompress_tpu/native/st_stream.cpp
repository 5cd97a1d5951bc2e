// Native safetensors shard streamer (C++): mmap-backed zero-copy tensor
// access for multi-GB checkpoint loads.
//
// The reference's headline capability — quantizing 405B/671B checkpoints on
// one host — lives or dies on IO: loading shards through Python readers
// copies every tensor at least once.  This streamer mmaps each shard and
// hands Python raw (offset, length) views into the data section; the OS
// pages bytes in lazily as the loader consumes tensors block by block, so
// peak RSS stays at the working set, not the checkpoint size.
//
// C ABI (consumed via ctypes — no pybind11 in this toolchain):
//   sts_open(path)        -> handle (>=0) | -errno
//   sts_header_len(h)     -> length of the header JSON
//   sts_header(h)         -> pointer to the (NUL-terminated) header JSON
//   sts_data(h)           -> pointer to the data section (after header)
//   sts_data_len(h)       -> data section length in bytes
//   sts_advise_seq(h)     -> madvise(SEQUENTIAL) for linear sweeps
//   sts_close(h)
//
// Format: https://github.com/huggingface/safetensors — 8-byte LE header
// length, then header JSON, then the tensor data section.

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct Shard {
  void *map = nullptr;
  size_t map_len = 0;
  uint64_t header_len = 0;
  bool used = false;
};

std::vector<Shard> g_shards;
std::mutex g_mu;

}  // namespace

extern "C" {

int sts_open(const char *path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8) {
    ::close(fd);
    return -2;
  }
  void *m = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);  // mapping persists
  if (m == MAP_FAILED) return -3;
  uint64_t hlen;
  memcpy(&hlen, m, 8);  // little-endian on all targets we build for
  if (8 + hlen > (uint64_t)st.st_size) {
    munmap(m, (size_t)st.st_size);
    return -4;
  }
  std::lock_guard<std::mutex> lk(g_mu);
  Shard s;
  s.map = m;
  s.map_len = (size_t)st.st_size;
  s.header_len = hlen;
  s.used = true;
  for (size_t i = 0; i < g_shards.size(); ++i) {
    if (!g_shards[i].used) {
      g_shards[i] = s;
      return (int)i;
    }
  }
  g_shards.push_back(s);
  return (int)g_shards.size() - 1;
}

static Shard *get(int h) {
  if (h < 0 || (size_t)h >= g_shards.size() || !g_shards[h].used)
    return nullptr;
  return &g_shards[h];
}

uint64_t sts_header_len(int h) {
  Shard *s = get(h);
  return s ? s->header_len : 0;
}

const char *sts_header(int h) {
  Shard *s = get(h);
  return s ? (const char *)s->map + 8 : nullptr;
}

const uint8_t *sts_data(int h) {
  Shard *s = get(h);
  return s ? (const uint8_t *)s->map + 8 + s->header_len : nullptr;
}

uint64_t sts_data_len(int h) {
  Shard *s = get(h);
  return s ? s->map_len - 8 - s->header_len : 0;
}

void sts_advise_seq(int h) {
  Shard *s = get(h);
  if (s) madvise(s->map, s->map_len, MADV_SEQUENTIAL);
}

void sts_close(int h) {
  std::lock_guard<std::mutex> lk(g_mu);
  Shard *s = get(h);
  if (!s) return;
  munmap(s->map, s->map_len);
  s->used = false;
  s->map = nullptr;
}

}  // extern "C"
