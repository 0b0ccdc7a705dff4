// gmmstore: memory-mapped feature store with asynchronous prefetch.
//
// Native replacement for the reference's per-viewpoint HDF5 reads
// (map_nav_src/utils/data.py:10-76, r2r/env.py:80-113), which SURVEY.md §6
// identifies as the preprocessing-throughput bottleneck. Records are fixed-
// shape arrays keyed by strings ("{scan}_{viewpoint}"); the whole file is
// mmap'd so a lookup is a hash probe + pointer, and a background thread pool
// warms the page cache ahead of the access pattern.
//
// File layout (little-endian):
//   [0:8)   magic "GMMSTOR1"
//   [8:12)  uint32 dtype code (0=f32, 1=f16, 2=u16, 3=i32, 4=u8)
//   [12:16) uint32 rank
//   [16:16+8*rank) uint64 dims of each record
//   [..]    uint64 record count N
//   N * { char key[64]; uint64 offset; }   // offset into data blob
//   data blob (64-byte aligned)
//
// Exposed as a C ABI for ctypes (build: make -C native).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'G', 'M', 'M', 'S', 'T', 'O', 'R', '1'};
constexpr size_t kKeyLen = 64;

struct Store {
  int fd = -1;
  uint8_t* base = nullptr;
  size_t file_size = 0;
  uint32_t dtype = 0;
  uint32_t rank = 0;
  std::vector<uint64_t> dims;
  size_t record_bytes = 0;
  std::unordered_map<std::string, uint64_t> index;  // key -> data offset
  const uint8_t* blob = nullptr;

  // prefetch machinery
  std::vector<std::thread> workers;
  std::deque<uint64_t> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<bool> stop{false};

  ~Store() { shutdown(); }

  void shutdown() {
    stop.store(true);
    cv.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
    if (base) munmap(base, file_size);
    base = nullptr;
    if (fd >= 0) close(fd);
    fd = -1;
  }

  void prefetch_loop() {
    while (!stop.load()) {
      uint64_t off;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || !queue.empty(); });
        if (stop.load()) return;
        off = queue.front();
        queue.pop_front();
      }
      // touch every page of the record to pull it into the page cache
      const uint8_t* p = blob + off;
      size_t page = static_cast<size_t>(sysconf(_SC_PAGESIZE));
      volatile uint8_t acc = 0;
      for (size_t i = 0; i < record_bytes; i += page) acc ^= p[i];
      (void)acc;
    }
  }
};

size_t dtype_size(uint32_t code) {
  switch (code) {
    case 0: return 4;  // f32
    case 1: return 2;  // f16
    case 2: return 2;  // u16
    case 3: return 4;  // i32
    case 4: return 1;  // u8
    default: return 0;
  }
}

}  // namespace

extern "C" {

void* gmm_store_open(const char* path, int num_prefetch_threads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  auto* s = new Store();
  s->fd = fd;
  s->file_size = static_cast<size_t>(st.st_size);
  if (s->file_size < 24) {  // magic + dtype + rank at minimum
    delete s;
    return nullptr;
  }
  s->base = static_cast<uint8_t*>(
      mmap(nullptr, s->file_size, PROT_READ, MAP_SHARED, fd, 0));
  if (s->base == MAP_FAILED) {
    s->base = nullptr;
    delete s;
    return nullptr;
  }
  if (memcmp(s->base, kMagic, 8) != 0) {
    delete s;  // ~Store munmaps
    return nullptr;
  }
  // Every header read is bounds-checked against the file size: a truncated
  // or corrupt file must fail cleanly, not SIGBUS the training process.
  size_t off = 8;
  auto fits = [&](size_t need) { return off + need <= s->file_size; };
  if (!fits(8)) { delete s; return nullptr; }
  memcpy(&s->dtype, s->base + off, 4);
  off += 4;
  memcpy(&s->rank, s->base + off, 4);
  off += 4;
  if (dtype_size(s->dtype) == 0 || s->rank == 0 || s->rank > 8 ||
      !fits(8 * static_cast<size_t>(s->rank) + 8)) {
    delete s;
    return nullptr;
  }
  s->dims.resize(s->rank);
  memcpy(s->dims.data(), s->base + off, 8 * s->rank);
  off += 8 * s->rank;
  uint64_t count;
  memcpy(&count, s->base + off, 8);
  off += 8;

  s->record_bytes = dtype_size(s->dtype);
  for (uint32_t i = 0; i < s->rank; ++i) {
    if (s->dims[i] == 0 || s->dims[i] > (1ull << 32)) { delete s; return nullptr; }
    s->record_bytes *= s->dims[i];
  }
  if (count > (s->file_size - off) / (kKeyLen + 8)) {  // index must fit
    delete s;
    return nullptr;
  }

  s->index.reserve(count * 2);
  for (uint64_t i = 0; i < count; ++i) {
    const char* key = reinterpret_cast<const char*>(s->base + off);
    uint64_t data_off;
    memcpy(&data_off, s->base + off + kKeyLen, 8);
    s->index.emplace(std::string(key, strnlen(key, kKeyLen)), data_off);
    off += kKeyLen + 8;
  }
  // align blob start to 64
  off = (off + 63) & ~size_t(63);
  if (off > s->file_size) { delete s; return nullptr; }
  s->blob = s->base + off;
  // every record must lie inside the blob
  const size_t blob_size = s->file_size - off;
  for (const auto& kv : s->index) {
    if (kv.second > blob_size || s->record_bytes > blob_size - kv.second) {
      delete s;
      return nullptr;
    }
  }

  for (int i = 0; i < num_prefetch_threads; ++i)
    s->workers.emplace_back([s] { s->prefetch_loop(); });
  return s;
}

void gmm_store_close(void* handle) { delete static_cast<Store*>(handle); }

uint64_t gmm_store_count(void* handle) {
  return static_cast<Store*>(handle)->index.size();
}

uint32_t gmm_store_rank(void* handle) {
  return static_cast<Store*>(handle)->rank;
}

void gmm_store_dims(void* handle, uint64_t* out) {
  auto* s = static_cast<Store*>(handle);
  memcpy(out, s->dims.data(), 8 * s->rank);
}

uint32_t gmm_store_dtype(void* handle) {
  return static_cast<Store*>(handle)->dtype;
}

uint64_t gmm_store_record_bytes(void* handle) {
  return static_cast<Store*>(handle)->record_bytes;
}

// Returns a pointer into the mapping (zero-copy) or nullptr if missing.
const void* gmm_store_get(void* handle, const char* key) {
  auto* s = static_cast<Store*>(handle);
  auto it = s->index.find(key);
  if (it == s->index.end()) return nullptr;
  return s->blob + it->second;
}

// Copy a record into caller-provided memory; returns 0 on success.
int gmm_store_read(void* handle, const char* key, void* dst) {
  const void* p = gmm_store_get(handle, key);
  if (!p) return -1;
  memcpy(dst, p, static_cast<Store*>(handle)->record_bytes);
  return 0;
}

// Queue keys for background page-cache warm-up.
void gmm_store_prefetch(void* handle, const char** keys, int n) {
  auto* s = static_cast<Store*>(handle);
  if (s->workers.empty()) return;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    for (int i = 0; i < n; ++i) {
      auto it = s->index.find(keys[i]);
      if (it != s->index.end()) s->queue.push_back(it->second);
    }
  }
  s->cv.notify_all();
}

}  // extern "C"
