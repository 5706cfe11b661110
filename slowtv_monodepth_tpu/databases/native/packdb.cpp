// PackDB native reader: mmap + zero-copy binary-search key lookup.
//
// The TPU-native replacement for the reference's LMDB C library
// (`src/external_libs/databases/database.py:41` uses py-lmdb). A pack file is
// a single append-only blob with a sorted hash index in its footer; this
// library mmaps the file once per process and answers key -> (offset, length)
// queries in O(log n) with no per-open index materialization (the Python
// fallback must build a dict). Read-only and thread-safe: loader worker
// threads share one handle.
//
// File format (little-endian):
//   [0]   8B   magic "SPKD0001"
//   [8]   u64  index_offset
//   [16]  ...  record bytes
//   [index_offset]
//         u64  n_keys
//         n *  {u64 hash, u64 offset, u64 length, u64 key_off, u64 key_len}
//              (sorted by (hash, key bytes))
//         keys blob (utf-8, concatenated)
//         u64  meta_len, meta blob (pickled dict, parsed in Python)
//
// Build: make -C slowtv_monodepth_tpu/databases/native
// Python binding: ctypes (see packdb.py).

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'S', 'P', 'K', 'D', '0', '0', '0', '1'};

struct Entry {
  uint64_t hash;
  uint64_t offset;
  uint64_t length;
  uint64_t key_off;
  uint64_t key_len;
};

struct Handle {
  const uint8_t* base = nullptr;
  size_t size = 0;
  const Entry* entries = nullptr;
  const char* keys_blob = nullptr;
  uint64_t n = 0;
  const uint8_t* meta = nullptr;
  uint64_t meta_len = 0;
};

uint64_t fnv1a(const char* data, uint64_t len) {
  uint64_t h = 0xCBF29CE484222325ULL;  // FNV-1a 64 offset basis.
  for (uint64_t i = 0; i < len; ++i) {
    h ^= static_cast<uint8_t>(data[i]);
    h *= 0x100000001B3ULL;  // FNV-1a 64 prime.
  }
  return h;
}

}  // namespace

extern "C" {

// Open a pack file; returns nullptr on any format/IO error.
void* pk_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;

  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 16) {
    ::close(fd);
    return nullptr;
  }

  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  ::close(fd);  // mmap keeps its own reference.
  if (mem == MAP_FAILED) return nullptr;

  const uint8_t* base = static_cast<const uint8_t*>(mem);
  if (memcmp(base, kMagic, 8) != 0) {
    munmap(mem, st.st_size);
    return nullptr;
  }

  uint64_t index_offset;
  memcpy(&index_offset, base + 8, 8);
  if (index_offset + 8 > static_cast<uint64_t>(st.st_size)) {
    munmap(mem, st.st_size);
    return nullptr;
  }

  Handle* h = new Handle();
  h->base = base;
  h->size = st.st_size;
  memcpy(&h->n, base + index_offset, 8);
  h->entries = reinterpret_cast<const Entry*>(base + index_offset + 8);
  h->keys_blob = reinterpret_cast<const char*>(h->entries + h->n);

  // Meta footer: locate via the end of the keys blob (last entry).
  const uint8_t* after_keys = reinterpret_cast<const uint8_t*>(h->keys_blob);
  if (h->n > 0) {
    const Entry& last = h->entries[h->n - 1];
    after_keys += last.key_off + last.key_len;
  }
  memcpy(&h->meta_len, after_keys, 8);
  h->meta = after_keys + 8;
  return h;
}

uint64_t pk_len(void* handle) {
  return handle ? static_cast<Handle*>(handle)->n : 0;
}

// Key lookup: 0 = found (off/len filled), -1 = missing.
int pk_get(void* handle, const char* key, uint64_t key_len,
           uint64_t* off, uint64_t* len) {
  if (!handle) return -1;
  const Handle* h = static_cast<Handle*>(handle);
  const uint64_t target = fnv1a(key, key_len);

  // Lower-bound binary search on hash.
  uint64_t lo = 0, hi = h->n;
  while (lo < hi) {
    uint64_t mid = (lo + hi) / 2;
    if (h->entries[mid].hash < target) lo = mid + 1;
    else hi = mid;
  }
  // Walk hash collisions comparing raw key bytes.
  for (; lo < h->n && h->entries[lo].hash == target; ++lo) {
    const Entry& e = h->entries[lo];
    if (e.key_len == key_len &&
        memcmp(h->keys_blob + e.key_off, key, key_len) == 0) {
      *off = e.offset;
      *len = e.length;
      return 0;
    }
  }
  return -1;
}

// i-th key (index order = sorted by hash). Returns pointer into the mmap.
const char* pk_key(void* handle, uint64_t i, uint64_t* key_len) {
  const Handle* h = static_cast<Handle*>(handle);
  if (!h || i >= h->n) return nullptr;
  *key_len = h->entries[i].key_len;
  return h->keys_blob + h->entries[i].key_off;
}

// Record bytes pointer for zero-copy reads from Python (memoryview).
const uint8_t* pk_data(void* handle, uint64_t off) {
  return static_cast<Handle*>(handle)->base + off;
}

const uint8_t* pk_meta(void* handle, uint64_t* meta_len) {
  const Handle* h = static_cast<Handle*>(handle);
  *meta_len = h->meta_len;
  return h->meta;
}

void pk_close(void* handle) {
  if (!handle) return;
  Handle* h = static_cast<Handle*>(handle);
  munmap(const_cast<uint8_t*>(h->base), h->size);
  delete h;
}

}  // extern "C"
