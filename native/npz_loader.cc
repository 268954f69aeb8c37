// Native npz reader + prefetch pool for the training data pipeline.
//
// The reference feeds training through TensorFlow's C++ tf.data runtime with
// a py_func npz loader (diffpiso/datamanagement.py:25-64). This library is
// the standalone equivalent: a zip/npy parser (stored and deflated members)
// plus a pthread worker pool that decodes upcoming frames into an in-memory
// cache while the accelerator is busy, so host IO never stalls the step
// loop.
//
// C API (ctypes-friendly):
//   npz_info(path, member, shape[8], &ndim, dtype[8]) -> bytes or <0
//   npz_read(path, member, out, capacity)             -> bytes or <0
//   npz_prefetch(paths, n_paths, n_threads)           -> 0 (async)
//   npz_cache_clear()
//
// member == NULL or "" selects the first member (np.savez's "arr_0.npy").

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Buffer {
  std::vector<char> data;   // raw npy member bytes
};

std::mutex g_cache_mu;
std::map<std::string, Buffer> g_cache;
constexpr size_t kMaxCacheEntries = 256;

uint16_t rd16(const unsigned char* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const unsigned char* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}

// Read a whole file into memory.
bool read_file(const std::string& path, std::vector<unsigned char>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(size);
  bool ok = fread(out->data(), 1, size, f) == (size_t)size;
  fclose(f);
  return ok;
}

struct Member {
  std::string name;
  const unsigned char* comp_data;
  uint32_t comp_size;
  uint32_t uncomp_size;
  uint16_t method;  // 0 stored, 8 deflate
};

// Parse the central directory; returns all members.
bool parse_zip(const std::vector<unsigned char>& file, std::vector<Member>* members) {
  if (file.size() < 22) return false;
  // locate EOCD (scan backward for PK\x05\x06)
  size_t eocd = std::string::npos;
  for (size_t i = file.size() - 22; i + 4 >= 4; --i) {
    if (file[i] == 'P' && file[i + 1] == 'K' && file[i + 2] == 5 && file[i + 3] == 6) {
      eocd = i;
      break;
    }
    if (i == 0) break;
  }
  if (eocd == std::string::npos) return false;
  uint16_t n_entries = rd16(&file[eocd + 10]);
  uint32_t cd_offset = rd32(&file[eocd + 16]);
  size_t p = cd_offset;
  for (int e = 0; e < n_entries; ++e) {
    if (p + 46 > file.size() || memcmp(&file[p], "PK\x01\x02", 4) != 0) return false;
    uint16_t method = rd16(&file[p + 10]);
    uint32_t comp_size = rd32(&file[p + 20]);
    uint32_t uncomp_size = rd32(&file[p + 24]);
    uint16_t name_len = rd16(&file[p + 28]);
    uint16_t extra_len = rd16(&file[p + 30]);
    uint16_t comment_len = rd16(&file[p + 32]);
    uint32_t local_off = rd32(&file[p + 42]);
    std::string name((const char*)&file[p + 46], name_len);
    // local header: skip its (possibly different) name/extra lengths
    if (local_off + 30 > file.size()) return false;
    const unsigned char* lh = &file[local_off];
    if (memcmp(lh, "PK\x03\x04", 4) != 0) return false;
    uint16_t lh_name = rd16(lh + 26);
    uint16_t lh_extra = rd16(lh + 28);
    size_t data_off = local_off + 30 + lh_name + lh_extra;
    if (data_off + comp_size > file.size()) return false;
    members->push_back(
        Member{name, &file[data_off], comp_size, uncomp_size, method});
    p += 46 + name_len + extra_len + comment_len;
  }
  return true;
}

bool inflate_member(const Member& m, std::vector<char>* out) {
  out->resize(m.uncomp_size);
  if (m.method == 0) {
    memcpy(out->data(), m.comp_data, m.uncomp_size);
    return true;
  }
  if (m.method != 8) return false;
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return false;  // raw deflate
  zs.next_in = const_cast<unsigned char*>(m.comp_data);
  zs.avail_in = m.comp_size;
  zs.next_out = (unsigned char*)out->data();
  zs.avail_out = m.uncomp_size;
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return ret == Z_STREAM_END || (ret == Z_OK && zs.avail_out == 0);
}

// Decode member (default: first) of an npz into raw npy bytes.
bool load_member(const std::string& path, const std::string& member,
                 Buffer* out) {
  {
    std::lock_guard<std::mutex> lk(g_cache_mu);
    auto it = g_cache.find(path + "::" + member);
    if (it != g_cache.end()) {
      *out = it->second;
      return true;
    }
  }
  std::vector<unsigned char> file;
  if (!read_file(path, &file)) return false;
  std::vector<Member> members;
  if (!parse_zip(file, &members) || members.empty()) return false;
  const Member* m = &members[0];
  if (!member.empty()) {
    m = nullptr;
    for (auto& cand : members) {
      if (cand.name == member || cand.name == member + ".npy") m = &cand;
    }
    if (!m) return false;
  }
  if (!inflate_member(*m, &out->data)) return false;
  return true;
}

// Parse the npy header inside `buf`; returns payload offset or <0.
// Fills shape (max 8 dims), ndim, dtype string (e.g. "<f4").
long parse_npy(const Buffer& buf, long shape[8], int* ndim, char dtype[8]) {
  const char* d = buf.data.data();
  size_t n = buf.data.size();
  if (n < 10 || memcmp(d, "\x93NUMPY", 6) != 0) return -1;
  int major = d[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = rd16((const unsigned char*)d + 8);
    header_off = 10;
  } else {
    header_len = rd32((const unsigned char*)d + 8);
    header_off = 12;
  }
  if (header_off + header_len > n) return -1;
  std::string header(d + header_off, header_len);
  // descr
  size_t dp = header.find("'descr'");
  if (dp == std::string::npos) return -1;
  size_t q1 = header.find('\'', dp + 7);
  size_t q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  strncpy(dtype, descr.c_str(), 7);
  dtype[7] = 0;
  if (header.find("'fortran_order': True") != std::string::npos) return -1;
  // shape
  size_t sp = header.find("'shape'");
  size_t p1 = header.find('(', sp);
  size_t p2 = header.find(')', p1);
  std::string shape_s = header.substr(p1 + 1, p2 - p1 - 1);
  *ndim = 0;
  const char* s = shape_s.c_str();
  while (*s && *ndim < 8) {
    while (*s == ' ' || *s == ',') ++s;
    if (!*s) break;
    shape[(*ndim)++] = strtol(s, (char**)&s, 10);
  }
  return (long)(header_off + header_len);
}

}  // namespace

extern "C" {

long npz_info(const char* path, const char* member, long shape[8], int* ndim,
              char dtype[8]) {
  Buffer buf;
  if (!load_member(path, member ? member : "", &buf)) return -1;
  long off = parse_npy(buf, shape, ndim, dtype);
  if (off < 0) return -2;
  return (long)buf.data.size() - off;  // payload bytes
}

long npz_read(const char* path, const char* member, void* out, long capacity) {
  std::string key = std::string(path) + "::" + (member ? member : "");
  Buffer buf;
  if (!load_member(path, member ? member : "", &buf)) return -1;
  long shape[8];
  int ndim;
  char dtype[8];
  long off = parse_npy(buf, shape, &ndim, dtype);
  if (off < 0) return -2;
  long payload = (long)buf.data.size() - off;
  if (payload > capacity) return -3;
  memcpy(out, buf.data.data() + off, payload);
  {
    std::lock_guard<std::mutex> lk(g_cache_mu);
    g_cache.erase(key);  // consumed; keep the cache bounded
  }
  return payload;
}

int npz_prefetch(const char** paths, int n_paths, int n_threads) {
  std::vector<std::string> todo(paths, paths + n_paths);
  if (n_threads < 1) n_threads = 1;
  auto worker = [](std::vector<std::string> mine) {
    for (auto& p : mine) {
      {
        std::lock_guard<std::mutex> lk(g_cache_mu);
        if (g_cache.size() >= kMaxCacheEntries) return;
        if (g_cache.count(p + "::")) continue;
      }
      Buffer buf;
      if (load_member(p, "", &buf)) {
        std::lock_guard<std::mutex> lk(g_cache_mu);
        if (g_cache.size() < kMaxCacheEntries) g_cache[p + "::"] = std::move(buf);
      }
    }
  };
  std::vector<std::vector<std::string>> split(n_threads);
  for (size_t i = 0; i < todo.size(); ++i) split[i % n_threads].push_back(todo[i]);
  for (int t = 0; t < n_threads; ++t) {
    std::thread(worker, std::move(split[t])).detach();
  }
  return 0;
}

void npz_cache_clear() {
  std::lock_guard<std::mutex> lk(g_cache_mu);
  g_cache.clear();
}

}  // extern "C"
