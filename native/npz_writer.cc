// Native npz writer + async flush pool for the datagen pipeline.
//
// The reference writes Scene frames through numpy's savez_compressed
// (PhiFlow/phi/data/fluidformat.py write_sim_frame -> np.savez_compressed),
// which serializes zlib compression on the Python thread and stalls the
// simulation loop during datagen. This library is the standalone native
// twin of npz_loader.cc on the WRITE side: it assembles the npy members and
// the zip container in C++ (deflate via zlib, CRC32, central directory) and
// can run whole-file writes on a background thread pool so the step loop
// never waits on host compression.
//
// C API (ctypes-friendly):
//   npz_write(path, n, names[], descrs[], ndims[], shapes[], datas[],
//             nbytes[], level)                       -> 0 or <0
//   npz_write_async(... same ...)                    -> 0   (enqueued)
//   npz_write_wait()                                 -> pending-error count
//
// level: zlib level 0-9 (0 = stored, matching np.savez; >0 matches
// np.savez_compressed). File layout matches numpy's: one "<name>.npy"
// member per array, npy format 1.0, 64-byte-aligned header.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

void put16(std::vector<char>& b, uint16_t v) {
  b.push_back(char(v & 0xff));
  b.push_back(char((v >> 8) & 0xff));
}

void put32(std::vector<char>& b, uint32_t v) {
  for (int i = 0; i < 4; i++) b.push_back(char((v >> (8 * i)) & 0xff));
}

std::vector<char> npy_bytes(const char* descr, const int64_t* shape,
                            int ndim, const char* data, size_t nbytes) {
  std::string header = "{'descr': '";
  header += descr;
  header += "', 'fortran_order': False, 'shape': (";
  for (int i = 0; i < ndim; i++) {
    char tmp[32];
    snprintf(tmp, sizeof tmp, "%lld", (long long)shape[i]);
    header += tmp;
    if (ndim == 1 || i + 1 < ndim) header += ",";
    if (i + 1 < ndim) header += " ";
  }
  header += "), }";
  // pad with spaces so magic(6)+ver(2)+hlen(2)+header is 64-aligned, \n last
  size_t base = 6 + 2 + 2;
  size_t total = base + header.size() + 1;
  size_t pad = (64 - (total % 64)) % 64;
  header.append(pad, ' ');
  header += '\n';

  std::vector<char> out;
  out.reserve(base + header.size() + nbytes);
  const char magic[] = "\x93NUMPY";
  out.insert(out.end(), magic, magic + 6);
  out.push_back(1);
  out.push_back(0);
  put16(out, uint16_t(header.size()));
  out.insert(out.end(), header.begin(), header.end());
  out.insert(out.end(), data, data + nbytes);
  return out;
}

// raw-deflate (zip method 8) a buffer; returns empty on error
std::vector<char> deflate_raw(const std::vector<char>& in, int level) {
  z_stream zs;
  std::memset(&zs, 0, sizeof zs);
  if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY) != Z_OK)
    return {};
  std::vector<char> out(deflateBound(&zs, in.size()));
  zs.next_in = (Bytef*)in.data();
  zs.avail_in = uInt(in.size());
  zs.next_out = (Bytef*)out.data();
  zs.avail_out = uInt(out.size());
  int rc = deflate(&zs, Z_FINISH);
  deflateEnd(&zs);
  if (rc != Z_STREAM_END) return {};
  out.resize(zs.total_out);
  return out;
}

struct Member {
  std::string name;          // "<name>.npy"
  std::vector<char> payload; // compressed or stored bytes
  uint32_t crc;
  uint32_t raw_size;
  uint16_t method;           // 0 stored, 8 deflate
  uint32_t offset;           // local header offset
};

int write_npz_file(const std::string& path,
                   const std::vector<std::string>& names,
                   const std::vector<std::vector<char>>& npys, int level) {
  std::vector<Member> members(names.size());
  for (size_t i = 0; i < names.size(); i++) {
    Member& m = members[i];
    m.name = names[i] + ".npy";
    m.raw_size = uint32_t(npys[i].size());
    m.crc = uint32_t(
        crc32(0, (const Bytef*)npys[i].data(), uInt(npys[i].size())));
    if (level > 0) {
      m.payload = deflate_raw(npys[i], level);
      m.method = 8;
      if (m.payload.empty() || m.payload.size() >= npys[i].size()) {
        m.payload = npys[i];  // incompressible: store
        m.method = 0;
      }
    } else {
      m.payload = npys[i];
      m.method = 0;
    }
  }

  std::vector<char> out;
  for (auto& m : members) {
    m.offset = uint32_t(out.size());
    put32(out, 0x04034b50);          // local file header
    put16(out, 20);                  // version needed
    put16(out, 0);                   // flags
    put16(out, m.method);
    put16(out, 0);                   // mod time
    put16(out, 0);                   // mod date
    put32(out, m.crc);
    put32(out, uint32_t(m.payload.size()));
    put32(out, m.raw_size);
    put16(out, uint16_t(m.name.size()));
    put16(out, 0);                   // extra len
    out.insert(out.end(), m.name.begin(), m.name.end());
    out.insert(out.end(), m.payload.begin(), m.payload.end());
  }
  uint32_t cd_start = uint32_t(out.size());
  for (auto& m : members) {
    put32(out, 0x02014b50);          // central directory header
    put16(out, 20);
    put16(out, 20);
    put16(out, 0);
    put16(out, m.method);
    put16(out, 0);
    put16(out, 0);
    put32(out, m.crc);
    put32(out, uint32_t(m.payload.size()));
    put32(out, m.raw_size);
    put16(out, uint16_t(m.name.size()));
    put16(out, 0);
    put16(out, 0);
    put16(out, 0);                   // disk number
    put16(out, 0);                   // internal attrs
    put32(out, 0);                   // external attrs
    put32(out, m.offset);
    out.insert(out.end(), m.name.begin(), m.name.end());
  }
  uint32_t cd_size = uint32_t(out.size()) - cd_start;
  put32(out, 0x06054b50);            // end of central directory
  put16(out, 0);
  put16(out, 0);
  put16(out, uint16_t(members.size()));
  put16(out, uint16_t(members.size()));
  put32(out, cd_size);
  put32(out, cd_start);
  put16(out, 0);

  std::string tmp = path + ".tmp";
  FILE* f = fopen(tmp.c_str(), "wb");
  if (!f) return -1;
  size_t n = fwrite(out.data(), 1, out.size(), f);
  fclose(f);
  if (n != out.size()) {
    remove(tmp.c_str());
    return -2;
  }
  if (rename(tmp.c_str(), path.c_str()) != 0) {
    remove(tmp.c_str());
    return -3;
  }
  return 0;
}

struct Job {
  std::string path;
  std::vector<std::string> names;
  std::vector<std::vector<char>> npys;
  int level;
};

// The pool state is heap-allocated and INTENTIONALLY LEAKED: with static
// globals, C++ exit-time destructors would destroy the condition_variable
// while detached workers are blocked in wait() on it — glibc's
// pthread_cond_destroy then blocks until there are no waiters, hanging the
// whole process at interpreter shutdown (observed: examples/smoke_datagen.py
// completed, printed its summary, and never exited). Leaking the state means
// no destructor ever runs; the detached threads die with the process.
struct PoolState {
  std::mutex mu;
  std::condition_variable cv;
  std::queue<Job> jobs;
  int active = 0;
  int errors = 0;
  std::vector<std::thread> pool;
};

PoolState& pool_state() {
  static PoolState* s = new PoolState();  // never deleted (see above)
  return *s;
}

void worker() {
  PoolState& s = pool_state();
  for (;;) {
    Job job;
    {
      std::unique_lock<std::mutex> lk(s.mu);
      s.cv.wait(lk, [&s] { return !s.jobs.empty(); });
      job = std::move(s.jobs.front());
      s.jobs.pop();
      s.active++;
    }
    int rc = write_npz_file(job.path, job.names, job.npys, job.level);
    {
      std::unique_lock<std::mutex> lk(s.mu);
      s.active--;
      if (rc != 0) s.errors++;
    }
    s.cv.notify_all();
  }
}

void ensure_pool() {
  PoolState& s = pool_state();
  if (!s.pool.empty()) return;
  unsigned n = std::thread::hardware_concurrency();
  if (n < 2) n = 2;
  if (n > 8) n = 8;
  for (unsigned i = 0; i < n; i++) {
    s.pool.emplace_back(worker);
    // detached: the pool lives for the process; joinable std::thread
    // destructors at exit would call std::terminate
    s.pool.back().detach();
  }
}

Job build_job(const char* path, int n, const char** names,
              const char** descrs, const int* ndims, const int64_t* shapes,
              const char** datas, const int64_t* nbytes, int level) {
  Job job;
  job.path = path;
  job.level = level;
  const int64_t* sp = shapes;
  for (int i = 0; i < n; i++) {
    job.names.emplace_back(names[i]);
    job.npys.push_back(
        npy_bytes(descrs[i], sp, ndims[i], datas[i], size_t(nbytes[i])));
    sp += ndims[i];
  }
  return job;
}

}  // namespace

extern "C" {

int npz_write(const char* path, int n, const char** names,
              const char** descrs, const int* ndims, const int64_t* shapes,
              const char** datas, const int64_t* nbytes, int level) {
  Job job = build_job(path, n, names, descrs, ndims, shapes, datas, nbytes,
                      level);
  return write_npz_file(job.path, job.names, job.npys, job.level);
}

int npz_write_async(const char* path, int n, const char** names,
                    const char** descrs, const int* ndims,
                    const int64_t* shapes, const char** datas,
                    const int64_t* nbytes, int level) {
  Job job = build_job(path, n, names, descrs, ndims, shapes, datas, nbytes,
                      level);
  PoolState& s = pool_state();
  {
    std::unique_lock<std::mutex> lk(s.mu);
    ensure_pool();
    s.jobs.push(std::move(job));
  }
  s.cv.notify_one();
  return 0;
}

// blocks until every queued write lands; returns (and resets) the error count
int npz_write_wait() {
  PoolState& s = pool_state();
  std::unique_lock<std::mutex> lk(s.mu);
  s.cv.wait(lk, [&s] { return s.jobs.empty() && s.active == 0; });
  int e = s.errors;
  s.errors = 0;
  return e;
}

}  // extern "C"
