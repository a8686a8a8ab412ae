// Threaded host-side batch prefetcher for the data pipeline.
//
// The reference feeds its trainer through torch DataLoader worker processes
// (`/root/reference/TCDiff.py:181-196`, 0.75*cpus workers): per batch it
// np.loads one 301x438 float32 music-feature file per sample. This library
// is the TPU build's native equivalent: a C++ thread pool that parses .npy
// files directly into a preallocated pinned staging buffer, with a bounded
// queue of in-flight batches so host IO overlaps device compute.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O2 -std=c++17 -shared -fPIC -pthread prefetch.cc -o libprefetch.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- npy parse
// Minimal .npy reader for C-order little-endian arrays (the only layout the
// feature extractor writes). Returns false on malformed files.
bool read_npy_f32(const std::string& path, float* out, int64_t expect_elems) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  unsigned char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6) != 0) {
    std::fclose(f);
    return false;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major >= 2) {
    unsigned char b[4];
    if (std::fread(b, 1, 4, f) != 4) { std::fclose(f); return false; }
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
  } else {
    unsigned char b[2];
    if (std::fread(b, 1, 2, f) != 2) { std::fclose(f); return false; }
    header_len = b[0] | (b[1] << 8);
  }
  std::string header(header_len, '\0');
  if (std::fread(header.data(), 1, header_len, f) != header_len) {
    std::fclose(f);
    return false;
  }
  const bool f32 = header.find("'<f4'") != std::string::npos;
  const bool f64 = header.find("'<f8'") != std::string::npos;
  const bool fortran = header.find("'fortran_order': True") != std::string::npos;
  if (!f32 && !f64) {
    std::fclose(f);
    return false;
  }
  // fortran_order needs the shape to un-transpose; parse "'shape': (a, b)"
  int64_t rows = 0, cols = 0;
  if (fortran) {
    auto pos = header.find("'shape': (");
    if (pos == std::string::npos ||
        std::sscanf(header.c_str() + pos, "'shape': (%ld, %ld)", &rows, &cols) != 2 ||
        rows * cols != expect_elems) {
      std::fclose(f);
      return false;  // only 2-D fortran arrays are supported
    }
  }
  size_t got;
  std::vector<float> staging;
  float* dst = out;
  if (fortran) {
    staging.resize(expect_elems);
    dst = staging.data();
  }
  if (f32) {
    got = std::fread(dst, sizeof(float), expect_elems, f);
  } else {
    std::vector<double> tmp(expect_elems);
    got = std::fread(tmp.data(), sizeof(double), expect_elems, f);
    for (size_t i = 0; i < got; ++i) dst[i] = static_cast<float>(tmp[i]);
  }
  std::fclose(f);
  if (got < static_cast<size_t>(expect_elems)) {
    std::memset(dst + got, 0, (expect_elems - got) * sizeof(float));
  }
  if (fortran) {  // column-major (rows, cols) -> row-major
    for (int64_t c = 0; c < cols; ++c)
      for (int64_t r = 0; r < rows; ++r)
        out[r * cols + c] = staging[c * rows + r];
  }
  return true;
}

// ------------------------------------------------------------------- pool
struct Batch {
  int64_t id;
  std::vector<float> data;  // (batch, elems_per_item)
  std::atomic<int> remaining;
  bool ok = true;
  explicit Batch(int64_t id_, size_t elems, int items)
      : id(id_), data(elems), remaining(items) {}
};

struct Prefetcher {
  std::vector<std::string> files;
  int64_t elems_per_item;
  int n_threads;

  struct Job {
    Batch* batch;
    int slot;
    int file_idx;
  };

  std::mutex mu;
  std::condition_variable cv_job, cv_done;
  std::queue<Job> jobs;
  // completion can happen out of order; delivery must follow submit order
  std::map<int64_t, Batch*> done;
  std::vector<std::thread> threads;
  bool stopping = false;
  int64_t next_id = 0;
  int64_t next_pop = 0;

  Prefetcher(std::vector<std::string> files_, int64_t elems, int threads_)
      : files(std::move(files_)), elems_per_item(elems), n_threads(threads_) {
    for (int i = 0; i < n_threads; ++i) {
      threads.emplace_back([this] { worker(); });
    }
  }

  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv_job.notify_all();
    for (auto& t : threads) t.join();
    std::lock_guard<std::mutex> lk(mu);
    for (auto& kv : done) delete kv.second;
    done.clear();
  }

  void worker() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [this] { return stopping || !jobs.empty(); });
        if (stopping) return;
        job = jobs.front();
        jobs.pop();
      }
      float* dst = job.batch->data.data() + int64_t(job.slot) * elems_per_item;
      bool ok = read_npy_f32(files[job.file_idx], dst, elems_per_item);
      if (!ok) job.batch->ok = false;
      if (job.batch->remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        done.emplace(job.batch->id, job.batch);
        cv_done.notify_all();
      }
    }
  }

  int64_t submit(const int64_t* indices, int n) {
    auto* batch = new Batch(next_id++, size_t(n) * elems_per_item, n);
    {
      std::lock_guard<std::mutex> lk(mu);
      for (int i = 0; i < n; ++i) {
        jobs.push(Job{batch, i, static_cast<int>(indices[i])});
      }
    }
    cv_job.notify_all();
    return batch->id;
  }

  // pops batches strictly in SUBMIT order; returns the id, or -1 on failure
  int64_t next(float* out, int64_t out_elems) {
    Batch* b;
    {
      std::unique_lock<std::mutex> lk(mu);
      const int64_t want = next_pop++;
      cv_done.wait(lk, [this, want] { return done.count(want) > 0; });
      b = done[want];
      done.erase(want);
    }
    int64_t id = b->ok ? b->id : -1;
    int64_t n = std::min<int64_t>(out_elems, b->data.size());
    std::memcpy(out, b->data.data(), n * sizeof(float));
    delete b;
    return id;
  }
};

}  // namespace

extern "C" {

void* pf_create(const char** paths, int64_t n_paths, int64_t elems_per_item,
                int n_threads) {
  std::vector<std::string> files(paths, paths + n_paths);
  return new Prefetcher(std::move(files), elems_per_item, n_threads);
}

int64_t pf_submit(void* handle, const int64_t* indices, int n) {
  return static_cast<Prefetcher*>(handle)->submit(indices, n);
}

int64_t pf_next(void* handle, float* out, int64_t out_elems) {
  return static_cast<Prefetcher*>(handle)->next(out, out_elems);
}

void pf_destroy(void* handle) { delete static_cast<Prefetcher*>(handle); }

int pf_read_npy_f32(const char* path, float* out, int64_t elems) {
  return read_npy_f32(path, out, elems) ? 1 : 0;
}

}  // extern "C"
