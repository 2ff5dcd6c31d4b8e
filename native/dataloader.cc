// Native data loader for packed VQ-code shards.
//
// TPU-native counterpart of the reference's torch DataLoader with 24 worker
// processes over 1.28M micro .npy files
// (/root/reference/autoregressive/train/train_c2i.py:125-140): instead,
// shards are memory-mapped flat binaries and a background thread assembles
// shuffled batches into a ring buffer, so the training loop's host time is
// one memcpy per batch.
//
// Shard format (written by llamagen_tpu.data.codes.pack_shards_raw):
//   u32 magic = 0x4C47434Eu ("LGCN"), u32 version = 1
//   u64 num_samples, u32 seq_len, u32 reserved
//   i16 codes[num_samples * seq_len]
//   i16 labels[num_samples]
//
// C ABI (used via ctypes from llamagen_tpu.data.native):
//   void* lg_open(const char** paths, int n_paths, int batch, long seed,
//                 int queue_depth);
//   int   lg_seq_len(void* h);
//   long  lg_num_samples(void* h);
//   int   lg_next(void* h, int* codes_out, int* labels_out);  // 1 ok
//   void  lg_close(void* h);

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x4C47434Eu;

struct Shard {
  const int16_t* codes = nullptr;
  const int16_t* labels = nullptr;
  uint64_t num = 0;
  void* map = nullptr;
  size_t map_size = 0;
};

struct Batch {
  std::vector<int32_t> codes;
  std::vector<int32_t> labels;
};

struct Loader {
  std::vector<Shard> shards;
  uint64_t total = 0;
  uint32_t seq_len = 0;
  int batch = 0;
  int queue_depth = 4;

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::queue<Batch> ready;
  std::atomic<bool> stop{false};
  uint64_t seed = 0;

  ~Loader() {
    stop.store(true);
    cv_put.notify_all();
    cv_get.notify_all();
    if (worker.joinable()) worker.join();
    for (auto& s : shards) {
      if (s.map) munmap(s.map, s.map_size);
    }
  }

  void locate(uint64_t idx, const int16_t** codes, const int16_t** label) const {
    for (const auto& s : shards) {
      if (idx < s.num) {
        *codes = s.codes + idx * seq_len;
        *label = s.labels + idx;
        return;
      }
      idx -= s.num;
    }
    *codes = nullptr;
    *label = nullptr;
  }

  void run() {
    std::mt19937_64 rng(seed);
    std::vector<uint64_t> order(total);
    for (uint64_t i = 0; i < total; ++i) order[i] = i;
    uint64_t cursor = total;  // trigger reshuffle on first use

    while (!stop.load()) {
      Batch b;
      b.codes.resize(static_cast<size_t>(batch) * seq_len);
      b.labels.resize(batch);
      for (int i = 0; i < batch; ++i) {
        if (cursor >= total) {
          std::shuffle(order.begin(), order.end(), rng);
          cursor = 0;
        }
        const int16_t* c;
        const int16_t* l;
        locate(order[cursor++], &c, &l);
        for (uint32_t j = 0; j < seq_len; ++j) {
          b.codes[static_cast<size_t>(i) * seq_len + j] = c[j];
        }
        b.labels[i] = *l;
      }
      std::unique_lock<std::mutex> lock(mu);
      cv_put.wait(lock, [&] {
        return stop.load() || ready.size() < static_cast<size_t>(queue_depth);
      });
      if (stop.load()) return;
      ready.push(std::move(b));
      cv_get.notify_one();
    }
  }
};

bool map_shard(const std::string& path, uint32_t* seq_len, Shard* out) {
  int fd = open(path.c_str(), O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return false;
  }
  if (st.st_size < 24) {  // smaller than the header: corrupt/truncated
    close(fd);
    return false;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (map == MAP_FAILED) return false;
  const uint8_t* p = static_cast<const uint8_t*>(map);
  uint32_t magic, version, slen;
  uint64_t num;
  std::memcpy(&magic, p, 4);
  std::memcpy(&version, p + 4, 4);
  std::memcpy(&num, p + 8, 8);
  std::memcpy(&slen, p + 16, 4);
  if (magic != kMagic || version != 1) {
    munmap(map, st.st_size);
    return false;
  }
  if (*seq_len == 0) *seq_len = slen;
  if (slen != *seq_len) {
    munmap(map, st.st_size);
    return false;
  }
  // the header's num_samples must be backed by real bytes — a shard
  // truncated mid-write (packer killed, disk full) would otherwise send
  // the reader walking off the mapping (SIGSEGV, no Python traceback)
  const uint64_t need =
      24 + num * static_cast<uint64_t>(slen) * 2 + num * 2;
  if (static_cast<uint64_t>(st.st_size) < need) {
    munmap(map, st.st_size);
    return false;
  }
  out->map = map;
  out->map_size = st.st_size;
  out->num = num;
  out->codes = reinterpret_cast<const int16_t*>(p + 24);
  out->labels = out->codes + num * slen;
  return true;
}

}  // namespace

extern "C" {

void* lg_open(const char** paths, int n_paths, int batch, long seed,
              int queue_depth) {
  auto* loader = new Loader();
  loader->batch = batch;
  loader->seed = static_cast<uint64_t>(seed);
  loader->queue_depth = queue_depth > 0 ? queue_depth : 4;
  uint32_t seq_len = 0;
  for (int i = 0; i < n_paths; ++i) {
    Shard s;
    if (!map_shard(paths[i], &seq_len, &s)) {
      delete loader;
      return nullptr;
    }
    loader->total += s.num;
    loader->shards.push_back(s);
  }
  if (loader->total == 0) {
    delete loader;
    return nullptr;
  }
  loader->seq_len = seq_len;
  loader->worker = std::thread([loader] { loader->run(); });
  return loader;
}

int lg_seq_len(void* h) { return static_cast<Loader*>(h)->seq_len; }

long lg_num_samples(void* h) {
  return static_cast<long>(static_cast<Loader*>(h)->total);
}

int lg_next(void* h, int32_t* codes_out, int32_t* labels_out) {
  auto* loader = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lock(loader->mu);
  loader->cv_get.wait(lock, [&] {
    return loader->stop.load() || !loader->ready.empty();
  });
  if (loader->ready.empty()) return 0;
  Batch b = std::move(loader->ready.front());
  loader->ready.pop();
  loader->cv_put.notify_one();
  lock.unlock();
  std::memcpy(codes_out, b.codes.data(), b.codes.size() * sizeof(int32_t));
  std::memcpy(labels_out, b.labels.data(), b.labels.size() * sizeof(int32_t));
  return 1;
}

void lg_close(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
