// External merge sort for overlap records (ovStore build at scale).
//
// Native replacement for the reference's three-step distributed overlap
// store build — ovStoreBucketizer.C (scatter into slices), ovStoreSorter.C
// (per-slice in-memory sort), ovStoreIndexer.C (index merge) at
// /root/reference/src/stores/ — re-designed as a single-host external
// merge sort over fixed 28-byte records keyed by (a_id, b_id):
//
//   1. the input file is read in memory-budget-sized chunks; each chunk
//      is sorted by a pool of threads and written as a run file;
//   2. runs are k-way merged (binary heap over buffered readers) into
//      the output file.
//
// In-RAM tables never come here (numpy lexsort is fine); this is the
// path for stores larger than host memory (mammalian-scale overlap sets,
// 10^10 records), where the reference needed a grid.  Plain C ABI for
// ctypes.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

#pragma pack(push, 1)
struct Rec {
  uint32_t a_id;
  uint32_t b_id;
  int32_t a_bgn, a_end, b_bgn, b_end;
  uint16_t erate_q;
  uint8_t flipped;
  uint8_t pad;
};
#pragma pack(pop)
static_assert(sizeof(Rec) == 28, "record layout");

inline uint64_t key(const Rec& r) {
  return (uint64_t(r.a_id) << 32) | r.b_id;
}

struct RunReader {
  FILE* f = nullptr;
  std::vector<Rec> buf;
  size_t pos = 0, len = 0;
  bool refill() {
    len = fread(buf.data(), sizeof(Rec), buf.size(), f);
    pos = 0;
    return len > 0;
  }
  bool next(Rec* out) {
    if (pos >= len && !refill()) return false;
    *out = buf[pos++];
    return true;
  }
};

}  // namespace

extern "C" {

// Sort `in_path` (packed Rec array) by (a_id, b_id) into `out_path`.
// mem_budget: bytes of RAM for chunk sorting (min 64 MB enforced);
// n_threads: sort worker threads (0 = hardware_concurrency).
// tmp_dir: where run files go.  Returns record count, or <0 on error.
long long ovsort_file(const char* in_path, const char* out_path,
                      const char* tmp_dir, long long mem_budget,
                      int n_threads) {
  if (mem_budget < (64LL << 20)) mem_budget = 64LL << 20;
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;

  FILE* in = fopen(in_path, "rb");
  if (!in) return -1;
  fseek(in, 0, SEEK_END);
  long long fsize = ftell(in);
  fseek(in, 0, SEEK_SET);
  if (fsize % (long long)sizeof(Rec) != 0) {
    fclose(in);
    return -2;
  }
  long long n_rec = fsize / (long long)sizeof(Rec);
  long long chunk_rec = mem_budget / (long long)sizeof(Rec);
  if (chunk_rec < 1) chunk_rec = 1;

  // ---- pass 1: sorted runs ----
  std::vector<std::string> runs;
  std::vector<Rec> chunk;
  long long done = 0;
  while (done < n_rec) {
    long long take = std::min(chunk_rec, n_rec - done);
    chunk.resize((size_t)take);
    if ((long long)fread(chunk.data(), sizeof(Rec), (size_t)take, in) != take) {
      fclose(in);
      return -3;
    }
    done += take;
    // parallel sort: split into n_threads blocks, sort, then inplace_merge
    size_t nb = (size_t)std::min<long long>(n_threads, take);
    if (nb > 1) {
      std::vector<size_t> cuts(nb + 1);
      for (size_t i = 0; i <= nb; i++) cuts[i] = (size_t)take * i / nb;
      std::vector<std::thread> ts;
      for (size_t i = 0; i < nb; i++)
        ts.emplace_back([&, i] {
          std::sort(chunk.begin() + cuts[i], chunk.begin() + cuts[i + 1],
                    [](const Rec& x, const Rec& y) { return key(x) < key(y); });
        });
      for (auto& t : ts) t.join();
      for (size_t w = 1; w < nb; w *= 2)
        for (size_t i = 0; i + w < nb; i += 2 * w)
          std::inplace_merge(
              chunk.begin() + cuts[i], chunk.begin() + cuts[i + w],
              chunk.begin() + cuts[std::min(i + 2 * w, nb)],
              [](const Rec& x, const Rec& y) { return key(x) < key(y); });
    } else {
      std::sort(chunk.begin(), chunk.end(),
                [](const Rec& x, const Rec& y) { return key(x) < key(y); });
    }
    if (done >= n_rec && runs.empty()) {
      // single in-memory chunk: write the output directly
      fclose(in);
      FILE* out = fopen(out_path, "wb");
      if (!out) return -4;
      if ((long long)fwrite(chunk.data(), sizeof(Rec), chunk.size(), out) !=
          take) {
        fclose(out);
        return -5;
      }
      fclose(out);
      return n_rec;
    }
    std::string rp = std::string(tmp_dir) + "/ovsort_run" +
                     std::to_string(runs.size()) + ".bin";
    FILE* rf = fopen(rp.c_str(), "wb");
    if (!rf) {
      fclose(in);
      return -4;
    }
    if ((long long)fwrite(chunk.data(), sizeof(Rec), chunk.size(), rf) != take) {
      fclose(rf);
      fclose(in);
      return -5;
    }
    fclose(rf);
    runs.push_back(rp);
  }
  fclose(in);
  chunk.clear();
  chunk.shrink_to_fit();

  // ---- pass 2: k-way merge ----
  size_t k = runs.size();
  size_t rbuf = std::max<size_t>(4096, (size_t)(mem_budget / (long long)((k + 1) * sizeof(Rec))));
  std::vector<RunReader> rd(k);
  for (size_t i = 0; i < k; i++) {
    rd[i].f = fopen(runs[i].c_str(), "rb");
    if (!rd[i].f) return -6;
    rd[i].buf.resize(rbuf);
  }
  FILE* out = fopen(out_path, "wb");
  if (!out) return -4;
  std::vector<Rec> wbuf;
  wbuf.reserve(rbuf);

  // binary heap of (key, run, rec)
  struct Head {
    uint64_t k;
    uint32_t run;
    Rec r;
  };
  auto gt = [](const Head& a, const Head& b) { return a.k > b.k; };
  std::vector<Head> heap;
  heap.reserve(k);
  for (size_t i = 0; i < k; i++) {
    Rec r;
    if (rd[i].next(&r)) heap.push_back({key(r), (uint32_t)i, r});
  }
  std::make_heap(heap.begin(), heap.end(), gt);
  long long written = 0;
  while (!heap.empty()) {
    std::pop_heap(heap.begin(), heap.end(), gt);
    Head h = heap.back();
    heap.pop_back();
    wbuf.push_back(h.r);
    if (wbuf.size() == rbuf) {
      if (fwrite(wbuf.data(), sizeof(Rec), wbuf.size(), out) != wbuf.size()) {
        fclose(out);
        return -5;
      }
      written += (long long)wbuf.size();
      wbuf.clear();
    }
    Rec nr;
    if (rd[h.run].next(&nr)) {
      heap.push_back({key(nr), h.run, nr});
      std::push_heap(heap.begin(), heap.end(), gt);
    }
  }
  if (!wbuf.empty()) {
    if (fwrite(wbuf.data(), sizeof(Rec), wbuf.size(), out) != wbuf.size()) {
      fclose(out);
      return -5;
    }
    written += (long long)wbuf.size();
  }
  fclose(out);
  for (size_t i = 0; i < k; i++) {
    fclose(rd[i].f);
    remove(runs[i].c_str());
  }
  return written + (long long)0;
}

}  // extern "C"
