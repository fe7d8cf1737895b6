// Sanitizer harness for fastq_codec.cpp: drives every entry point over
// the generated fixtures, including concurrent range readers (the
// io/parallel_ingest.py usage pattern) so TSAN sees the real thread
// interleavings.  Build via `make asan` / `make tsan`.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <sys/stat.h>
#include <thread>
#include <vector>

extern "C" {
void* fastq_open(const char* path, int gz, size_t chunk_bytes);
void* fastq_open_range(const char* path, size_t chunk_bytes, uint64_t start,
                       uint64_t end);
void fastq_close(void* h);
uint64_t fastq_total_reads(void* h);
uint64_t fastq_tell(void* h);
int fastq_has_pending(void* h);
int64_t fastq_next_batch(void* h, int64_t cap, int64_t width, int8_t* bases,
                         int8_t* quals, int32_t* lengths);
int64_t fastq_next_batch_packed(void* h, int64_t cap, int64_t width,
                                uint8_t* packed, int32_t* lengths,
                                int64_t cap_exc, int32_t* exc_idx,
                                int8_t* exc_val, int64_t* exc_count,
                                int8_t* quals);
int64_t fastq_scan_max_len(const char* path, int gz, size_t limit,
                           int* first_is_dna, int* second_is_dna);
}

static uint64_t drain_plain(const std::string& path, int gz) {
  void* h = fastq_open(path.c_str(), gz, 1 << 16);
  if (!h) {
    fprintf(stderr, "open failed: %s\n", path.c_str());
    exit(1);
  }
  int64_t width = 64;
  std::vector<int8_t> bases, quals;
  std::vector<int32_t> lengths(256);
  uint64_t total = 0;
  while (true) {
    bases.assign(256 * width, 0);
    quals.assign(256 * width, 0);
    int64_t n = fastq_next_batch(h, 256, width, bases.data(), quals.data(),
                                 lengths.data());
    if (n == 0) break;
    if (n < 0) {
      width = -n + (32 - (-n % 32)) % 32;
      continue;
    }
    total += n;
  }
  fastq_close(h);
  return total;
}

static uint64_t drain_packed_range(const std::string& path, uint64_t start,
                                   uint64_t end) {
  void* h = fastq_open_range(path.c_str(), 1 << 16, start, end);
  if (!h) exit(2);
  int64_t width = 64;
  int64_t cap_exc = 128;
  uint64_t total = 0;
  while (true) {
    std::vector<uint8_t> packed(256 * width / 4, 0);
    std::vector<int32_t> lengths(256);
    std::vector<int32_t> exc_idx(cap_exc);
    std::vector<int8_t> exc_val(cap_exc);
    int64_t ne = 0;
    int64_t n = fastq_next_batch_packed(h, 256, width, packed.data(),
                                        lengths.data(), cap_exc,
                                        exc_idx.data(), exc_val.data(), &ne,
                                        nullptr);
    if (n == 0) break;
    if (n == -1) {
      cap_exc = -ne > cap_exc * 2 ? -ne : cap_exc * 2;
      continue;
    }
    if (n < -1) {
      width = -n + (32 - (-n % 32)) % 32;
      continue;
    }
    total += n;
    (void)fastq_tell(h);
    (void)fastq_has_pending(h);
  }
  fastq_close(h);
  return total;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s fixture_dir\n", argv[0]);
    return 1;
  }
  std::string dir = argv[1];
  int f = 0, s = 0;
  fastq_scan_max_len((dir + "/plain.fastq").c_str(), 0, 1 << 20, &f, &s);

  uint64_t plain = drain_plain(dir + "/plain.fastq", 0);
  uint64_t gz = drain_plain(dir + "/multi.fastq.gz", 1);
  uint64_t odd = drain_plain(dir + "/odd.fastq", 0);
  if (plain != 5000 || gz != 5000 || odd != 2) {
    fprintf(stderr, "count mismatch: plain=%llu gz=%llu odd=%llu\n",
            (unsigned long long)plain, (unsigned long long)gz,
            (unsigned long long)odd);
    return 3;
  }

  // concurrent range readers over the same file (parallel_ingest pattern)
  struct stat st;
  stat((dir + "/plain.fastq").c_str(), &st);
  uint64_t size = st.st_size;
  const int T = 4;
  std::vector<uint64_t> counts(T, 0);
  std::vector<std::thread> threads;
  // byte ranges: split naively, align by probing for "@read" at a line
  // start (the python aligner is more careful; for the harness the
  // fixture's '@read' prefix makes naive alignment exact)
  std::vector<uint64_t> bounds(T + 1, 0);
  bounds[T] = size;
  std::string blob;
  {
    FILE* fp = fopen((dir + "/plain.fastq").c_str(), "rb");
    blob.resize(size);
    if (fread(blob.data(), 1, size, fp) != size) return 4;
    fclose(fp);
  }
  for (int t = 1; t < T; ++t) {
    uint64_t target = size * t / T;
    while (target < size) {
      if (blob.compare(target, 5, "@read") == 0 &&
          (target == 0 || blob[target - 1] == '\n')) {
        // confirm a '+' line two lines down
        size_t p = blob.find('\n', target);
        p = blob.find('\n', p + 1);
        if (p != std::string::npos && blob[p + 1] == '+') break;
      }
      ++target;
    }
    bounds[t] = target;
  }
  for (int t = 0; t < T; ++t) {
    threads.emplace_back([&, t] {
      counts[t] = drain_packed_range(dir + "/plain.fastq", bounds[t],
                                     bounds[t + 1]);
    });
  }
  for (auto& th : threads) th.join();
  uint64_t sum = 0;
  for (auto c : counts) sum += c;
  if (sum != 5000) {
    fprintf(stderr, "range sum mismatch: %llu\n", (unsigned long long)sum);
    return 5;
  }
  printf("codec harness OK (plain=%llu gz=%llu odd=%llu ranges=%llu)\n",
         (unsigned long long)plain, (unsigned long long)gz,
         (unsigned long long)odd, (unsigned long long)sum);
  return 0;
}
