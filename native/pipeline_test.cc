// Self-test for the decode pipeline's concurrency (run under TSAN via
// `make test`, SURVEY §5.2's race-detection requirement for the host
// pipeline). Uses a stub decoder (no FFmpeg) so the test isolates the
// queueing/ownership logic: N producers submit, M workers "decode", one
// consumer drains; every buffer must come back exactly once.

#include <atomic>
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <set>
#include <thread>
#include <vector>

extern "C" {
void* pvtp_create(int num_threads, int capacity);
int pvtp_submit(void* p, uint64_t req_id, const char* path, int64_t start,
                int64_t end, int out_h, int out_w);
uint8_t* pvtp_wait(void* p, uint64_t* req_id, int64_t* frames, int* h,
                   int* w);
void pvtp_release(void* p, uint8_t* data);
void pvtp_destroy(void* p);

// Stub decoder symbols (override decode.cc by linking this file with
// pipeline.cc only): "decode" writes req-id-tagged bytes.
void* pvt_open(const char* path) {
  // encode the numeric "path" as the handle (values offset to stay nonzero)
  return reinterpret_cast<void*>(std::strtoull(path, nullptr, 10) + 1);
}
int pvt_width(void*) { return 4; }
int pvt_height(void*) { return 2; }
int64_t pvt_decode_range_scaled(void* handle, int64_t start, int64_t end,
                                uint8_t* out, int out_h, int out_w) {
  const uint64_t tag = reinterpret_cast<uint64_t>(handle) - 1;
  const int64_t n = end - start;
  std::memset(out, static_cast<int>(tag % 251), n * out_h * out_w * 3);
  return n;
}
void pvt_close(void*) {}
}

int main() {
  const int kProducers = 4;
  const int kWorkers = 3;
  const int kPerProducer = 200;

  void* p = pvtp_create(kWorkers, 8);
  std::atomic<int> submit_fail{0};

  std::vector<std::thread> producers;
  for (int pi = 0; pi < kProducers; ++pi) {
    producers.emplace_back([&, pi] {
      char path[32];
      for (int i = 0; i < kPerProducer; ++i) {
        const uint64_t id = static_cast<uint64_t>(pi) * kPerProducer + i;
        std::snprintf(path, sizeof(path), "%llu",
                      static_cast<unsigned long long>(id));
        if (pvtp_submit(p, id, path, 0, 3, 2, 4) != 0) ++submit_fail;
      }
    });
  }

  std::set<uint64_t> seen;
  const int total = kProducers * kPerProducer;
  for (int i = 0; i < total; ++i) {
    uint64_t id = ~0ull;
    int64_t frames = 0;
    int h = 0, w = 0;
    uint8_t* buf = pvtp_wait(p, &id, &frames, &h, &w);
    assert(buf != nullptr);
    assert(frames == 3 && h == 2 && w == 4);
    assert(buf[0] == static_cast<uint8_t>(id % 251));  // right payload
    assert(seen.insert(id).second);                    // exactly once
    pvtp_release(p, buf);
  }

  for (auto& t : producers) t.join();
  assert(submit_fail.load() == 0);
  assert(static_cast<int>(seen.size()) == total);

  pvtp_destroy(p);
  std::printf("pipeline_test OK (%d clips, %d workers, %d producers)\n",
              total, kWorkers, kProducers);
  return 0;
}
