// Multi-threaded clip-decode pipeline (the host-side "decode service",
// SURVEY §2.9): a worker pool decodes clip requests (path, frame range,
// optional rescale) through the FFmpeg decoder in decode.cc into
// pre-sized staging buffers, and a completion queue hands them to the
// consumer. This is the C++ replacement for the reference's
// DataLoader-worker decode fan-out (PyAV in forked python processes) —
// threads instead of processes, zero-copy handoff to numpy via ctypes.
//
// Concurrency design (TSAN-clean, see pipeline_test.cc / `make test`):
// one mutex per queue + condition variables; buffers are owned by exactly
// one side at any time (submit -> pending queue -> one worker -> done
// queue -> consumer -> pvtp_release). Decoders are per-request (FFmpeg
// contexts are not thread-safe across requests; open cost is amortized by
// clip length).
//
// C ABI (consumed by pytorchvideo_tpu/data/native_pipeline.py):
//   pvtp_create(num_threads, capacity)
//   pvtp_submit(p, req_id, path, start, end, out_h, out_w)
//   pvtp_wait(p, &req_id, &frames, &h, &w)  -> buffer ptr or null
//   pvtp_release(p, buf)
//   pvtp_destroy(p)
//
// Build: make -C native  (part of libpvt_decode.so)

#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {
void* pvt_open(const char* path);
int pvt_width(void* h);
int pvt_height(void* h);
int64_t pvt_decode_range_scaled(void* handle, int64_t start, int64_t end,
                                uint8_t* out, int out_h, int out_w);
void pvt_close(void* handle);
}

namespace {

struct Request {
  uint64_t id = 0;
  std::string path;
  int64_t start = 0;
  int64_t end = 0;
  int out_h = 0;  // 0 = native
  int out_w = 0;
};

struct Result {
  uint64_t id = 0;
  int64_t frames = -1;  // -1: decode failed
  int h = 0;
  int w = 0;
  uint8_t* data = nullptr;
};

struct Pipeline {
  std::mutex mu;
  std::condition_variable cv_submit;  // waits: workers (pending non-empty)
  std::condition_variable cv_done;    // waits: consumer (done non-empty)
  std::condition_variable cv_space;   // waits: producers (pending has room)
  std::deque<Request> pending;
  std::deque<Result> done;
  size_t capacity = 8;
  size_t in_flight = 0;  // pending + being decoded (for drain on destroy)
  bool shutdown = false;
  std::vector<std::thread> workers;
};

void worker_loop(Pipeline* p) {
  for (;;) {
    Request req;
    {
      std::unique_lock<std::mutex> lock(p->mu);
      p->cv_submit.wait(lock,
                        [p] { return p->shutdown || !p->pending.empty(); });
      if (p->pending.empty()) return;  // shutdown with drained queue
      req = std::move(p->pending.front());
      p->pending.pop_front();
      p->cv_space.notify_one();
    }

    Result res;
    res.id = req.id;
    void* dec = pvt_open(req.path.c_str());
    if (dec) {
      res.h = req.out_h > 0 ? req.out_h : pvt_height(dec);
      res.w = req.out_w > 0 ? req.out_w : pvt_width(dec);
      const int64_t want = req.end - req.start;
      res.data = static_cast<uint8_t*>(
          std::malloc(static_cast<size_t>(want) * res.h * res.w * 3));
      if (res.data) {
        res.frames = pvt_decode_range_scaled(dec, req.start, req.end,
                                             res.data, res.h, res.w);
        if (res.frames < 0) {
          std::free(res.data);
          res.data = nullptr;
        }
      }
      pvt_close(dec);
    }

    {
      std::unique_lock<std::mutex> lock(p->mu);
      p->done.push_back(res);
      --p->in_flight;
      p->cv_done.notify_one();
    }
  }
}

}  // namespace

extern "C" {

void* pvtp_create(int num_threads, int capacity) {
  Pipeline* p = new Pipeline();
  if (capacity > 0) p->capacity = static_cast<size_t>(capacity);
  if (num_threads < 1) num_threads = 1;
  for (int i = 0; i < num_threads; ++i) {
    p->workers.emplace_back(worker_loop, p);
  }
  return p;
}

// Blocks while the pending queue is at capacity. Returns 0, or -1 after
// shutdown.
int pvtp_submit(void* handle, uint64_t req_id, const char* path,
                int64_t start, int64_t end, int out_h, int out_w) {
  Pipeline* p = static_cast<Pipeline*>(handle);
  std::unique_lock<std::mutex> lock(p->mu);
  p->cv_space.wait(lock, [p] {
    return p->shutdown || p->pending.size() < p->capacity;
  });
  if (p->shutdown) return -1;
  Request req;
  req.id = req_id;
  req.path = path;
  req.start = start;
  req.end = end;
  req.out_h = out_h;
  req.out_w = out_w;
  p->pending.push_back(std::move(req));
  ++p->in_flight;
  p->cv_submit.notify_one();
  return 0;
}

// Number of requests submitted but not yet waited on.
int64_t pvtp_outstanding(void* handle) {
  Pipeline* p = static_cast<Pipeline*>(handle);
  std::unique_lock<std::mutex> lock(p->mu);
  return static_cast<int64_t>(p->in_flight + p->done.size());
}

// Blocks until a completed request is available (a plain blocking dequeue —
// the caller is responsible for matching wait count to submit count; use
// pvtp_outstanding to introspect). Returns the frame buffer
// ((frames, h, w, 3) uint8, owned by the caller until pvtp_release), or
// nullptr if that request's decode failed (req_id/frames still report the
// failure: frames == -1).
uint8_t* pvtp_wait(void* handle, uint64_t* req_id, int64_t* frames, int* h,
                   int* w) {
  Pipeline* p = static_cast<Pipeline*>(handle);
  std::unique_lock<std::mutex> lock(p->mu);
  p->cv_done.wait(lock, [p] { return !p->done.empty(); });
  Result res = p->done.front();
  p->done.pop_front();
  *req_id = res.id;
  *frames = res.frames;
  *h = res.h;
  *w = res.w;
  return res.data;
}

void pvtp_release(void* handle, uint8_t* data) {
  (void)handle;
  std::free(data);
}

void pvtp_destroy(void* handle) {
  Pipeline* p = static_cast<Pipeline*>(handle);
  {
    std::unique_lock<std::mutex> lock(p->mu);
    p->shutdown = true;
    p->cv_submit.notify_all();
    p->cv_space.notify_all();
  }
  for (auto& t : p->workers) t.join();
  for (auto& r : p->done) {
    if (r.data) std::free(r.data);
  }
  delete p;
}

}  // extern "C"
