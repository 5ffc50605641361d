// Native video decode service (FFmpeg/libav) for pytorchvideo_tpu.
//
// The reference delegates decoding to PyAV/torchvision/decord (SURVEY §2.9);
// this is the first-party TPU-host equivalent: frame-accurate seek + decode
// into caller-provided RGB24 buffers through a minimal C ABI (consumed via
// ctypes in pytorchvideo_tpu/data/encoded_video_native.py).
//
// Build: make -C native  (produces libpvt_decode.so)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <mutex>
#include <new>

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVFrame* rgb = nullptr;
  AVPacket* pkt = nullptr;
  int stream_index = -1;
  int width = 0;
  int height = 0;
  double fps = 0.0;
  int64_t num_frames = 0;
  double duration = 0.0;
  int64_t next_frame = 0;  // next frame index the demuxer will produce
  int sws_h = 0;           // current swscale target (rebuilt on change)
  int sws_w = 0;
  char error[256] = {0};
};

void set_error(Decoder* d, const char* msg) {
  std::strncpy(d->error, msg, sizeof(d->error) - 1);
}

int64_t pts_to_frame(const Decoder* d, int64_t pts) {
  const AVStream* st = d->fmt->streams[d->stream_index];
  const double sec = pts * av_q2d(st->time_base);
  return static_cast<int64_t>(sec * d->fps + 0.5);
}

}  // namespace

extern "C" {

// Opens a container; returns an opaque handle or nullptr.
void* pvt_open(const char* path) {
  Decoder* d = new (std::nothrow) Decoder();
  if (!d) return nullptr;

  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    delete d;
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  const AVCodec* decoder = nullptr;
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &decoder, 0);
  if (d->stream_index < 0 || !decoder) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  AVStream* st = d->fmt->streams[d->stream_index];
  d->codec = avcodec_alloc_context3(decoder);
  avcodec_parameters_to_context(d->codec, st->codecpar);
  d->codec->thread_count = 0;  // auto
  if (avcodec_open2(d->codec, decoder, nullptr) < 0) {
    avcodec_free_context(&d->codec);
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  d->width = d->codec->width;
  d->height = d->codec->height;
  AVRational fr = av_guess_frame_rate(d->fmt, st, nullptr);
  d->fps = (fr.num && fr.den) ? av_q2d(fr) : 30.0;
  if (st->nb_frames > 0) {
    d->num_frames = st->nb_frames;
  } else if (st->duration > 0) {
    d->num_frames =
        static_cast<int64_t>(st->duration * av_q2d(st->time_base) * d->fps + 0.5);
  } else if (d->fmt->duration > 0) {
    d->num_frames = static_cast<int64_t>(
        (d->fmt->duration / (double)AV_TIME_BASE) * d->fps + 0.5);
  }
  d->duration = d->num_frames / d->fps;
  d->frame = av_frame_alloc();
  d->rgb = av_frame_alloc();
  d->pkt = av_packet_alloc();
  return d;
}

int pvt_width(void* h) { return static_cast<Decoder*>(h)->width; }
int pvt_height(void* h) { return static_cast<Decoder*>(h)->height; }
double pvt_fps(void* h) { return static_cast<Decoder*>(h)->fps; }
int64_t pvt_num_frames(void* h) { return static_cast<Decoder*>(h)->num_frames; }
double pvt_duration(void* h) { return static_cast<Decoder*>(h)->duration; }
const char* pvt_error(void* h) { return static_cast<Decoder*>(h)->error; }

// Decode frames [start, end) into out (end-start, out_h, out_w, 3) uint8
// RGB, rescaling with bilinear swscale when (out_h, out_w) differs from the
// native size. Returns the number of frames written, or -1 on failure.
int64_t pvt_decode_range_scaled(void* handle, int64_t start, int64_t end,
                                uint8_t* out, int out_h, int out_w) {
  Decoder* d = static_cast<Decoder*>(handle);
  if (!d || start < 0 || end <= start) return -1;
  if (out_h <= 0) out_h = d->height;
  if (out_w <= 0) out_w = d->width;
  AVStream* st = d->fmt->streams[d->stream_index];

  if (start < d->next_frame || start > d->next_frame + 64) {
    // Seek to the keyframe at/before start, then decode forward.
    const int64_t target_pts =
        static_cast<int64_t>(start / d->fps / av_q2d(st->time_base));
    if (av_seek_frame(d->fmt, d->stream_index, target_pts,
                      AVSEEK_FLAG_BACKWARD) < 0) {
      set_error(d, "seek failed");
      return -1;
    }
    avcodec_flush_buffers(d->codec);
    d->next_frame = -1;  // unknown until the first decoded frame's pts
  }

  if (!d->sws || d->sws_h != out_h || d->sws_w != out_w) {
    if (d->sws) sws_freeContext(d->sws);
    d->sws = sws_getContext(d->width, d->height, d->codec->pix_fmt, out_w,
                            out_h, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                            nullptr, nullptr);
    if (!d->sws) {
      set_error(d, "sws_getContext failed");
      return -1;
    }
    d->sws_h = out_h;
    d->sws_w = out_w;
  }

  const int64_t want = end - start;
  int64_t written = 0;
  bool draining = false;
  while (written < want) {
    int ret = avcodec_receive_frame(d->codec, d->frame);
    if (ret == AVERROR(EAGAIN)) {
      if (draining) break;
      ret = av_read_frame(d->fmt, d->pkt);
      if (ret < 0) {
        avcodec_send_packet(d->codec, nullptr);  // start drain
        draining = true;
        continue;
      }
      if (d->pkt->stream_index == d->stream_index) {
        avcodec_send_packet(d->codec, d->pkt);
      }
      av_packet_unref(d->pkt);
      continue;
    }
    if (ret == AVERROR_EOF || ret < 0) break;

    int64_t idx;
    const int64_t pts = d->frame->best_effort_timestamp;
    if (pts != AV_NOPTS_VALUE) {
      idx = pts_to_frame(d, pts);
    } else {
      idx = (d->next_frame < 0) ? 0 : d->next_frame;
    }
    d->next_frame = idx + 1;
    if (idx < start) {
      av_frame_unref(d->frame);
      continue;  // pre-roll from keyframe
    }
    if (idx >= end) {
      av_frame_unref(d->frame);
      break;
    }
    uint8_t* dst[1] = {out + (idx - start) * out_h * out_w * 3};
    int dst_stride[1] = {out_w * 3};
    sws_scale(d->sws, d->frame->data, d->frame->linesize, 0, d->height, dst,
              dst_stride);
    ++written;
    av_frame_unref(d->frame);
  }
  return written;
}

// Native-resolution decode (original ABI).
int64_t pvt_decode_range(void* handle, int64_t start, int64_t end,
                         uint8_t* out) {
  return pvt_decode_range_scaled(handle, start, end, out, 0, 0);
}

void pvt_close(void* handle) {
  Decoder* d = static_cast<Decoder*>(handle);
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->frame) av_frame_free(&d->frame);
  if (d->rgb) av_frame_free(&d->rgb);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

}  // extern "C"
