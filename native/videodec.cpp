// Native video decoder: libavformat/libavcodec/libswscale-backed frame
// sampler.
//
// TPU-native replacement for the decord C++ dependency the reference uses
// for video decode (`/root/reference/internvl/train/dataset.py:17,106-108`,
// `stage1_train.py:527`): one sequential decode pass per clip that grabs the
// `num_segments` uniformly-spaced segment-middle frames (index math matches
// `get_index`, `stage1_train.py:488-500`, implemented host-side in
// aigv_assessor_tpu/data/video.py and passed in as explicit indices), with
// optional fused bilinear/bicubic resize to the model input size so the
// Python layer receives ready [T, H, W, 3] uint8 buffers.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;

  ~Reader() {
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (stream_index < 0) return -3;
    AVStream* st = fmt->streams[stream_index];
    const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!dec) return -4;
    codec = avcodec_alloc_context3(dec);
    if (!codec) return -5;
    if (avcodec_parameters_to_context(codec, st->codecpar) < 0) return -6;
    codec->thread_count = 0;  // auto
    if (avcodec_open2(codec, dec, nullptr) < 0) return -7;
    return 0;
  }

  AVStream* stream() const { return fmt->streams[stream_index]; }
};

}  // namespace

extern "C" {

// Probe frame count and fps. frame count falls back to duration * fps when
// the container does not record nb_frames (decord exposes len(vr) the same
// way). Returns 0 on success.
int vd_probe(const char* path, int64_t* n_frames, double* fps) {
  Reader r;
  if (int rc = r.open(path); rc != 0) return rc;
  AVStream* st = r.stream();
  AVRational fr = av_guess_frame_rate(r.fmt, st, nullptr);
  double f = (fr.num && fr.den) ? av_q2d(fr) : 30.0;
  int64_t n = st->nb_frames;
  if (n <= 0) {
    double dur = 0;
    if (st->duration > 0)
      dur = st->duration * av_q2d(st->time_base);
    else if (r.fmt->duration > 0)
      dur = (double)r.fmt->duration / AV_TIME_BASE;
    n = (int64_t)(dur * f + 0.5);
  }
  if (n <= 0) {
    // last resort: demux-count packets (no decode)
    AVPacket* pkt = av_packet_alloc();
    n = 0;
    while (av_read_frame(r.fmt, pkt) >= 0) {
      if (pkt->stream_index == r.stream_index) n++;
      av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
  }
  *n_frames = n;
  *fps = f;
  return 0;
}

// Probe native frame dimensions from the stream's codec parameters — no
// decode, no frame buffer. Lets decode_at_indices size its output exactly
// instead of decoding a probe frame into a worst-case 8K buffer per video.
int vd_probe_dims(const char* path, int* width, int* height) {
  Reader r;
  if (int rc = r.open(path); rc != 0) return rc;
  AVCodecParameters* par = r.stream()->codecpar;
  if (par->width <= 0 || par->height <= 0) return -8;
  *width = par->width;
  *height = par->height;
  return 0;
}

// Decode the frames at `indices` (sorted ascending, n_indices of them) in one
// sequential pass; write RGB24 into `out` which must hold
// n_indices * out_h * out_w * 3 bytes. out_w/out_h == 0 means native size
// (then *native_w/*native_h report it; the buffer must be large enough —
// callers probe first). Returns number of frames written, or negative error.
int vd_decode_frames(const char* path, const int64_t* indices, int n_indices,
                     int out_w, int out_h, uint8_t* out, int* native_w,
                     int* native_h) {
  Reader r;
  if (int rc = r.open(path); rc != 0) return rc;

  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  SwsContext* sws = nullptr;
  int64_t frame_no = 0;
  int next = 0;  // next wanted index position
  int written = 0;
  int tw = out_w, th = out_h;

  auto emit = [&](AVFrame* f) {
    if (tw == 0) {
      tw = f->width;
      th = f->height;
    }
    if (native_w) *native_w = f->width;
    if (native_h) *native_h = f->height;
    if (!sws) {
      sws = sws_getContext(f->width, f->height, (AVPixelFormat)f->format, tw,
                           th, AV_PIX_FMT_RGB24, SWS_BICUBIC, nullptr, nullptr,
                           nullptr);
    }
    uint8_t* dst[1] = {out + (size_t)written * th * tw * 3};
    int dst_linesize[1] = {tw * 3};
    sws_scale(sws, f->data, f->linesize, 0, f->height, dst, dst_linesize);
    written++;
  };

  bool done = false;
  while (!done && av_read_frame(r.fmt, pkt) >= 0) {
    if (pkt->stream_index == r.stream_index) {
      if (avcodec_send_packet(r.codec, pkt) == 0) {
        while (avcodec_receive_frame(r.codec, frame) == 0) {
          while (next < n_indices && frame_no == indices[next]) {
            emit(frame);
            next++;
          }
          frame_no++;
          if (next >= n_indices) {
            done = true;
            break;
          }
        }
      }
    }
    av_packet_unref(pkt);
  }
  // flush decoder
  if (!done) {
    avcodec_send_packet(r.codec, nullptr);
    while (avcodec_receive_frame(r.codec, frame) == 0) {
      while (next < n_indices && frame_no == indices[next]) {
        emit(frame);
        next++;
      }
      frame_no++;
      if (next >= n_indices) break;
    }
  }
  // short video: repeat the last decoded frame for any remaining slots
  while (written > 0 && next < n_indices) {
    std::memcpy(out + (size_t)written * th * tw * 3,
                out + (size_t)(written - 1) * th * tw * 3,
                (size_t)th * tw * 3);
    written++;
    next++;
  }

  if (sws) sws_freeContext(sws);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  return written;
}

}  // extern "C"
