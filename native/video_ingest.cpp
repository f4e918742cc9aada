// Native video ingest/egress for egom2p_tpu.
//
// TPU-native replacement for the reference's decord VideoReader and ffmpeg
// subprocess preprocessing (reference: egom2p/data/video_dataset.py:392-457,
// cosmos_tokenizer/video_cli.py:211-240): decodes mp4/any-container video via
// libavformat/libavcodec, applies the standard EgoM2P clip preprocessing
// (fps resample e.g. 30->8, center square crop, Lanczos scale to 256x256)
// in one pass with libswscale, and returns packed RGB24 frames for zero-copy
// handoff to numpy via ctypes.  Also provides an mp4 writer for eval outputs
// (reference: egom2p/utils/plotting_utils.py:103-131 writes 8fps mp4s).
//
// Build: g++ -O2 -shared -fPIC video_ingest.cpp -o libvideoingest.so \
//        -lavformat -lavcodec -lavutil -lswscale

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream_idx = -1;

  ~Reader() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* codec = nullptr;
    stream_idx = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
    if (stream_idx < 0 || !codec) return -3;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -4;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream_idx]->codecpar) < 0)
      return -5;
    // decode-side threading: frame threads pipeline whole frames across
    // cores (the big win for h264/hevc), slice threads split within one.
    // thread_count 0 = one per core; a no-op on single-core dev boxes but
    // ~cores x faster ingest on real TPU-host CPUs (SURVEY §7 "host ingest
    // throughput" hard part).
    dec->thread_count = 0;
    dec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    if (avcodec_open2(dec, codec, nullptr) < 0) return -6;
    return 0;
  }
};

// Convert + center-square-crop + scale one decoded frame into dst (RGB24).
// `sws_cache` keeps one SwsContext alive across frames of a clip (geometry
// is constant per file): sws_getCachedContext rebuilds only on a change.
int convert_frame(const AVFrame* frame, uint8_t* dst, int out_w, int out_h,
                  SwsContext** sws_cache) {
  int side = frame->width < frame->height ? frame->width : frame->height;
  int x0 = (frame->width - side) / 2;
  int y0 = (frame->height - side) / 2;
  // Crop by offsetting data pointers (must respect pixel format subsampling;
  // align offsets to even coordinates for 4:2:0).
  x0 &= ~1;
  y0 &= ~1;

  AVFrame* crop = av_frame_alloc();
  if (!crop) return -1;
  av_frame_ref(crop, const_cast<AVFrame*>(frame));
  crop->width = side & ~1;
  crop->height = side & ~1;
  const AVPixFmtDescriptor* desc =
      av_pix_fmt_desc_get(static_cast<AVPixelFormat>(frame->format));
  for (int p = 0; p < 4 && crop->data[p]; ++p) {
    int shift_x = (p == 1 || p == 2) ? desc->log2_chroma_w : 0;
    int shift_y = (p == 1 || p == 2) ? desc->log2_chroma_h : 0;
    // horizontal offset is in BYTES: comp.step covers multi-byte samples
    // (yuv420p10le) and packed-chroma layouts (NV12's interleaved UV)
    int step = desc->comp[p < desc->nb_components ? p : 0].step;
    if (step < 1) step = 1;
    crop->data[p] += (y0 >> shift_y) * crop->linesize[p]
                     + static_cast<ptrdiff_t>(x0 >> shift_x) * step;
  }

  *sws_cache = sws_getCachedContext(
      *sws_cache, crop->width, crop->height,
      static_cast<AVPixelFormat>(frame->format), out_w, out_h,
      AV_PIX_FMT_RGB24, SWS_LANCZOS, nullptr, nullptr, nullptr);
  if (!*sws_cache) {
    av_frame_free(&crop);
    return -2;
  }
  uint8_t* dst_data[4] = {dst, nullptr, nullptr, nullptr};
  int dst_linesize[4] = {out_w * 3, 0, 0, 0};
  sws_scale(*sws_cache, crop->data, crop->linesize, 0, crop->height, dst_data,
            dst_linesize);
  av_frame_free(&crop);
  return 0;
}

}  // namespace

extern "C" {

// Decode `path`, resample to `target_fps` (<=0: keep all frames), center-crop
// square and scale to out_w x out_h.  On success returns 0 and sets *out_data
// to a malloc'd buffer of (*out_frames, out_h, out_w, 3) uint8.
int vi_read_video(const char* path, int out_w, int out_h, double target_fps,
                  int max_frames, uint8_t** out_data, int* out_frames) {
  Reader r;
  int rc = r.open(path);
  if (rc != 0) return rc;

  AVStream* st = r.fmt->streams[r.stream_idx];
  double tb = av_q2d(st->time_base);

  const size_t frame_bytes = static_cast<size_t>(out_w) * out_h * 3;
  std::vector<uint8_t> out;
  out.reserve(frame_bytes * 64);

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  SwsContext* sws_cache = nullptr;
  int n_out = 0;
  double next_tick = -1.0;  // emission time of the next output frame
  double first_pts = -1.0;
  bool done = false;

  auto emit = [&](const AVFrame* f) -> int {
    out.resize(out.size() + frame_bytes);
    int c = convert_frame(f, out.data() + out.size() - frame_bytes, out_w,
                          out_h, &sws_cache);
    if (c != 0) return c;
    ++n_out;
    return 0;
  };

  auto handle_frame = [&](AVFrame* f) {
    double t = (f->best_effort_timestamp == AV_NOPTS_VALUE)
                   ? n_out / (target_fps > 0 ? target_fps : 30.0)
                   : f->best_effort_timestamp * tb;
    if (first_pts < 0) first_pts = t;
    t -= first_pts;
    if (target_fps <= 0) {
      emit(f);
    } else {
      if (next_tick < 0) next_tick = 0.0;
      // fps-filter-like CFR resampling: emit while the tick falls at/before
      // this frame's timestamp
      while (t + 1e-9 >= next_tick) {
        if (emit(f) != 0) { done = true; return; }
        next_tick += 1.0 / target_fps;
        if (max_frames > 0 && n_out >= max_frames) { done = true; return; }
      }
    }
    if (max_frames > 0 && n_out >= max_frames) done = true;
  };

  while (!done && av_read_frame(r.fmt, pkt) >= 0) {
    if (pkt->stream_index == r.stream_idx) {
      // standard send/receive drain: retry send on EAGAIN after draining
      int s = avcodec_send_packet(r.dec, pkt);
      while (true) {
        while (!done && avcodec_receive_frame(r.dec, frame) == 0) {
          handle_frame(frame);
        }
        if (s != AVERROR(EAGAIN) || done) break;
        s = avcodec_send_packet(r.dec, pkt);
      }
    }
    av_packet_unref(pkt);
  }
  // flush decoder
  if (!done) {
    avcodec_send_packet(r.dec, nullptr);
    while (!done && avcodec_receive_frame(r.dec, frame) == 0) handle_frame(frame);
  }
  av_packet_free(&pkt);
  av_frame_free(&frame);
  if (sws_cache) sws_freeContext(sws_cache);

  if (n_out == 0) return -10;
  uint8_t* buf = static_cast<uint8_t*>(malloc(out.size()));
  if (!buf) return -11;
  memcpy(buf, out.data(), out.size());
  *out_data = buf;
  *out_frames = n_out;
  return 0;
}

void vi_free(uint8_t* p) { free(p); }

// Encode packed RGB24 frames (n, h, w, 3) to an mp4 at `fps`.
int vi_write_video(const char* path, const uint8_t* frames, int n, int w,
                   int h, double fps) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) return -1;

  const AVCodec* codec = avcodec_find_encoder_by_name("libx264");
  if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_H264);
  if (!codec) return -2;

  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  enc->width = w;
  enc->height = h;
  enc->pix_fmt = AV_PIX_FMT_YUV420P;
  enc->time_base = av_d2q(1.0 / fps, 1 << 16);
  enc->framerate = av_d2q(fps, 1 << 16);
  enc->gop_size = 12;
  enc->max_b_frames = 0;  // keep pts==dts so short clips round-trip exactly
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (codec->id == AV_CODEC_ID_H264)
    av_opt_set(enc->priv_data, "crf", "18", 0);
  else
    enc->bit_rate = 4'000'000;
  if (avcodec_open2(enc, codec, nullptr) < 0) return -3;
  avcodec_parameters_from_context(st->codecpar, enc);
  st->time_base = enc->time_base;

  if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -4;
  }
  if (avformat_write_header(fmt, nullptr) < 0) return -5;

  SwsContext* sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h,
                                   AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                                   nullptr, nullptr);
  AVFrame* yuv = av_frame_alloc();
  yuv->format = AV_PIX_FMT_YUV420P;
  yuv->width = w;
  yuv->height = h;
  av_frame_get_buffer(yuv, 0);
  AVPacket* pkt = av_packet_alloc();

  auto flush = [&](AVFrame* f) {
    avcodec_send_frame(enc, f);
    while (avcodec_receive_packet(enc, pkt) == 0) {
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      if (pkt->duration <= 0)
        pkt->duration = av_rescale_q(1, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  for (int i = 0; i < n; ++i) {
    const uint8_t* src_data[4] = {frames + static_cast<size_t>(i) * w * h * 3,
                                  nullptr, nullptr, nullptr};
    int src_linesize[4] = {w * 3, 0, 0, 0};
    av_frame_make_writable(yuv);
    sws_scale(sws, src_data, src_linesize, 0, h, yuv->data, yuv->linesize);
    yuv->pts = i;
    flush(yuv);
  }
  flush(nullptr);  // drain

  av_write_trailer(fmt);
  sws_freeContext(sws);
  av_frame_free(&yuv);
  av_packet_free(&pkt);
  avcodec_free_context(&enc);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"
