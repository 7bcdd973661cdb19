/* Test-corpus generator: encodes synthetic footage to H.264 CABAC MP4/Annex-B
 * using the system libavformat/libavcodec (libx264 encoder).
 *
 * This replaces the reference's reliance on stock GoPro footage
 * (README.md:23, data/GOPR4542.MP4 — not shipped): we generate deterministic
 * clips with realistic spatial/temporal structure so the recoder's
 * neighbor/temporal priors have real signal to exploit.
 *
 * Usage: genvideo out.mp4 WIDTH HEIGHT FRAMES FPS GOP BFRAMES CRF SEED [slices] [x264-params]
 */
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libavutil/imgutils.h>
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static unsigned rng_state;
static int g_noise = 5; /* AVT_NOISE env overrides (PCM/interlace test content) */
static int g_comb = 0;  /* AVT_COMB: interlaced capture simulation — odd lines
                         * sampled half a frame later, producing combing that
                         * drives x264's MBAFF pairs to field coding (incl. in
                         * I slices) */
static unsigned xrand(void) {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 17;
  rng_state ^= rng_state << 5;
  return rng_state;
}

/* Deterministic moving-texture frame: blobs + gradient + noise, so motion
 * estimation, intra prediction, and residual coding all get exercised. */
static void fill_frame(AVFrame *f, int t, int w, int h, int ch_h, int bd10) {
  for (int y = 0; y < h; y++) {
    uint8_t *row = f->data[0] + y * f->linesize[0];
    uint16_t *row16 = (uint16_t *)row;
    double tt = g_comb && (y & 1) ? t + 0.5 : t; /* bottom field later */
    for (int x = 0; x < w; x++) {
      int v = ((x + (int)(tt * 3)) * 255 / w + (y * 128 / h)) & 0xFF;
      double dx = x - (w / 2 + w / 3 * sin(tt * 0.1));
      double dy = y - (h / 2 + h / 3 * cos(tt * 0.13));
      double d = sqrt(dx * dx + dy * dy);
      v = (v + (int)(127 * exp(-d / 40.0))) & 0xFF;
      v += (int)(xrand() % g_noise) - g_noise / 2; /* noise -> residuals */
      v = v < 0 ? 0 : v > 255 ? 255 : v;
      if (bd10)
        row16[x] = (uint16_t)((v << 2) | (xrand() & 3));
      else
        row[x] = (uint8_t)v;
    }
  }
  for (int y = 0; y < ch_h; y++) {
    uint8_t *u = f->data[1] + y * f->linesize[1];
    uint8_t *v = f->data[2] + y * f->linesize[2];
    uint16_t *u16 = (uint16_t *)u, *v16 = (uint16_t *)v;
    for (int x = 0; x < w / 2; x++) {
      int uu = 128 + (int)(40 * sin((x + t) * 0.05));
      int vv = 128 + (int)(40 * cos((y + t * 2) * 0.07));
      if (bd10) {
        u16[x] = (uint16_t)(uu << 2);
        v16[x] = (uint16_t)(vv << 2);
      } else {
        u[x] = (uint8_t)uu;
        v[x] = (uint8_t)vv;
      }
    }
  }
}

int main(int argc, char **argv) {
  if (argc < 10) {
    fprintf(stderr,
            "usage: %s out.mp4 W H FRAMES FPS GOP BFRAMES CRF SEED [slices]\n",
            argv[0]);
    return 2;
  }
  const char *path = argv[1];
  int w = atoi(argv[2]), h = atoi(argv[3]), nframes = atoi(argv[4]);
  int fps = atoi(argv[5]), gop = atoi(argv[6]), bframes = atoi(argv[7]);
  int crf = atoi(argv[8]);
  rng_state = (unsigned)atoi(argv[9]) | 1;
  if (getenv("AVT_NOISE")) g_noise = atoi(getenv("AVT_NOISE"));
  if (getenv("AVT_COMB")) g_comb = atoi(getenv("AVT_COMB"));
  int slices = argc > 10 ? atoi(argv[10]) : 1;
  const char *extra = argc > 11 ? argv[11] : "";
  int is422 = argc > 12 && argv[12][1] == '2' && argv[12][2] == '2';
  int is444 = argc > 12 && argv[12][1] == '4';
  int is10 = argc > 12 && strstr(argv[12], "10") != NULL;

  const AVCodec *codec = avcodec_find_encoder_by_name("libx264");
  if (!codec) { fprintf(stderr, "libx264 encoder not available\n"); return 1; }

  AVFormatContext *fmt = NULL;
  avformat_alloc_output_context2(&fmt, NULL, NULL, path);
  if (!fmt) { fprintf(stderr, "bad output path\n"); return 1; }

  AVStream *st = avformat_new_stream(fmt, NULL);
  AVCodecContext *c = avcodec_alloc_context3(codec);
  c->width = w;
  c->height = h;
  c->time_base = (AVRational){1, fps};
  c->framerate = (AVRational){fps, 1};
  c->pix_fmt = is10    ? (is444 ? AV_PIX_FMT_YUV444P10LE
                          : is422 ? AV_PIX_FMT_YUV422P10LE
                                  : AV_PIX_FMT_YUV420P10LE)
               : is444  ? AV_PIX_FMT_YUV444P
               : is422  ? AV_PIX_FMT_YUV422P
                        : AV_PIX_FMT_YUV420P;
  c->gop_size = gop;
  c->max_b_frames = bframes;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    c->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  char x264opts[256];
  snprintf(x264opts, sizeof x264opts, "cabac=1:slices=%d%s%s", slices,
           extra[0] ? ":" : "", extra);
  av_opt_set(c->priv_data, "preset", "medium", 0);
  av_opt_set(c->priv_data, "profile",
             is444 ? "high444"
             : is422 ? "high422"  /* high422 covers 10-bit 4:2:2 */
             : is10 ? "high10"
                    : "high", 0);
  av_opt_set_int(c->priv_data, "crf", crf, 0);
  av_opt_set(c->priv_data, "x264-params", x264opts, 0);

  if (avcodec_open2(c, codec, NULL) < 0) { fprintf(stderr, "open enc failed\n"); return 1; }
  avcodec_parameters_from_context(st->codecpar, c);
  st->time_base = c->time_base;

  if (!(fmt->oformat->flags & AVFMT_NOFILE))
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) { fprintf(stderr, "io open failed\n"); return 1; }
  if (avformat_write_header(fmt, NULL) < 0) { fprintf(stderr, "write header failed\n"); return 1; }

  AVFrame *frame = av_frame_alloc();
  frame->format = c->pix_fmt;
  frame->width = w;
  frame->height = h;
  av_frame_get_buffer(frame, 0);
  AVPacket *pkt = av_packet_alloc();

  for (int i = 0; i <= nframes; i++) {
    AVFrame *f = NULL;
    if (i < nframes) {
      av_frame_make_writable(frame);
      fill_frame(frame, i, w, h, is444 || is422 ? h : h / 2, is10);
      frame->pts = i;
      f = frame;
    }
    if (avcodec_send_frame(c, f) < 0) { fprintf(stderr, "send_frame failed\n"); return 1; }
    while (1) {
      int r = avcodec_receive_packet(c, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) { fprintf(stderr, "receive failed\n"); return 1; }
      av_packet_rescale_ts(pkt, c->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  }
  av_write_trailer(fmt);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avcodec_free_context(&c);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avformat_free_context(fmt);
  fprintf(stderr, "wrote %s\n", path);
  return 0;
}
