/* MB-type decode oracle: decodes an H.264 file with the system libavcodec
 * with FF_DEBUG_MB_TYPE enabled, which prints a per-MB map for every frame
 * to stderr (3 chars per MB: class, partition, '=' when the MB is
 * field-coded).  Used by MBAFF bring-up tests to cross-check the owned
 * parser's per-MB decisions (class/skip/field) against a known-good decoder
 * — the same role ffmpeg's hooked decoder plays for the reference
 * (SURVEY.md C18), but read-only and unpatched.
 *
 * Usage: mbtype_oracle file.mp4
 */
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int main(int argc, char **argv) {
  const char *s;
  if (argc != 2) {
    fprintf(stderr, "usage: %s file\n", argv[0]);
    return 2;
  }
  av_log_set_level(AV_LOG_DEBUG);
  AVFormatContext *fmt = NULL;
  if (avformat_open_input(&fmt, argv[1], NULL, NULL) < 0) return 1;
  if (avformat_find_stream_info(fmt, NULL) < 0) return 1;
  int vs = -1;
  for (unsigned i = 0; i < fmt->nb_streams; i++)
    if (fmt->streams[i]->codecpar->codec_type == AVMEDIA_TYPE_VIDEO) vs = (int)i;
  if (vs < 0) return 1;
  const AVCodec *codec =
      avcodec_find_decoder(fmt->streams[vs]->codecpar->codec_id);
  AVCodecContext *c = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(c, fmt->streams[vs]->codecpar);
  s = getenv("ORACLE_DEBUG");
  c->debug = s && strcmp(s, "qp") == 0 ? FF_DEBUG_QP : FF_DEBUG_MB_TYPE;
  c->thread_count = 1;
  if (avcodec_open2(c, codec, NULL) < 0) return 1;
  AVPacket *pkt = av_packet_alloc();
  AVFrame *frame = av_frame_alloc();
  while (av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == vs) {
      avcodec_send_packet(c, pkt);
      while (avcodec_receive_frame(c, frame) >= 0) {
      }
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(c, NULL);
  while (avcodec_receive_frame(c, frame) >= 0) {
  }
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&c);
  avformat_close_input(&fmt);
  return 0;
}
