/* Stream-copy remuxer: rewraps a video file into another container without
 * re-encoding (libavformat copy), so demux-breadth tests can check that the
 * SAME H.264 stream recodes to the same ratio from MP4/MKV/TS — the coverage
 * the reference gets from libavformat (SURVEY.md C5, recode.cpp:89-96).
 *
 * Usage: remux in.mp4 out.{ts,mkv,mp4,264} [frag|frag_moofbase]
 *   frag          — fragmented MP4 (moof/traf/trun, base_data_offset)
 *   frag_moofbase — fragmented MP4 with default-base-is-moof tfhd bases
 *                   (the DASH/CMAF profile layout)
 */
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <stdio.h>
#include <string.h>

int main(int argc, char **argv) {
  if (argc != 3 && argc != 4) {
    fprintf(stderr, "usage: %s in out [frag|frag_moofbase]\n", argv[0]);
    return 2;
  }
  AVFormatContext *in = NULL, *out = NULL;
  if (avformat_open_input(&in, argv[1], NULL, NULL) < 0) return 1;
  if (avformat_find_stream_info(in, NULL) < 0) return 1;
  if (avformat_alloc_output_context2(&out, NULL, NULL, argv[2]) < 0) return 1;
  int map[64];
  for (unsigned i = 0; i < in->nb_streams && i < 64; i++) {
    map[i] = -1;
    AVStream *ist = in->streams[i];
    if (ist->codecpar->codec_type != AVMEDIA_TYPE_VIDEO &&
        ist->codecpar->codec_type != AVMEDIA_TYPE_AUDIO)
      continue;
    AVStream *ost = avformat_new_stream(out, NULL);
    if (!ost) return 1;
    if (avcodec_parameters_copy(ost->codecpar, ist->codecpar) < 0) return 1;
    ost->codecpar->codec_tag = 0;
    ost->time_base = ist->time_base;
    map[i] = (int)ost->index;
  }
  if (!(out->oformat->flags & AVFMT_NOFILE))
    if (avio_open(&out->pb, argv[2], AVIO_FLAG_WRITE) < 0) return 1;
  AVDictionary *opts = NULL;
  if (argc == 4 && !strncmp(argv[3], "frag", 4))
    av_dict_set(&opts, "movflags",
                strcmp(argv[3], "frag_moofbase") == 0
                    ? "+frag_keyframe+empty_moov+default_base_moof"
                    : "+frag_keyframe+empty_moov",
                0);
  int hdr_ret = avformat_write_header(out, &opts);
  av_dict_free(&opts);
  if (hdr_ret < 0) return 1;
  AVPacket *pkt = av_packet_alloc();
  while (av_read_frame(in, pkt) >= 0) {
    if (pkt->stream_index < 64 && map[pkt->stream_index] >= 0) {
      AVStream *ist = in->streams[pkt->stream_index];
      AVStream *ost = out->streams[map[pkt->stream_index]];
      pkt->stream_index = ost->index;
      av_packet_rescale_ts(pkt, ist->time_base, ost->time_base);
      pkt->pos = -1;
      if (av_interleaved_write_frame(out, pkt) < 0) return 1;
    }
    av_packet_unref(pkt);
  }
  av_write_trailer(out);
  av_packet_free(&pkt);
  avformat_close_input(&in);
  if (!(out->oformat->flags & AVFMT_NOFILE)) avio_closep(&out->pb);
  avformat_free_context(out);
  return 0;
}
