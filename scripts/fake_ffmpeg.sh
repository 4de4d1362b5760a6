#!/bin/bash
# Contract-honoring ffmpeg fixture for the external-decoder bridge
# (graft.ops.MultimodalOps.decodeVideoFramesFfmpeg): answers the -version
# probe, then for a decode call drains stdin and emits THREE raw gray
# 16x16 rasters on stdout, frame i filled with the constant byte
# (payload_length + i) % 256 — a pure function of the input, so the gate
# oracle predicts every mean_luma in closed form. This is the committed
# twin of FfmpegBridgeSpec's generated fixture; a real ffmpeg honors the
# same byte contract (rawvideo gray frames at the requested scale).
for a in "$@"; do [ "$a" = "-version" ] && { echo fake-ffmpeg 1.0; exit 0; }; done
L=$(cat | wc -c)
for i in 0 1 2; do
  v=$(( (L + i) % 256 ))
  head -c 256 /dev/zero | tr '\0' "\\$(printf '%03o' "$v")"
done
