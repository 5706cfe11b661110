#!/bin/bash
# Download the SlowTV source videos (yt-dlp), then run
# api/data/preprocess/export_slow_tv.py to extract frames + intrinsics.
set -euo pipefail
ROOT="${DATA_ROOT:?set DATA_ROOT}/slow_tv"
mkdir -p "$ROOT/videos"
i=0
while read -r url; do
  printf -v stem '%05d' "$i"
  yt-dlp -f 'bv*[height<=720]' -o "$ROOT/videos/$stem.mp4" "$url" || echo "FAILED $url"
  i=$((i+1))
done < "$ROOT/splits/urls.txt"
