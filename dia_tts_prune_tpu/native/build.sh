#!/bin/sh
# Build the native host-side libraries (each also auto-builds on first use).
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libaudioproc.so audioproc.cpp
echo "built $(pwd)/libaudioproc.so"
if g++ -O2 -shared -fPIC -o libaudiodec.so audiodec.cpp \
    -lavformat -lavcodec -lavutil -lswresample 2>/dev/null; then
  echo "built $(pwd)/libaudiodec.so"
else
  echo "skipped libaudiodec.so (FFmpeg dev libraries not found)"
fi
if [ -f mp3_tables.h ] && g++ -O2 -shared -fPIC -o libmp3dec.so mp3dec.cpp 2>/dev/null; then
  echo "built $(pwd)/libmp3dec.so"
else
  echo "skipped libmp3dec.so"
fi
