#!/bin/sh
# Build the native audio-processing library.
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libaudioproc.so audioproc.cpp
echo "built $(pwd)/libaudioproc.so"
