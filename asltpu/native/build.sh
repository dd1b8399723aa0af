#!/bin/sh
# Build the native decode library (see decode.cpp). Invoked automatically
# by asltpu.native on first import when the .so is missing; idempotent.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 \
    -I/usr/include/opencv4 \
    decode.cpp \
    -lopencv_core -lopencv_videoio -lopencv_imgproc \
    -o libasltpu_decode.so
echo "built $(pwd)/libasltpu_decode.so"
