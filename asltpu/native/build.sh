#!/bin/sh
# Build the native decode libraries (see decode.cpp / decode_av.cpp).
# Invoked automatically by asltpu.native on first import when a .so is
# missing; idempotent. The OpenCV library is required (strict-parity
# default backend); the libav library is best-effort (throughput backend —
# skipped silently when the ffmpeg dev SDK is absent).
set -e
cd "$(dirname "$0")"
if [ ! -f libasltpu_decode.so ]; then
    g++ -O3 -fPIC -shared -std=c++17 \
        -I/usr/include/opencv4 \
        decode.cpp \
        -lopencv_core -lopencv_videoio -lopencv_imgproc \
        -o libasltpu_decode.so
    echo "built $(pwd)/libasltpu_decode.so"
fi
if [ ! -f libasltpu_decode_av.so ]; then
    # Header location differs across distro layouts; try both.
    for inc in /usr/include/x86_64-linux-gnu /usr/include; do
        if [ -f "$inc/libavcodec/avcodec.h" ]; then
            g++ -O3 -fPIC -shared -std=c++17 \
                -I"$inc" \
                decode_av.cpp \
                -lavformat -lavcodec -lavutil -lswscale \
                -o libasltpu_decode_av.so \
                && echo "built $(pwd)/libasltpu_decode_av.so"
            break
        fi
    done
fi
