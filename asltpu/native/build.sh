#!/bin/sh
# Build the native decode libraries (see decode.cpp / decode_av.cpp).
# Invoked automatically by asltpu.native on first import when a .so is
# missing or stale; idempotent. The OpenCV library is required
# (strict-parity default backend); the libav library is best-effort
# (throughput backend — its failure must NOT fail this script, or the
# loader would mark the just-built REQUIRED backend unavailable too).
set -e
cd "$(dirname "$0")"

# Rebuild when the .so is missing OR older than its sources: a stale
# library lacking a later-added symbol would otherwise load and then blow
# up at ctypes symbol binding instead of being rebuilt.
needs_build() {
    so="$1"
    [ ! -f "$so" ] && return 0
    shift
    for src in "$@" decode_common.h; do
        if [ "$src" -nt "$so" ]; then return 0; fi
    done
    return 1
}

if needs_build libasltpu_decode.so decode.cpp; then
    # Compile to a temp name then rename: a concurrent loader must never
    # dlopen a half-written .so.
    g++ -O3 -fPIC -shared -std=c++17 \
        -I/usr/include/opencv4 \
        decode.cpp \
        -lopencv_core -lopencv_videoio -lopencv_imgproc \
        -o "libasltpu_decode.so.tmp.$$"
    mv "libasltpu_decode.so.tmp.$$" libasltpu_decode.so
    echo "built $(pwd)/libasltpu_decode.so"
fi
if needs_build libasltpu_decode_av.so decode_av.cpp; then
    # Header location differs across distro layouts; try both.
    for inc in /usr/include/x86_64-linux-gnu /usr/include; do
        if [ -f "$inc/libavcodec/avcodec.h" ]; then
            # Best-effort: `|| { ...; }` keeps a libav compile/link failure
            # from aborting the script under set -e (the OpenCV backend
            # above already built; only the av throughput lane is lost).
            g++ -O3 -fPIC -shared -std=c++17 \
                -I"$inc" \
                decode_av.cpp \
                -lavformat -lavcodec -lavutil -lswscale \
                -o "libasltpu_decode_av.so.tmp.$$" \
                && mv "libasltpu_decode_av.so.tmp.$$" libasltpu_decode_av.so \
                && echo "built $(pwd)/libasltpu_decode_av.so" \
                || {
                    rm -f "libasltpu_decode_av.so.tmp.$$"
                    echo "warning: libav decode backend build failed;" \
                         "continuing with the OpenCV backend only" >&2
                }
            break
        fi
    done
fi
