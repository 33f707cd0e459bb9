#!/bin/sh
# Build the native host runtime (frame loader) as a shared library.
set -e
HERE=$(dirname "$0")
g++ -O2 -std=c++17 -shared -fPIC \
    "$HERE/frame_loader.cpp" \
    $(pkg-config --cflags opencv4) \
    -lopencv_core -lopencv_imgcodecs \
    -o "$HERE/libframeloader.so"
echo "built $HERE/libframeloader.so"
