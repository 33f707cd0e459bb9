#!/bin/sh
# Build the reference CPU baseline binary against the unmodified reference
# sources mounted read-only at /root/reference (core + vo modules only —
# these depend solely on OpenCV; CMakeLists.txt:98-105).
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-$(dirname "$0")/ref_vo}
g++ -O3 -march=native -std=c++11 -Wno-comment \
    -I"$REF/include/MotionEstimation" \
    "$(dirname "$0")/main.cpp" \
    "$REF/src/core/rotation_utils.cpp" \
    "$REF/src/core/feature_types.cpp" \
    "$REF/src/vo/StereoVisualOdometry.cpp" \
    $(pkg-config --cflags opencv4) \
    -lopencv_core -lopencv_imgproc -lopencv_imgcodecs -lopencv_video \
    -lopencv_calib3d \
    -o "$OUT"
echo "built $OUT"
