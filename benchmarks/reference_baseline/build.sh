#!/bin/sh
# Build the reference CPU baseline binary against the reference sources
# mounted read-only at /root/reference (core + vo modules only — these
# depend solely on OpenCV; CMakeLists.txt:98-105).
#
# REPAIRED=1 applies a one-line benchmark-only fix to the optimisation loop
# exit of StereoVisualOdometry::optimize (StereoVisualOdometry.cpp:277):
# as shipped, `while(!(k++ < (max_iter ? stop : ...)))` compares the
# iteration counter against the ENUM VALUE of the stop condition (0..6)
# instead of max_iter, so on noisy matches — where no stop condition can
# fire in the first handful of iterations — the solver spins for ~2^31
# iterations (tens of minutes per frame). The repaired build implements the
# documented intent (iterate until a stop condition or max_iter,
# VisualOdometry.h:32) and is the fair performance baseline; the as-shipped
# build measures the library exactly as published.
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
VO_SRC="$REF/src/vo/StereoVisualOdometry.cpp"
OUT=${OUT:-$HERE/ref_vo}
if [ "${REPAIRED:-0}" = "1" ]; then
    OUT=${OUT_REPAIRED:-$HERE/ref_vo_repaired}
    TMPSRC=$(mktemp -d)/StereoVisualOdometry.cpp
    sed 's/}while(!(k++ < (m_param.max_iter?stop:stop=StopCondition::MAX_ITERATIONS)));/}while(stop==StopCondition::NO_STOP \&\& ++k < m_param.max_iter); if(stop==StopCondition::NO_STOP) stop=StopCondition::MAX_ITERATIONS;/' \
        "$VO_SRC" > "$TMPSRC"
    VO_SRC="$TMPSRC"
fi
g++ -O3 -march=native -std=c++11 -Wno-comment \
    -I"$REF/include/MotionEstimation" \
    "$HERE/main.cpp" \
    "$REF/src/core/rotation_utils.cpp" \
    "$REF/src/core/feature_types.cpp" \
    "$VO_SRC" \
    $(pkg-config --cflags opencv4) \
    -lopencv_core -lopencv_imgproc -lopencv_imgcodecs -lopencv_video \
    -lopencv_calib3d \
    -o "$OUT"
echo "built $OUT"

# mono harness (MonoVisualOdometry is untouched by the stereo repair)
if [ "${MONO:-1}" = "1" ]; then
    g++ -O3 -march=native -std=c++11 -Wno-comment \
        -I"$REF/include/MotionEstimation" \
        "$HERE/main_mono.cpp" \
        "$REF/src/core/rotation_utils.cpp" \
        "$REF/src/core/feature_types.cpp" \
        "$REF/src/vo/MonoVisualOdometry.cpp" \
        $(pkg-config --cflags opencv4) \
        -lopencv_core -lopencv_imgproc -lopencv_imgcodecs -lopencv_video \
        -lopencv_calib3d \
        -o "$HERE/ref_mono"
    echo "built $HERE/ref_mono"
fi
