from .stereo_vo import (  # noqa: F401
    StereoVOParams,
    StereoVOResult,
    stereo_vo_batch,
    stereo_vo_solve,
)
