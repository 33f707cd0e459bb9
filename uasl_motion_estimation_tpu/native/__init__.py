"""Native host runtime: C++ components bridged via ctypes (pybind11 is not
in the build image). Each component degrades gracefully to a pure-Python
fallback when the shared library has not been built."""

from .loader import AsyncFrameLoader, build_native, native_available  # noqa: F401
