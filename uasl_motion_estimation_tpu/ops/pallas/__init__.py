from .mi import mutual_information_pallas, pallas_supported  # noqa: F401
from .support import tpu_kernels_supported  # noqa: F401
