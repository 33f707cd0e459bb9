from .mi import mutual_information_pallas, pallas_supported  # noqa: F401
