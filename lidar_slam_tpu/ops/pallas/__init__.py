from .ndt_reduce import ndt_derivatives_pallas, pallas_supported

__all__ = ["ndt_derivatives_pallas", "pallas_supported"]
