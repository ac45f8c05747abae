from .cloudsc2_kernel import cloudsc2_pallas

__all__ = ["cloudsc2_pallas"]
