from .cloudsc2 import Cloudsc2Inputs, Cloudsc2Outputs, cloudsc2
from .cuadjtqs import cuadjtqs
from .satur import satur

__all__ = ["Cloudsc2Inputs", "Cloudsc2Outputs", "cloudsc2", "cuadjtqs", "satur"]
