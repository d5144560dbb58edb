from .boundary import from_device_complex, to_device_complex
from .jit import lazy_jit
