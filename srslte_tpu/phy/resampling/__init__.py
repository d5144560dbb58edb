from .resampler import resample_fft, interp_linear_cf
from .resampler import resample_arb
