from .awgn import awgn, awgn_power
from .delay import fractional_delay
from .fading import FadingChannel, PROFILES
from .rlf import rlf_mask
