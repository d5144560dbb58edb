from .params import CP, Cell, OfdmParams, sampling_freq_hz, symbol_sz  # noqa: F401
