from .modem import MOD_BITS, Modulation, demod_soft, modulate  # noqa: F401
