"""Extract the reference's 32-phase x 8-tap arbitrary-resampler polyphase
filter bank (and the 35-phase variant) into
srslte_tpu/phy/resampling/arb_polyfilt.npz.

Usage: python tools/extract_arb_polyfilt.py <path-to-resample_arb.c>
"""
import re
import sys

import numpy as np

text = open(sys.argv[1]).read()


def grab(name, n, m):
    start = text.index(name)
    end = text.index(";", start)
    body = text[start:end]
    vals = [float(x) for x in re.findall(r"-?\d+\.\d+", body)]
    assert len(vals) == n * m, (name, len(vals))
    return np.asarray(vals, np.float32).reshape(n, m)


p32 = grab("srsran_resample_arb_polyfilt[", 32, 8)
p35 = grab("srsran_resample_arb_polyfilt_35[", 35, 8)
# structural checks: near-allpass at phase 0 (center tap ~1) and the bank is
# its own time reversal (phase k == phase N-k reversed)
assert abs(p32[0, 3] - 1.0) < 0.01
assert np.allclose(p32, p32[::-1, ::-1])
assert np.allclose(p35, p35[::-1, ::-1])
np.savez_compressed("srslte_tpu/phy/resampling/arb_polyfilt.npz",
                    polyfilt=p32, polyfilt_35=p35)
print("saved", p32.shape, p35.shape)
