"""Extract the 3GPP 38.212 Table 5.3.1.2-1 universal polar reliability
sequence (Q^1024) into srslte_tpu/phy/fec/polar_q1024.npy.

The per-N mother codes are its subsequences (entries < N), so only the
universal table is stored.

Usage: python tools/extract_polar_seq.py <path-to-dense-table-source>
"""
import re
import sys

import numpy as np

text = open(sys.argv[1]).read()
start = text.index("mother_code_10[1024]")
start = text.index("{", start)
end = text.index("}", start)
nums = [int(x) for x in re.findall(r"\b\d+\b", text[start:end])]
arr = np.asarray(nums, np.uint16)
assert len(arr) == 1024 and sorted(arr.tolist()) == list(range(1024))
np.save("srslte_tpu/phy/fec/polar_q1024.npy", arr)
print("saved", arr[:8], "...", arr[-4:])
