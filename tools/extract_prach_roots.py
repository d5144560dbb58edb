"""Extract 3GPP 36.211 tables 5.7.2-4/-5 (PRACH logical->physical root
sequence order) into srslte_tpu/phy/phch/prach_roots.npz.

Usage: python tools/extract_prach_roots.py <path-to-prach_tables.h>
"""
import re
import sys

import numpy as np

text = open(sys.argv[1]).read()


def grab(name, n):
    start = text.index(name)
    start = text.index("{", start)
    end = text.index("}", start)
    vals = [int(x) for x in re.findall(r"\b\d+\b", text[start:end])]
    assert len(vals) == n, (name, len(vals))
    return np.asarray(vals, np.uint16)


roots = grab("prach_zc_roots[838]", 838)
roots4 = grab("prach_zc_roots_format4[138]", 138)
assert sorted(roots.tolist()) == list(range(1, 839))
assert sorted(roots4.tolist()) == list(range(1, 139))
np.savez_compressed("srslte_tpu/phy/phch/prach_roots.npz",
                    long=roots, short=roots4)
print("saved", roots[:6], roots4[:6])
