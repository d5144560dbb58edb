"""Extract 3GPP 36.211 tables 5.5.3.2-1..4 (SRS bandwidth configurations
m_srs,b and N_b) into srslte_tpu/phy/phch/srs_bw.npz.

Usage: python tools/extract_srs_tables.py <path-to-refsignal_ul.c>
"""
import re
import sys

import numpy as np

text = open(sys.argv[1]).read()


def grab(name):
    start = text.index(name)
    end = text.index(";", start)
    body = re.sub(r"/\*.*?\*/", "", text[start:end], flags=re.S)
    vals = [int(x) for x in re.findall(r"\b\d+\b", body[body.index("=") :])]
    assert len(vals) == 4 * 4 * 8, (name, len(vals))
    return np.asarray(vals, np.uint8).reshape(4, 4, 8)


m = grab("m_srs_b[4][4][8]")
nb = grab("Nb[4][4][8]")
# structural check: m_srs at level b-1 splits into N_b parts of level b
for t in range(4):
    for b in range(1, 4):
        assert np.all(m[t, b - 1] == m[t, b] * nb[t, b]), (t, b)
np.savez_compressed("srslte_tpu/phy/phch/srs_bw.npz", m_srs=m, nb=nb)
print("saved", m[0, 0], nb[1, 1])
