"""Extract the 38.212 table 5.3.1.1-1 polar input-interleaver pattern.

Spec constant data (164 entries), parsed from the reference's transcription
(lib/src/phy/fec/polar/polar_interleaver.c:28) into
srslte_tpu/phy/fec/polar_il_pattern.npy — same handling as the Q^1024
reliability sequence (extract_polar_seq.py).
"""

import re
import sys

import numpy as np

SRC = "/root/reference/lib/src/phy/fec/polar/polar_interleaver.c"
OUT = "srslte_tpu/phy/fec/polar_il_pattern.npy"


def main():
    text = open(SRC).read()
    m = re.search(r"polar_interleaver_pattern\[[^\]]*\]\s*=\s*\{([^}]*)\}",
                  text, re.S)
    if not m:
        sys.exit("pattern table not found")
    vals = np.array([int(x) for x in re.findall(r"\d+", m.group(1))],
                    np.int64)
    assert len(vals) == 164 and sorted(vals.tolist()) == list(range(164))
    np.save(OUT, vals)
    print(f"wrote {OUT}: {len(vals)} entries")


if __name__ == "__main__":
    main()
