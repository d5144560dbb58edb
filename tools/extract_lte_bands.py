"""Extract the 36.101 table 5.7.3-1 LTE band table (band, F_DL_low,
N_Offs_DL, N_Offs_UL, duplex spacing) from the reference's transcription
(lib/src/phy/common/phy_common.c lte_bands:532) into
srslte_tpu/phy/common/lte_bands.npy — spec constant data, same handling as
the other ETSI tables.
"""

import re
import sys

import numpy as np

SRC = "/root/reference/lib/src/phy/common/phy_common.c"
OUT = "srslte_tpu/phy/common/lte_bands.npy"


def main():
    text = open(SRC).read()
    m = re.search(r"lte_bands\[SRSRAN_NOF_LTE_BANDS\]\s*=\s*\{(.*?)\n\};",
                  text, re.S)
    if not m:
        sys.exit("band table not found")
    rows = []
    for entry in re.findall(r"\{([^}]*)\}", m.group(1)):
        parts = [p.strip() for p in entry.split(",")]
        band = int(parts[0])
        fd_low = float(parts[1])
        dl_off = int(parts[2])
        ul_off = int(parts[3])
        duplex = float(parts[4])
        rows.append((band, fd_low, dl_off, ul_off, duplex))
    arr = np.array(rows, np.float64)
    assert len(arr) > 40 and arr[0][0] == 1
    np.save(OUT, arr)
    print(f"wrote {OUT}: {len(arr)} bands")


if __name__ == "__main__":
    main()
