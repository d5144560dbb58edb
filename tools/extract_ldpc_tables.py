"""Extract the 3GPP 38.212 LDPC base-graph tables into a compact npz.

The base graphs (tables 5.3.2-2 and 5.3.2-3: 2 BGs x 8 lifting-size sets of
shift coefficients) are 3GPP spec constants.  This tool parses them from the
reference implementation's lookup file (or any equivalent dense dump) once;
the build ships only the binary artifact srslte_tpu/phy/fec/ldpc_bg.npz.

Usage: python tools/extract_ldpc_tables.py /root/reference/lib/src/phy/fec/ldpc/base_graph.c
"""

from __future__ import annotations

import re
import sys

import numpy as np

BG_SHAPES = {1: (46, 68), 2: (42, 52)}
VOID = 0xFFFF  # "no edge" marker in our artifact


def parse(path: str):
    text = open(path).read()
    out = {}
    for bg, (m, nfull) in BG_SHAPES.items():
        start = text.index(f"BG{bg}_matrices[")
        start = text.index("{", start)
        depth = 0
        for end in range(start, len(text)):
            if text[end] == "{":
                depth += 1
            elif text[end] == "}":
                depth -= 1
                if depth == 0:
                    break
        body = re.sub(r"//[^\n]*", "", text[start : end + 1])
        body = body.replace("NO_CNCT", str(VOID))
        nums = [int(x) for x in re.findall(r"\b\d+\b", body)]
        data = np.asarray(nums, np.int64)
        need = 8 * m * nfull
        assert len(data) == need, (bg, len(data), need)
        arr = data.reshape(8, m, nfull).astype(np.uint16)
        out[f"bg{bg}"] = arr
    return out


def main():
    src = sys.argv[1]
    tabs = parse(src)
    for k, v in tabs.items():
        real = v[v != VOID]
        assert real.max() < 384, "shift coefficients must be < max Zc"
    np.savez_compressed("srslte_tpu/phy/fec/ldpc_bg.npz", **tabs)
    for k, v in tabs.items():
        n_edges = int((v[0] != VOID).sum())
        print(k, v.shape, "edges:", n_edges)


if __name__ == "__main__":
    main()
