#!/usr/bin/env python3
"""Extract the Vorbis floor1 fromdB lookup (ISO-spec constant data) from
the reference's vendored Tremor into codecs/vorbis/tables.npz.

The 256-entry table is the spec's floor1_inverse_dB_table; Tremor stores
it as round(float * 2^31) (floor1.c:232, XdB(n)=(n) at normal accuracy).
Only numeric constant data is extracted — no code.
"""

import pathlib
import re

import numpy as np

REF = pathlib.Path("/root/reference/thirdparty/Tremor")
OUT = (pathlib.Path(__file__).resolve().parent.parent / "ohpipeline_tpu"
       / "codecs" / "vorbis" / "tables.npz")


def main() -> None:
    text = (REF / "floor1.c").read_text()
    m = re.search(r"FLOOR_fromdB_LOOKUP\[256\]=\{(.*?)\};", text, re.S)
    ints = [int(x, 16) for x in re.findall(r"XdB\(0x([0-9a-fA-F]+)\)",
                                           m.group(1))]
    assert len(ints) == 256, len(ints)
    fromdb = np.array(ints, np.float64) / (1 << 31)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, floor1_fromdb=fromdb)
    print(f"wrote {OUT}: fromdB[0]={fromdb[0]:.8g} fromdB[255]="
          f"{fromdb[255]:.8g}")


if __name__ == "__main__":
    main()
