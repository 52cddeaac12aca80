#!/usr/bin/env python
"""Build the packaged EMoR calibration npz from the public emor/invemor text files.

Usage: python tools/build_calib.py [--emor PATH] [--invemor PATH]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from singlehdr_tpu.calib import emor as emor_mod


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--emor", default="/root/reference/emor.txt")
    p.add_argument("--invemor", default="/root/reference/invemor.txt")
    args = p.parse_args()
    out = emor_mod.build_npz(args.emor, args.invemor)
    import numpy as np

    z = np.load(out)
    for k in z.files:
        print(k, z[k].shape, z[k].dtype)
    print("wrote", out)


if __name__ == "__main__":
    main()
