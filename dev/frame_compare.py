#!/usr/bin/env python3
"""Determinism probe comparator: byte-for-frame equality of two Verify
dumps (e.g. shuffle-partitions 8 vs 7). Row ORDER included — the
engine's outputs must not depend on how the data was split.

Usage: dev/frame_compare.py OUT_A OUT_B
"""
import glob
import sys

import pandas as pd


def read(out, name):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    return pd.concat([pd.read_parquet(f, engine="pyarrow") for f in files],
                     ignore_index=True)


def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(x.rsplit("/", 1)[-1] for x in glob.glob(f"{a}/*")
                   if not x.endswith(".json"))
    names_b = {x.rsplit("/", 1)[-1] for x in glob.glob(f"{b}/*")}
    missing = [n for n in names if n not in names_b]
    if missing:
        print(f"MISSING in {b}: {missing}")
        return 1
    bad = []
    for n in names:
        try:
            fa, fb = read(a, n), read(b, n)
            if list(fa.columns) != list(fb.columns) or len(fa) != len(fb) \
                    or not fa.astype(str).equals(fb.astype(str)):
                bad.append(n)
        except Exception as e:  # noqa: BLE001 - report, keep comparing
            bad.append(f"{n} ({type(e).__name__}: {e})")
    if bad:
        print(f"DIFFER ({len(bad)}): {bad}")
        return 1
    print(f"== {len(names)}/{len(names)} frames identical (row order included) ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
