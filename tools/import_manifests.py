"""Import the dataset manifests from an existing MADM checkout.

The six ``data/json_file/*.json`` manifests are *data* (relative path lists
into Cityscapes / DELIVER / FMB / DSEC) that eval/train consume verbatim —
they define which files constitute the benchmark splits, so byte-compatible
content is required for mIoU comparability (test sizes: DELIVER 1897,
FMB 280, DSEC 2806 — SURVEY.md §6).

Usage:
    python tools/import_manifests.py [--src /path/to/MADM/data/json_file] \
        [--dst data/json_file]

If no MADM checkout is available, ``tools/make_manifests.py`` regenerates
the same schema by walking the dataset roots.
"""

from __future__ import annotations

import argparse
import json
import os

NAMES = [
    "Cityscapes_RGB_to_DELIVER_Depth_train.json",
    "Cityscapes_RGB_to_DELIVER_Depth_test.json",
    "Cityscapes_RGB_to_FMB_Infrared_train.json",
    "Cityscapes_RGB_to_FMB_Infrared_test.json",
    "Cityscapes_RGB_to_DSEC_Event_train.json",
    "Cityscapes_RGB_to_DSEC_Event_test.json",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/reference/data/json_file")
    p.add_argument("--dst", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "json_file"))
    args = p.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    for name in NAMES:
        src = os.path.join(args.src, name)
        if not os.path.exists(src):
            print(f"skip (missing): {src}")
            continue
        with open(src) as f:
            manifest = json.load(f)
        sizes = {
            k: {k2: len(v2) for k2, v2 in v.items()} for k, v in manifest.items()
        }
        with open(os.path.join(args.dst, name), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        print(f"{name}: {sizes}")


if __name__ == "__main__":
    main()
