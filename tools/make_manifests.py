#!/usr/bin/env python
"""Build Cityscapes->{DELIVER,FMB,DSEC} JSON manifests + RCS statistics.

The reference ships `data/json_file/*.json` path lists plus the rare-class
sampling side files (``sample_class_stats.json`` / ``samples_with_class.json``
consumed by ``cross_modality_dataset.py:87-109,242-264``).  This tool
regenerates all of them from dataset roots so the framework is standalone:

  python tools/make_manifests.py cityscapes --source-root /data/cityscapes \
      --target-root /data/DELIVER --target-glob 'depth/**/*.png' \
      --name Cityscapes_RGB_to_DELIVER_Depth --out data/json_file

  python tools/make_manifests.py rcs --source-root /data/cityscapes
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np
from PIL import Image


def cityscapes_pairs(source_root: str, split: str = "train"):
    imgs = sorted(
        glob.glob(os.path.join(source_root, f"leftImg8bit/{split}/*/*_leftImg8bit.png"))
    )
    pairs = []
    for img in imgs:
        lbl = img.replace("leftImg8bit/", "gtFine/").replace(
            "_leftImg8bit.png", "_gtFine_labelTrainIds.png"
        )
        if os.path.exists(lbl):
            pairs.append((os.path.relpath(img, source_root),
                          os.path.relpath(lbl, source_root)))
    return pairs


def build_manifest(args):
    pairs = cityscapes_pairs(args.source_root)
    targets = sorted(
        os.path.relpath(p, args.target_root)
        for p in glob.glob(os.path.join(args.target_root, args.target_glob),
                           recursive=True)
    )
    target_labels = sorted(
        os.path.relpath(p, args.target_root)
        for p in glob.glob(os.path.join(args.target_root, args.target_label_glob),
                           recursive=True)
    ) if args.target_label_glob else []
    manifest = {
        "source_data": {"RGB": [p for p, _ in pairs], "label": [l for _, l in pairs]},
        "target_data": {"second_modality": targets, "label": target_labels},
    }
    os.makedirs(args.out, exist_ok=True)
    suffix = "test" if args.test else "train"
    path = os.path.join(args.out, f"{args.name}_{suffix}.json")
    with open(path, "w") as f:
        json.dump(manifest, f)
    print(f"wrote {path}: {len(pairs)} source pairs, {len(targets)} targets")


def build_rcs_stats(args):
    """sample_class_stats.json + samples_with_class.json for RCS
    (per-file per-class pixel counts over the *raw* trainId labels)."""
    pairs = cityscapes_pairs(args.source_root)
    stats = []
    with_class: dict = {}
    for _, lbl_rel in pairs:
        lbl = np.array(Image.open(os.path.join(args.source_root, lbl_rel)))
        entry = {"file": lbl_rel}
        for c in np.unique(lbl):
            if c == 255:
                continue
            n = int((lbl == int(c)).sum())
            entry[str(int(c))] = n
            with_class.setdefault(str(int(c)), []).append([lbl_rel, n])
        stats.append(entry)
    with open(os.path.join(args.source_root, "sample_class_stats.json"), "w") as f:
        json.dump(stats, f)
    with open(os.path.join(args.source_root, "samples_with_class.json"), "w") as f:
        json.dump(with_class, f)
    print(f"wrote RCS stats for {len(stats)} label files under {args.source_root}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    m = sub.add_parser("cityscapes", help="build a train/test manifest")
    m.add_argument("--source-root", required=True)
    m.add_argument("--target-root", required=True)
    m.add_argument("--target-glob", required=True)
    m.add_argument("--target-label-glob", default="")
    m.add_argument("--name", required=True)
    m.add_argument("--out", default="data/json_file")
    m.add_argument("--test", action="store_true")
    r = sub.add_parser("rcs", help="build rare-class-sampling statistics")
    r.add_argument("--source-root", required=True)
    args = p.parse_args()
    if args.cmd == "cityscapes":
        build_manifest(args)
    else:
        build_rcs_stats(args)


if __name__ == "__main__":
    main()
