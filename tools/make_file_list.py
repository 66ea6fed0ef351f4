#!/usr/bin/env python
"""Write a train/val file list from image folders.

Parity target: reference ``tools/make_file_list.py`` (file_backend list
prep for the dataset classes)."""

from __future__ import annotations

import argparse
import os
import random

from instarevive_tpu.utils.image_io import list_image_files


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img_folder", nargs="+", required=True)
    p.add_argument("--val_size", type=int, default=0)
    p.add_argument("--save_folder", required=True)
    p.add_argument("--follow_links", action="store_true")
    p.add_argument("--seed", type=int, default=231)
    args = p.parse_args()

    files = []
    for folder in args.img_folder:
        files += list_image_files(folder, recursive=True)
    random.Random(args.seed).shuffle(files)

    os.makedirs(args.save_folder, exist_ok=True)
    val, train = files[: args.val_size], files[args.val_size:]
    for name, split in [("train.list", train), ("val.list", val)]:
        with open(os.path.join(args.save_folder, name), "w") as f:
            f.write("\n".join(split))
        print(f"{name}: {len(split)} files")


if __name__ == "__main__":
    main()
