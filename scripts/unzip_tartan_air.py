#!/usr/bin/env python3
"""Unpack TartanAir downloads into the layout the loaders expect
(reference scripts/unzip_tartan_air.py): each {dataset}/{level} dir
holding depth_left.zip + image_left.zip becomes
{dataset}/{level}/P***/{depth_left,image_left,pose_left.txt}.
"""
import argparse
import glob
import os
import os.path as osp
import zipfile

LEVELS = ("Easy", "Hard")


def unzip(tartanair_path: str, remove_zip: bool = False) -> None:
    for dataset in sorted(glob.glob(osp.join(tartanair_path, "*"))):
        if not osp.isdir(dataset):
            continue
        name = osp.basename(dataset)
        for level in LEVELS:
            level_path = osp.join(dataset, level)
            zips = [osp.join(level_path, z)
                    for z in ("depth_left.zip", "image_left.zip")]
            missing = [z for z in zips if not osp.exists(z)]
            if missing:
                if osp.isdir(level_path):
                    print(f"{name}/{level}: missing "
                          f"{[osp.basename(m) for m in missing]}, skip")
                continue
            if glob.glob(osp.join(level_path, "P*")):
                print(f"{name}/{level}: already unzipped, skip")
                continue
            for z in zips:
                print(f"unzipping {z}")
                with zipfile.ZipFile(z) as f:
                    # archives prefix members with {name}/{level}/ --
                    # extract at the root so P*** lands in level_path
                    f.extractall(tartanair_path)
                if remove_zip:
                    os.remove(z)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="datasets/TartanAir")
    ap.add_argument("--remove_zip", action="store_true")
    args = ap.parse_args()
    unzip(args.path, args.remove_zip)
