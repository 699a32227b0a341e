"""Dataset index builders (regenerate the reference's shipped index files).

The reference consumes pre-built index files: ``datasets/DAVIS.json``
(video name + frame count per subset, utils/data_loaders.py:148-262) and
plain-text image-id lists for the static-image pretrain sets
(``datasets/msra10k.txt`` etc., utils/data_loaders.py:495-654). Those files
are artifacts checked into the reference repo; these helpers rebuild them
from a dataset directory so a fresh DAVIS / image-set download is usable
without copying files out of the reference.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")

# DAVIS-2017 split files -> index keys (ImageSets/2017/<split>.txt)
_DAVIS_SPLITS = (
    ("train", "train.txt"),
    ("val", "val.txt"),
    ("test", "test-dev.txt"),
    ("test-challenge", "test-challenge.txt"),
)


def count_frames(video_dir: str) -> int:
    """Number of image frames in a video directory."""
    if not os.path.isdir(video_dir):
        return 0
    return sum(
        1 for f in os.listdir(video_dir) if f.lower().endswith(_IMG_EXTS)
    )


def build_davis_index(
    root: str,
    year: str = "2017",
    resolution: str = "480p",
) -> Dict[str, List[dict]]:
    """Build the DAVIS.json-style index from a DAVIS directory tree.

    Reads ``ImageSets/<year>/<split>.txt`` video lists and counts frames in
    ``JPEGImages/<resolution>/<video>/``. Missing split files yield empty
    lists (the reference index has train 60 / val 30 / test 30 /
    test-challenge 30 entries, SURVEY §2.4).
    """
    index: Dict[str, List[dict]] = {}
    for key, filename in _DAVIS_SPLITS:
        split_path = os.path.join(root, "ImageSets", year, filename)
        videos: List[dict] = []
        if os.path.isfile(split_path):
            with open(split_path, "r", encoding="utf-8") as f:
                names = [line.strip() for line in f if line.strip()]
            for name in names:
                n = count_frames(os.path.join(root, "JPEGImages", resolution, name))
                videos.append({"name": name, "n_frames": n})
        index[key] = videos
    return index


def build_file_list(directory: str) -> List[str]:
    """Sorted image-id stems in a directory (the txt-list format of the
    msra10k/mscoco/ade20k pretrain indexes)."""
    if not os.path.isdir(directory):
        return []
    stems = [
        os.path.splitext(f)[0]
        for f in os.listdir(directory)
        if f.lower().endswith(_IMG_EXTS)
    ]
    return sorted(stems)


def write_davis_index(root: str, out_path: str, **kwargs) -> str:
    """Build and save a DAVIS index JSON; returns the output path."""
    index = build_davis_index(root, **kwargs)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(index, f, indent=1)
    return out_path


def write_file_list(directory: str, out_path: str) -> str:
    """Build and save an image-id list (one stem per line)."""
    ids = build_file_list(directory)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(ids) + ("\n" if ids else ""))
    return out_path


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="Rebuild dataset index files.")
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("davis", help="DAVIS.json from a DAVIS root")
    d.add_argument("root")
    d.add_argument("out")
    d.add_argument("--year", default="2017")
    d.add_argument("--resolution", default="480p")
    i = sub.add_parser("imagelist", help="image-id txt list from a directory")
    i.add_argument("directory")
    i.add_argument("out")
    args = p.parse_args(argv)
    if args.cmd == "davis":
        path = write_davis_index(args.root, args.out, year=args.year,
                                 resolution=args.resolution)
    else:
        path = write_file_list(args.directory, args.out)
    print(path)


if __name__ == "__main__":
    main()
