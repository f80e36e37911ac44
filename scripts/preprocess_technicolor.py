#!/usr/bin/env python
"""Technicolor dataset preparation CLI — the reference's
scripts/pre_technicolor.py + preprocess_all_techni.sh.

  python scripts/preprocess_technicolor.py --videopath /data/Technicolor/Birthday
  python scripts/preprocess_technicolor.py --root /data/Technicolor --all
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ex4dgs_tpu.preprocess.technicolor import (  # noqa: E402
    SCENE_WINDOWS,
    prepare_technicolor_scene,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--videopath", default="", help="one scene directory")
    ap.add_argument("--root", default="", help="dataset root (with --all)")
    ap.add_argument("--all", action="store_true",
                    help="prepare all five reference scenes")
    ap.add_argument("--offsets", type=int, nargs="*", default=None,
                    help="frame offsets (default: the scene's window start)")
    args = ap.parse_args(argv)

    if args.all:
        for scene in SCENE_WINDOWS:
            prepare_technicolor_scene(os.path.join(args.root, scene),
                                      offsets=args.offsets)
    else:
        prepare_technicolor_scene(args.videopath, offsets=args.offsets)


if __name__ == "__main__":
    main()
