#!/usr/bin/env python
"""N3V dataset preparation CLI (the reference's scripts/pre_n3d.py surface):
extract 300 frames per camera video, seed known-pose COLMAP, triangulate.

Usage: python scripts/preprocess_n3v.py --videopath /data/cook_spinach
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--videopath", required=True)
    p.add_argument("--offset", type=int, default=0)
    p.add_argument("--frames", type=int, default=300)
    args = p.parse_args()

    from ex4dgs_tpu.preprocess.pipeline import prepare_n3v_scene

    project = prepare_n3v_scene(args.videopath, offset=args.offset,
                                n_frames=args.frames)
    print(f"prepared {project}")


if __name__ == "__main__":
    main()
