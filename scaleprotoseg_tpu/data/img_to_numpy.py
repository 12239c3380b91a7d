"""CLI: python -m scaleprotoseg_tpu.data.img_to_numpy <data_type>
(parity with segmentation/data/img_to_numpy.py)."""

import argparse

from scaleprotoseg_tpu.data.preprocess import img_to_numpy


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_type")
    p.add_argument("--margin", type=int, default=0)
    a = p.parse_args()
    img_to_numpy(a.data_type, margin=a.margin)


if __name__ == "__main__":
    main()
