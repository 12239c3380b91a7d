"""CLI: python -m scaleprotoseg_tpu.data.preprocess_em [n_jobs]
(parity with segmentation/data/preprocess_em.py)."""

import argparse

from scaleprotoseg_tpu.data.preprocess import preprocess_em


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("n_jobs", nargs="?", type=int, default=8)
    p.add_argument("--source", default=None)
    p.add_argument("--target", default=None)
    a = p.parse_args()
    preprocess_em(n_jobs=a.n_jobs, source=a.source, target=a.target)


if __name__ == "__main__":
    main()
