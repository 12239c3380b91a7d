"""Decode Pascal Panoptic-Parts annotations for the interpretability
metrics.

CLI parity with `python -m segmentation.data.preprocess_part_pascal`
(ref data/preprocess_part_pascal.py): decodes the
``labels/{split}`` uid TIFs of pascal-panoptic-parts into
``annotations_{PIDS,SIDS,IIDS}/{split}/{img_id}.npy``.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np
from PIL import Image

from scaleprotoseg_tpu import settings
from scaleprotoseg_tpu.data.panoptic_parts_lite import decode_uids


def preprocess_part_pascal(source: Optional[str] = None,
                           target: Optional[str] = None,
                           splits=("val",)) -> None:
    source = source or settings.source_data_path("pascal")
    target = target or settings.data_path("pascal")
    parts_root = os.path.join(source, "pascal_panoptic_parts", "labels")
    for split in splits:
        split_dir = os.path.join(parts_root, split)
        if not os.path.isdir(split_dir):
            print(f"skipping {split}: {split_dir} not found")
            continue
        for kind in ("PIDS", "SIDS", "IIDS"):
            os.makedirs(os.path.join(target, f"annotations_{kind}",
                                     split), exist_ok=True)
        for file in sorted(os.listdir(split_dir)):
            if not file.endswith((".tif", ".png")):
                continue
            img_id = os.path.splitext(file)[0]
            uids = np.asarray(Image.open(os.path.join(split_dir, file)))
            sids, iids, pids = decode_uids(uids)
            for kind, arr in (("PIDS", pids), ("SIDS", sids),
                              ("IIDS", iids)):
                np.save(os.path.join(target, f"annotations_{kind}",
                                     split, f"{img_id}.npy"), arr)
    print("done")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", default=None)
    p.add_argument("--target", default=None)
    p.add_argument("--splits", nargs="+", default=["val"])
    a = p.parse_args()
    preprocess_part_pascal(source=a.source, target=a.target,
                           splits=tuple(a.splits))


if __name__ == "__main__":
    main()
