"""Dataset class-ID mappings and normalization constants.

Parity with reference `segmentation/constants.py` (see SURVEY.md §2.2).
Convention used across the whole framework (ref `loss.py:32`,
`eval_valid_multiscale.py:236`): **label 0 = void**, class ``c`` is stored
as label ``c + 1``; losses and eval subtract 1 before use.

The tables themselves are dataset facts (Cityscapes official label spec,
Pascal VOC, ADE20K, COCO-Stuff, ISBI-2012 EM); we store them as data plus
vectorized numpy lookup helpers for the TPU input pipeline.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# ImageNet normalization (used by every dataset; ref constants.py:16-17)
# --------------------------------------------------------------------------
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CITYSCAPES_MEAN = list(IMAGENET_MEAN)
CITYSCAPES_STD = list(IMAGENET_STD)

# --------------------------------------------------------------------------
# Cityscapes (ref constants.py:23-123)
# --------------------------------------------------------------------------
# Official cityscapesScripts label table, with all `void`-category ids merged
# into a single leading "void" name.  Index in CITYSCAPES_CATEGORIES is the
# "category index" used by the preprocessed .npy annotations.
CITYSCAPES_ID_2_LABEL = {
    **{i: "void" for i in range(7)},
    7: "road", 8: "sidewalk", 9: "parking", 10: "rail track", 11: "building",
    12: "wall", 13: "fence", 14: "guard rail", 15: "bridge", 16: "tunnel",
    17: "pole", 18: "polegroup", 19: "traffic light", 20: "traffic sign",
    21: "vegetation", 22: "terrain", 23: "sky", 24: "person", 25: "rider",
    26: "car", 27: "truck", 28: "bus", 29: "caravan", 30: "trailer",
    31: "train", 32: "motorcycle", 33: "bicycle", -1: "license plate",
}

CITYSCAPES_CATEGORIES = ["void"] + [
    CITYSCAPES_ID_2_LABEL[i] for i in range(7, 34)
] + ["license plate"]

# category-index -> (1 + 19-class train id); 0 stays void.  Categories whose
# official label has ignoreInEval=True map to 0.
_CITYSCAPES_19_NAMES = [
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
]
CITYSCAPES_19_EVAL_CATEGORIES = {
    idx: (_CITYSCAPES_19_NAMES.index(name) + 1 if name in _CITYSCAPES_19_NAMES else 0)
    for idx, name in enumerate(CITYSCAPES_CATEGORIES)
}

# --------------------------------------------------------------------------
# Pascal VOC-2012 (ref constants.py:125-173): raw id k -> k+1, 255 -> 0 void.
# --------------------------------------------------------------------------
PASCAL_ID_MAPPING = {255: 0, **{k: k + 1 for k in range(21)}}

PASCAL_CATEGORIES = ["void", "__background__"] + [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]

# Interpretability-metric constants (ref constants.py:11-13)
MAX_PARTS_CITY = 5
MAX_PARTS_PASCAL = 24
PASCAL_FILTER_CLASS = [1, 5, 10, 11, 19]

# --------------------------------------------------------------------------
# ADE20K (ref constants.py:176-327): ids already shifted by -1 vs release ids.
# --------------------------------------------------------------------------
ADE20K_LABELS = [
    "wall", "building", "sky", "floor", "tree", "ceiling", "road", "bed",
    "windowpane", "grass", "cabinet", "sidewalk", "person", "earth", "door",
    "table", "mountain", "plant", "curtain", "chair", "car", "water",
    "painting", "sofa", "shelf", "house", "sea", "mirror", "rug", "field",
    "armchair", "seat", "fence", "desk", "rock", "wardrobe", "lamp",
    "bathtub", "railing", "cushion", "base", "box", "column", "signboard",
    "chest of drawers", "counter", "sand", "sink", "skyscraper", "fireplace",
    "refrigerator", "grandstand", "path", "stairs", "runway", "case",
    "pool table", "pillow", "screen door", "stairway", "river", "bridge",
    "bookcase", "blind", "coffee table", "toilet", "flower", "book", "hill",
    "bench", "countertop", "stove", "palm", "kitchen island", "computer",
    "swivel chair", "boat", "bar", "arcade machine", "hovel", "bus", "towel",
    "light", "truck", "tower", "chandelier", "awning", "streetlight",
    "booth", "television receiver", "airplane", "dirt track", "apparel",
    "pole", "land", "bannister", "escalator", "ottoman", "bottle", "buffet",
    "poster", "stage", "van", "ship", "fountain", "conveyer belt", "canopy",
    "washer", "plaything", "swimming pool", "stool", "barrel", "basket",
    "waterfall", "tent", "bag", "minibike", "cradle", "oven", "ball", "food",
    "step", "tank", "trade name", "microwave", "pot", "animal", "bicycle",
    "lake", "dishwasher", "screen", "blanket", "sculpture", "hood", "sconce",
    "vase", "traffic light", "tray", "ashcan", "fan", "pier", "crt screen",
    "plate", "monitor", "bulletin board", "shower", "radiator", "glass",
    "clock", "flag",
]
ADE20k_ID_2_LABEL = dict(enumerate(ADE20K_LABELS))

# --------------------------------------------------------------------------
# COCO-Stuff (ref constants.py:329-517): raw id k -> k+1, 255 -> 0 void.
# --------------------------------------------------------------------------
COCO_ID_MAPPING = {**{i: i + 1 for i in range(182)}, 255: 0}

COCO_LABELS = [
    # 80 "things" (ids 0-89 in the original paper numbering incl. gaps kept
    # as named placeholders) + 91 "stuff"
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "street sign",
    "stop sign", "parking meter", "bench", "bird", "cat", "dog", "horse",
    "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "hat",
    "backpack", "umbrella", "shoe", "eye glasses", "handbag", "tie",
    "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "plate", "wine glass", "cup", "fork", "knife",
    "spoon", "bowl", "banana", "apple", "sandwich", "orange", "broccoli",
    "carrot", "hot dog", "pizza", "donut", "cake", "chair", "couch",
    "potted plant", "bed", "mirror", "dining table", "window", "desk",
    "toilet", "door", "tv", "laptop", "mouse", "remote", "keyboard",
    "cell phone", "microwave", "oven", "toaster", "sink", "refrigerator",
    "blender", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush", "hair brush", "banner", "blanket", "branch",
    "bridge", "building-other", "bush", "cabinet", "cage", "cardboard",
    "carpet", "ceiling-other", "ceiling-tile", "cloth", "clothes", "clouds",
    "counter", "cupboard", "curtain", "desk-stuff", "dirt", "door-stuff",
    "fence", "floor-marble", "floor-other", "floor-stone", "floor-tile",
    "floor-wood", "flower", "fog", "food-other", "fruit", "furniture-other",
    "grass", "gravel", "ground-other", "hill", "house", "leaves", "light",
    "mat", "metal", "mirror-stuff", "moss", "mountain", "mud", "napkin",
    "net", "paper", "pavement", "pillow", "plant-other", "plastic",
    "platform", "playingfield", "railing", "railroad", "river", "road",
    "rock", "roof", "rug", "salad", "sand", "sea", "shelf", "sky-other",
    "skyscraper", "snow", "solid-other", "stairs", "stone", "straw",
    "structural-other", "table", "tent", "textile-other", "towel", "tree",
    "vegetable", "wall-brick", "wall-concrete", "wall-other", "wall-panel",
    "wall-stone", "wall-tile", "wall-wood", "water-other", "waterdrops",
    "window-blind", "window-other", "wood",
]
COCO_ID_2_LABEL = dict(enumerate(COCO_LABELS))

# --------------------------------------------------------------------------
# EM / ISBI-2012 (ref constants.py:5-9)
# --------------------------------------------------------------------------
EM_VAL_SIZE = 10
EM_RGB_2_ID = {0: 1, 255: 2}  # grayscale value -> label (0 reserved for void)
EM_ID_2_LABEL = {0: "background", 1: "cell"}
CLASS_WEIGHTS = [1.0, 1.0]


# --------------------------------------------------------------------------
# Vectorized lookup helpers (TPU-friendly: applied host-side via np.take)
# --------------------------------------------------------------------------
def mapping_to_lut(mapping: dict, size: int = 256, dtype=np.uint8) -> np.ndarray:
    """Build a dense lookup table from an {input_id: output_id} mapping.

    Unmapped ids pass through unchanged (clipped to dtype).  Negative keys
    are stored at ``size + key`` (wrap-around), matching uint8 label images.
    """
    lut = np.arange(size, dtype=np.int64)
    for k, v in mapping.items():
        lut[k % size] = v
    return lut.astype(dtype)


CITYSCAPES_19_LUT = mapping_to_lut(CITYSCAPES_19_EVAL_CATEGORIES, size=256)
PASCAL_LUT = mapping_to_lut(PASCAL_ID_MAPPING, size=256)
COCO_LUT = mapping_to_lut(COCO_ID_MAPPING, size=256)


def convert_targets(targets: np.ndarray, data_type: str,
                    only_19_from_cityscapes: bool = True) -> np.ndarray:
    """Vectorized online label-id conversion (ref `dataset.py:75-80`):
    only cityscapes/pascal convert at load time — ADE/EM/COCO ids are
    already final after offline preprocessing (COCO_LUT is applied by
    ``data.preprocess``)."""
    if data_type == "cityscapes" and only_19_from_cityscapes:
        return CITYSCAPES_19_LUT[targets]
    if data_type == "pascal":
        return PASCAL_LUT[targets]
    return targets


def conversion_lut(data_type: str) -> np.ndarray:
    """Dense 256-entry online-conversion LUT (identity when no online
    conversion applies); consumed by the native fastaug kernel."""
    if data_type == "cityscapes":
        return CITYSCAPES_19_LUT
    if data_type == "pascal":
        return PASCAL_LUT
    return np.arange(256, dtype=np.uint8)


def num_classes_for(data_type: str) -> int:
    return {
        "cityscapes": 19,
        "pascal": 21,
        "ade": 150,
        "coco": 182,
        "em": 2,
    }[data_type]
