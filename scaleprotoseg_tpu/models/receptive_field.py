"""Receptive-field bookkeeping for generic conv feature extractors.

Parity with the reference's `receptive_field.py` (itself from
gmum/proto-segmentation): the classic [n, jump, rf_size, start] recursion
over a conv stack, used by the VGG/ResNet/DenseNet prototype paths to map
a prototype-grid cell back to an input-image receptive-field box.  The
DeepLab paths don't use it (ref model_multiscale.py:93 "NOT used").
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple, Union


def compute_layer_rf_info(layer_filter_size: int, layer_stride: int,
                          layer_padding, previous_layer_rf_info):
    n_in, j_in, r_in, start_in = previous_layer_rf_info
    if layer_padding == "SAME":
        n_out = math.ceil(float(n_in) / float(layer_stride))
        rem = n_in % layer_stride
        pad = max(layer_filter_size - (layer_stride if rem == 0 else rem),
                  0)
    elif layer_padding == "VALID":
        n_out = math.ceil(
            float(n_in - layer_filter_size + 1) / float(layer_stride))
        pad = 0
    else:  # int: per-side padding
        pad = layer_padding * 2
        n_out = math.floor(
            (n_in - layer_filter_size + pad) / layer_stride) + 1
    p_left = math.floor(pad / 2)
    return [n_out,
            j_in * layer_stride,
            r_in + (layer_filter_size - 1) * j_in,
            start_in + ((layer_filter_size - 1) / 2 - p_left) * j_in]


def compute_proto_layer_rf_info_v2(img_size: int,
                                   layer_filter_sizes: Sequence[int],
                                   layer_strides: Sequence[int],
                                   layer_paddings: Sequence,
                                   prototype_kernel_size: int) -> List:
    assert len(layer_filter_sizes) == len(layer_strides) == \
        len(layer_paddings)
    rf_info = [img_size, 1, 1, 0.5]
    for f, s, p in zip(layer_filter_sizes, layer_strides, layer_paddings):
        rf_info = compute_layer_rf_info(f, s, p, rf_info)
    return compute_layer_rf_info(prototype_kernel_size, 1, "VALID",
                                 rf_info)


def compute_rf_at_spatial_location(img_height: int, img_width: int,
                                   height_index: int, width_index: int,
                                   rf_info) -> List[int]:
    n, j, r, start = rf_info
    assert height_index < n and width_index < n
    ch = start + height_index * j
    cw = start + width_index * j
    return [max(int(ch - r / 2), 0), min(int(ch + r / 2), img_height),
            max(int(cw - r / 2), 0), min(int(cw + r / 2), img_width)]


def compute_rf_prototype(img_size: Union[int, Tuple[int, int]],
                         prototype_patch_index, rf_info) -> List[int]:
    if isinstance(img_size, tuple):
        h, w = img_size
    else:
        h = w = img_size
    img_index, hi, wi = prototype_patch_index[:3]
    return [img_index] + compute_rf_at_spatial_location(h, w, hi, wi,
                                                        rf_info)
