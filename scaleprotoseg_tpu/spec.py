"""Static prototype-bank bookkeeping.

The reference tracks prototype->class assignment with a one-hot
``prototype_class_identity`` (P, C) buffer and prototype->scale assignment
with the ``scale_num_prototypes`` range dict
(`model_multiscale.py:129-149`).  Here all of that is captured in one
frozen, hashable ``ProtoSpec`` so it can be closed over by jitted
functions as static metadata, while the derived numpy index tensors give
the dense gather-based formulations used by the vectorized losses and the
group projection.

Prototype ordering convention (identical to the reference): prototypes are
laid out scale-major then class-major — for scale ``s`` and class ``c`` the
block ``[s*P/S + c*P/(S*C), s*P/S + (c+1)*P/(S*C))`` in the regular case.
After pruning the layout can become irregular; ``ProtoSpec`` supports any
per-prototype ``class_ids`` / ``scale_bounds`` assignment.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class ProtoSpec:
    """Static description of a prototype bank."""

    num_classes: int
    num_scales: int
    proto_depth: int                      # per-scale feature depth D
    class_ids: Tuple[int, ...]            # per-prototype class id, length P
    scale_bounds: Tuple[Tuple[int, int], ...]  # per-scale (start, end) ranges
    num_groups: int = 0                   # 0 => no group projection

    def __post_init__(self):
        # Scale bounds must tile [0, num_active) contiguously in scale
        # order — that invariant is what lets bank index == position in
        # the concatenated per-scale distance tensor ("distance layout").
        pos = 0
        for lo, hi in self.scale_bounds:
            if lo != pos or hi < lo:
                raise ValueError(
                    f"scale_bounds must be contiguous ascending from 0, "
                    f"got {self.scale_bounds}")
            pos = hi
        if pos > len(self.class_ids):
            raise ValueError("scale_bounds exceed the prototype bank")
        # Prototypes past the last scale bound (floor-division leftovers,
        # e.g. COCO group's 2054 % 4 == 2) never appear in the distance
        # tensor; they must be unassigned or downstream gathers would
        # reference rows the model never computes.
        for p in range(pos, len(self.class_ids)):
            if self.class_ids[p] >= 0:
                raise ValueError(
                    f"prototype {p} has class {self.class_ids[p]} but lies "
                    f"outside every scale bound (active count {pos})")

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------
    @classmethod
    def equal_allocation(cls, num_prototypes: int, proto_depth: int,
                         num_classes: int, num_scales: int = 4,
                         num_groups: int = 0) -> "ProtoSpec":
        """Equal per-class per-scale allocation (ref model_multiscale.py:131-149).

        Note the reference computes ``P // S`` and ``P // C // S`` with floor
        division; prototypes beyond ``S * C * (P // C // S)`` are left
        unassigned (identity row all-zero).  We reproduce that exactly by
        giving them class id -1.
        """
        per_scale = num_prototypes // num_scales
        per_class_scale = num_prototypes // num_classes // num_scales
        class_ids = [-1] * num_prototypes
        for s in range(num_scales):
            for c in range(num_classes):
                start = s * per_scale + c * per_class_scale
                for p in range(start, start + per_class_scale):
                    if p < num_prototypes:
                        class_ids[p] = c
        scale_bounds = tuple(
            (s * per_scale, (s + 1) * per_scale) for s in range(num_scales))
        return cls(num_classes=num_classes, num_scales=num_scales,
                   proto_depth=proto_depth, class_ids=tuple(class_ids),
                   scale_bounds=scale_bounds, num_groups=num_groups)

    def with_groups(self, num_groups: int) -> "ProtoSpec":
        return dataclasses.replace(self, num_groups=num_groups)

    def prune(self, prototypes_to_prune) -> "ProtoSpec":
        """Spec after dropping the given prototype indices
        (ref model_multiscale.py:400-432: per-scale ranges re-packed)."""
        drop = set(int(i) for i in prototypes_to_prune)
        keep = [i for i in range(self.num_prototypes) if i not in drop]
        new_class_ids = tuple(self.class_ids[i] for i in keep)
        new_bounds = []
        pos = 0
        for (lo, hi) in self.scale_bounds:
            n_kept = sum(1 for i in keep if lo <= i < hi)
            new_bounds.append((pos, pos + n_kept))
            pos += n_kept
        return dataclasses.replace(self, class_ids=new_class_ids,
                                   scale_bounds=tuple(new_bounds))

    def keep_indices(self, prototypes_to_prune) -> np.ndarray:
        drop = set(int(i) for i in prototypes_to_prune)
        return np.array([i for i in range(self.num_prototypes)
                         if i not in drop], dtype=np.int32)

    # ------------------------------------------------------------------
    # Basic properties
    # ------------------------------------------------------------------
    @property
    def num_prototypes(self) -> int:
        return len(self.class_ids)

    @property
    def num_active_prototypes(self) -> int:
        """Prototypes covered by the scale bounds — the width of the
        model's concatenated distance/activation tensors.  Equal to
        ``num_prototypes`` except when floor division leaves a dangling
        tail (ref segmentation/model/model_multiscale_group.py:152:
        ``P // S`` per scale, so e.g. the COCO group config's (2054,)
        bank yields 4 x 513 = 2052 active prototypes; the last 2 are
        unassigned and never used in forward).
        """
        return self.scale_bounds[-1][1] if self.scale_bounds else 0

    @property
    def feature_depth(self) -> int:
        """Total backbone channel count (S * D)."""
        return self.num_scales * self.proto_depth

    @property
    def scale_num_prototypes(self) -> Dict[int, Tuple[int, int]]:
        """Reference-compatible {scale: (start, end)} mapping."""
        return {s: b for s, b in enumerate(self.scale_bounds)}

    # ------------------------------------------------------------------
    # Derived index tensors (cached; numpy, consumed as static constants)
    # ------------------------------------------------------------------
    @functools.cached_property
    def class_identity(self) -> np.ndarray:
        """One-hot (P, C) float32 — ref ``prototype_class_identity``."""
        out = np.zeros((self.num_prototypes, self.num_classes), np.float32)
        for p, c in enumerate(self.class_ids):
            if c >= 0:
                out[p, c] = 1.0
        return out

    @functools.cached_property
    def scale_ids(self) -> np.ndarray:
        """(P,) int32 scale id per prototype."""
        out = np.zeros((self.num_prototypes,), np.int32)
        for s, (lo, hi) in enumerate(self.scale_bounds):
            out[lo:hi] = s
        return out

    @functools.cached_property
    def class_counts(self) -> np.ndarray:
        """(C,) number of prototypes per class."""
        return self.class_identity.sum(axis=0).astype(np.int32)

    @property
    def max_protos_per_class(self) -> int:
        return int(self.class_counts.max()) if self.num_prototypes else 0

    @functools.cached_property
    def class_proto_index(self) -> np.ndarray:
        """(C, Pc_max) int32 prototype indices per class, ascending, -1 pad.

        Ascending order matches the reference's
        ``torch.nonzero(prototype_class_identity[:, c])`` everywhere a class's
        prototypes are gathered (e.g. `model_multiscale_group.py:298`).
        """
        pc = self.max_protos_per_class
        out = np.full((self.num_classes, pc), -1, np.int32)
        for c in range(self.num_classes):
            idx = np.nonzero(self.class_identity[:, c])[0]
            out[c, :len(idx)] = idx
        return out

    @functools.cached_property
    def class_proto_mask(self) -> np.ndarray:
        """(C, Pc_max) float32 validity mask for ``class_proto_index``."""
        return (self.class_proto_index >= 0).astype(np.float32)

    @functools.cached_property
    def class_scale_proto_index(self) -> np.ndarray:
        """(C, S, k_max) int32 prototype indices per (class, scale), -1 pad."""
        k = 0
        per = {}
        for c in range(self.num_classes):
            for s, (lo, hi) in enumerate(self.scale_bounds):
                idx = [p for p in range(lo, hi) if self.class_ids[p] == c]
                per[(c, s)] = idx
                k = max(k, len(idx))
        out = np.full((self.num_classes, self.num_scales, max(k, 1)), -1,
                      np.int32)
        for (c, s), idx in per.items():
            out[c, s, :len(idx)] = idx
        return out

    @functools.cached_property
    def class_scale_proto_mask(self) -> np.ndarray:
        return (self.class_scale_proto_index >= 0).astype(np.float32)

    @functools.cached_property
    def class_proto_onehot(self) -> np.ndarray:
        """(C, Pc_max, Pa) float32 one-hot selection of
        ``class_proto_index`` (all-zero rows at -1 padding).  Same
        rationale as ``class_scale_proto_onehot``: keeps gathers of
        (..., Pa) activation tensors expressible as matmuls so the
        backward never scatters.  The last dim is the *distance layout*
        width ``num_active_prototypes`` — what the model actually emits —
        not the bank size (they differ on floor-division-leftover banks
        like COCO group's 2054)."""
        idx = self.class_proto_index
        out = np.zeros(idx.shape + (self.num_active_prototypes,), np.float32)
        c, q = np.nonzero(idx >= 0)
        out[c, q, idx[c, q]] = 1.0
        return out

    @functools.cached_property
    def class_scale_proto_onehot(self) -> np.ndarray:
        """(C, S, k_max, Pa) float32 one-hot selection of
        ``class_scale_proto_index`` (all-zero rows at -1 padding).

        Gathering (B, N, Pa) arrays along the prototype dim with the index
        tensor has a scatter-add backward, which lowers to a serial loop
        on TPU; a one-hot einsum is exact (single 1.0 per row) and both
        directions are matmuls.  Last dim = ``num_active_prototypes``
        (distance layout), see ``class_proto_onehot``.
        """
        idx = self.class_scale_proto_index
        out = np.zeros(idx.shape + (self.num_active_prototypes,), np.float32)
        c, s, k = np.nonzero(idx >= 0)
        out[c, s, k, idx[c, s, k]] = 1.0
        return out

    @functools.cached_property
    def class_scale_counts(self) -> np.ndarray:
        """(C, S) int32 prototype counts per (class, scale)."""
        return self.class_scale_proto_mask.sum(axis=-1).astype(np.int32)

    @functools.cached_property
    def class_proto_scale_mask(self) -> np.ndarray:
        """(C, S, Pc_max) — which padded per-class column belongs to scale s.

        Used by the ScaleMax group loss, which slices a class's group-weight
        matrix into per-scale column blocks (ref loss.py:368-390).
        """
        out = np.zeros((self.num_classes, self.num_scales,
                        self.max_protos_per_class), np.float32)
        for c in range(self.num_classes):
            for j, p in enumerate(self.class_proto_index[c]):
                if p >= 0:
                    out[c, self.scale_ids[p], j] = 1.0
        return out

    @functools.cached_property
    def class_has_protos(self) -> np.ndarray:
        """(C,) float32 — 1 where the class owns at least one prototype."""
        return (self.class_counts > 0).astype(np.float32)

    @functools.cached_property
    def group_class_identity(self) -> np.ndarray:
        """(C*G, C) one-hot group->class identity (ref
        model_multiscale_group.py:262-267, packed over non-empty classes
        there; here full C slots with empty-class rows zeroed)."""
        g = self.num_groups
        out = np.zeros((self.num_classes * g, self.num_classes), np.float32)
        for c in range(self.num_classes):
            if self.class_counts[c] > 0:
                out[c * g:(c + 1) * g, c] = 1.0
        return out

    @property
    def is_regular(self) -> bool:
        """True when every (class, scale) cell has the same prototype count
        and the layout is the pristine scale-major/class-major block form."""
        counts = self.class_scale_counts
        return bool((counts == counts[0, 0]).all()) and counts[0, 0] > 0
