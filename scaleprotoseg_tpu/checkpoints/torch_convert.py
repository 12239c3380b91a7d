"""Torch checkpoint conversion: torchvision backbones and reference
whole-module pickles -> framework param trees.

Three interchange paths (SURVEY.md §5 "checkpoint/resume" + §7 risks):

1. ``torchvision_resnet_to_backbone``: ImageNet torchvision ResNet state
   dict -> our DeepLabV2 backbone tree, reproducing the reference's key
   remap semantics (`deeplab_features.py:18-60`: torchvision
   ``layerN.M.convK`` -> deeplab ``layer{N+1}.block{M+1}.{reduce|conv3x3|
   increase}``, ``downsample`` -> ``shortcut``) plus the torch->flax
   layout transposes (OIHW -> HWIO kernels, BN affine/stats split into
   params vs batch_stats).
2. ``load_reference_pickle``: the reference's ``torch.save(whole module)``
   pickles (e.g. Zenodo checkpoints) are unpickled with stub classes for
   the missing ``deeplab_pytorch`` package, the tensor tree is walked via
   named parameters/buffers, and mapped onto our PPNet tree.
3. ``load_torch_backbone_into``: env-pointed backbone file -> variables.

All conversion is name-driven and validated by count assertions, like the
reference's own remap (`train_wandb_multiscale.py:106-145`).
"""

from __future__ import annotations

import io
import pickle
import sys
import types
from typing import Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# torchvision -> deeplab key remap (semantics of deeplab_features.py:18-60)
# ---------------------------------------------------------------------------
def torchvision_key_to_deeplab(key: str) -> Optional[str]:
    parts = key.split(".")
    if parts[0].startswith("layer"):
        layer = int(parts[0][len("layer"):]) + 1
        block = f"block{int(parts[1]) + 1}"
        unit = parts[2]
        if unit == "downsample":
            sub = {0: "conv", 1: "bn"}[int(parts[3])]
            return f"layer{layer}.{block}.shortcut.{sub}.{parts[-1]}"
        kind, num = unit[:-1], int(unit[-1])
        name = {1: "reduce", 2: "conv3x3", 3: "increase"}[num]
        return f"layer{layer}.{block}.{name}.{kind}.{parts[-1]}"
    if parts[0] in ("conv1", "bn1"):
        return f"layer1.conv1.{parts[0][:-1]}.{parts[-1]}"
    return None  # fc etc.


def _assign_convbn(params: Dict, stats: Dict, path: Tuple[str, ...],
                   leaf: str, value: np.ndarray):
    """Place one deeplab-named tensor into flax params/batch_stats dicts."""
    *mods, unit, kind = path  # e.g. ('layer2','block1','reduce'), 'conv'
    node = params
    snode = stats
    for m in (*mods, unit):
        node = node.setdefault(m, {})
        snode = snode.setdefault(m, {})
    if kind == "conv":
        if leaf == "weight":  # OIHW -> HWIO
            node.setdefault("conv", {})["kernel"] = \
                value.transpose(2, 3, 1, 0)
        elif leaf == "bias":
            node.setdefault("conv", {})["bias"] = value
    elif kind == "bn":
        bn = node.setdefault("bn", {})
        sbn = snode.setdefault("bn", {})
        if leaf == "weight":
            bn["scale"] = value
        elif leaf == "bias":
            bn["bias"] = value
        elif leaf == "running_mean":
            sbn["mean"] = value
        elif leaf == "running_var":
            sbn["var"] = value


def torchvision_resnet_to_backbone(state_dict: Dict[str, np.ndarray]
                                   ) -> Tuple[Dict, Dict]:
    """(backbone params, backbone batch_stats) from a torchvision ResNet
    state dict (tensors already as numpy)."""
    params: Dict = {}
    stats: Dict = {}
    n = 0
    for key, value in state_dict.items():
        dl_key = torchvision_key_to_deeplab(key)
        if dl_key is None or key.endswith("num_batches_tracked"):
            continue
        *path, leaf = dl_key.split(".")
        _assign_convbn(params, stats, tuple(path), leaf,
                       np.asarray(value))
        n += 1
    assert n > 0, "no convertible keys found"
    return params, stats


def deeplab_statedict_to_backbone(state_dict: Dict[str, np.ndarray]
                                  ) -> Tuple[Dict, Dict]:
    """Deeplab-named state dict (layerN.blockM.unit.{conv,bn}.x + aspp.cK)
    -> (params, batch_stats)."""
    params: Dict = {}
    stats: Dict = {}
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        value = np.asarray(value)
        parts = key.split(".")
        if parts[0] == "aspp":
            aspp = params.setdefault("aspp", {})
            branch = aspp.setdefault(parts[1], {})
            if parts[-1] == "weight":
                branch["kernel"] = value.transpose(2, 3, 1, 0)
            else:
                branch["bias"] = value
            continue
        *path, leaf = parts
        # path like layer2.block1.reduce.conv or layer1.conv1.bn:
        # the final component is the conv/bn discriminator.
        _assign_convbn(params, stats, tuple(path), leaf, value)
    return params, stats


# ---------------------------------------------------------------------------
# Reference whole-module pickle loading (stub-class unpickling)
# ---------------------------------------------------------------------------
class _Stub:
    """Duck container standing in for any missing torch nn.Module class."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)

    def _walk(self, prefix=""):
        """Yield (name, tensor) like torch named_parameters + buffers."""
        yield from _walk_any(self, prefix)


def _walk_any(mod, prefix=""):
    """Named parameters + buffers of a mixed stub/real module tree.

    Real torch containers can hold stub children (reference pickles:
    importable ``nn.Sequential`` wrapping missing ``deeplab_pytorch``
    block classes), so ``state_dict()`` is unusable on them — it
    recurses into children assuming every one is an nn.Module.  Walk
    the ``_parameters``/``_buffers``/``_modules`` dicts directly
    instead; both stubs and real modules carry exactly these."""
    d = getattr(mod, "__dict__", {})
    for coll in ("_parameters", "_buffers"):
        for name, t in (d.get(coll) or {}).items():
            if t is not None:
                yield prefix + name, t
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            yield from _walk_any(child, prefix + name + ".")


def _install_stub_modules():
    """Register stub module trees so reference pickles resolve."""
    roots = [
        "segmentation", "segmentation.model", "segmentation.model.model",
        "segmentation.model.model_multiscale",
        "segmentation.model.model_multiscale_group",
        "segmentation.model.scale_head",
        "segmentation.model.deeplab_features", "segmentation.utils",
        "deeplab_pytorch", "deeplab_pytorch.libs",
        "deeplab_pytorch.libs.models",
        "deeplab_pytorch.libs.models.deeplabv2",
        "deeplab_pytorch.libs.models.deeplabv2_multiscale",
        "deeplab_pytorch.libs.models.deeplabv3_multiscale",
        "deeplab_pytorch.libs.models.unet",
        "deeplab_pytorch.libs.models.resnet",
    ]
    for name in roots:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (_Stub,), {"__module__": module})


def load_reference_pickle(path: str) -> Dict[str, np.ndarray]:
    """Flat {torch_name: numpy array} from a reference whole-module pickle
    (requires torch for tensor deserialization)."""
    sd, _ = load_reference_pickle_with_meta(path)
    return sd


def load_reference_pickle_with_meta(path: str):
    """(state_dict, metadata) from a reference whole-module pickle.

    Metadata recovers the non-tensor attributes the reference stores on
    the module object (``num_scales``, ``scale_num_prototypes``,
    ``num_groups``, ``prototype_class_identity``, ``epsilon``, ...) —
    these never appear in a state dict but are needed to rebuild the
    ProtoSpec for pushed/pruned (irregular) checkpoints.
    """
    import torch

    _install_stub_modules()
    with open(path, "rb") as f:
        obj = torch.load(f, map_location="cpu",
                         pickle_module=_patched_pickle(),
                         weights_only=False)

    meta = {}
    d = getattr(obj, "__dict__", {})
    for key in ("num_scales", "scale_num_prototypes", "num_groups",
                "epsilon", "incorrect_strength", "img_size",
                "prototype_activation_function", "patch_classification"):
        if key in d:
            meta[key] = d[key]
    pci = d.get("prototype_class_identity")
    if pci is not None and hasattr(pci, "detach"):
        meta["prototype_class_identity"] = pci.detach().cpu().numpy()

    try:
        # fully-importable pickles (rare) take the exact torch path
        sd = {k: v.detach().cpu().numpy()
              for k, v in obj.state_dict().items()}
    except Exception:
        # stub top-level, or a real container with stub children (the
        # normal Zenodo shape) — walk the module dicts directly
        sd = {k: np.asarray(v.detach().cpu().numpy()
                            if hasattr(v, "detach") else v)
              for k, v in _walk_any(obj)}
    if not sd:
        raise ValueError(f"Cannot extract tensors from {type(obj)!r}")
    return sd, meta


def spec_from_reference_meta(sd: Dict[str, np.ndarray], meta: Dict):
    """Rebuild a ProtoSpec from pickle metadata + tensors."""
    from scaleprotoseg_tpu.spec import ProtoSpec

    pv = np.asarray(sd["prototype_vectors"])
    num_prototypes, depth = pv.shape[0], int(np.prod(pv.shape[1:]))
    pci = meta.get("prototype_class_identity")
    num_scales = int(meta.get("num_scales", 1))
    snp = meta.get("scale_num_prototypes")
    if snp:
        bounds = tuple(tuple(int(v) for v in snp[s])
                       for s in sorted(snp))
    else:
        per = num_prototypes // num_scales
        bounds = tuple((s * per, (s + 1) * per) for s in range(num_scales))
    if pci is not None:
        class_ids = tuple(int(np.argmax(row)) if row.any() else -1
                          for row in np.asarray(pci))
        num_classes = int(np.asarray(pci).shape[1])
    else:
        if "last_layer.weight" in sd:
            num_classes = int(np.asarray(sd["last_layer.weight"]).shape[0])
        else:
            num_classes = int(
                np.asarray(sd["last_layer_group.weight"]).shape[0])
        return ProtoSpec.equal_allocation(
            num_prototypes, depth, num_classes, num_scales,
            num_groups=int(meta.get("num_groups", 0)))
    return ProtoSpec(num_classes=num_classes, num_scales=num_scales,
                     proto_depth=depth, class_ids=class_ids,
                     scale_bounds=bounds,
                     num_groups=int(meta.get("num_groups", 0) or 0))


def _patched_pickle():
    mod = types.ModuleType("stub_pickle")
    mod.Unpickler = _StubUnpickler
    mod.load = lambda f, **kw: _StubUnpickler(f, **kw).load()
    mod.loads = lambda b, **kw: _StubUnpickler(io.BytesIO(b), **kw).load()
    return mod


# ---------------------------------------------------------------------------
# Full PPNet state-dict -> framework params
# ---------------------------------------------------------------------------
def ppnet_statedict_to_params(sd: Dict[str, np.ndarray], spec
                              ) -> Tuple[Dict, Dict]:
    """Map a reference PPNet(MultiScale[Group]) state dict onto our PPNet
    param tree.  Returns (params, batch_stats)."""
    backbone_sd = {}
    for key, value in sd.items():
        if key.startswith("features.base."):
            backbone_sd[key[len("features.base."):]] = value
    params, stats = deeplab_statedict_to_backbone(backbone_sd)
    out = {"backbone": params}
    out_stats = {"backbone": stats}

    if "prototype_vectors" in sd:
        pv = np.asarray(sd["prototype_vectors"])
        out["prototype_vectors"] = pv.reshape(pv.shape[0], -1)
    if "last_layer.weight" in sd:
        out["last_layer"] = np.asarray(sd["last_layer.weight"]).T
    if "last_layer_group.weight" in sd:
        # reference packs over non-empty classes; scatter into full slots
        w = np.asarray(sd["last_layer_group.weight"])  # (C, G_total_packed)
        g = spec.num_groups
        full = np.zeros((spec.num_classes * g, spec.num_classes),
                        np.float32)
        nonzero = [c for c in range(spec.num_classes)
                   if spec.class_counts[c] > 0]
        for k, c in enumerate(nonzero):
            full[c * g:(c + 1) * g, :] = w[:, k * g:(k + 1) * g].T
        out["last_layer_group"] = full
    group_keys = sorted(
        (k for k in sd if k.startswith("group_projection.")),
        key=lambda k: int(k.split(".")[1]))
    if group_keys:
        g = spec.num_groups
        gw = np.zeros((spec.num_classes, g, spec.max_protos_per_class),
                      np.float32)
        nonzero = [c for c in range(spec.num_classes)
                   if spec.class_counts[c] > 0]
        for key in group_keys:
            k = int(key.split(".")[1])
            c = nonzero[k]
            w = np.asarray(sd[key])  # (G, P_c)
            gw[c, :, :w.shape[1]] = w
        out["group_projection"] = gw

    # optional WeightedAgg scale head: only the 'concat' strategy has
    # params (`segmentation/model/scale_head.py:44-53`, a Linear(2D, D)
    # in a [Linear, Sigmoid] block); no shipped config enables it
    sh_w = sd.get("scale_head.output_layer.linear_block.0.weight")
    if sh_w is not None:
        out["scale_head"] = {"linear": {
            "kernel": np.ascontiguousarray(np.asarray(sh_w).T)}}
        sh_b = sd.get("scale_head.output_layer.linear_block.0.bias")
        if sh_b is not None:
            out["scale_head"]["linear"]["bias"] = np.asarray(sh_b)

    # add-on convs (bottleneck/regular types): torch Sequential indices
    # include parameter-free activations, so map convs by order of their
    # numeric Sequential index onto our conv0, conv1, ...
    seq_indices = sorted({int(k.split(".")[1]) for k in sd
                          if k.startswith("add_on_layers.")})
    addon = {}
    for order, seq_i in enumerate(seq_indices):
        w = sd.get(f"add_on_layers.{seq_i}.weight")
        b = sd.get(f"add_on_layers.{seq_i}.bias")
        entry = {}
        if w is not None:
            entry["kernel"] = np.asarray(w).transpose(2, 3, 1, 0)
        if b is not None:
            entry["bias"] = np.asarray(b)
        if entry:
            addon[f"conv{order}"] = entry
    if addon:
        out["add_on_layers"] = addon

    return out, out_stats


# ---------------------------------------------------------------------------
# Framework params -> reference-named torch state dict (the way back)
# ---------------------------------------------------------------------------
def _convbn_to_statedict(tree: Dict, stats: Dict, out: Dict, prefix: str):
    """Inverse of ``_assign_convbn``: walk ``{conv: {kernel, bias},
    bn: {scale, bias}}`` nodes into deeplab-named torch keys."""
    for name, node in tree.items():
        if not isinstance(node, dict):
            continue
        sub_stats = (stats or {}).get(name, {})
        if "conv" in node or "bn" in node:
            conv = node.get("conv", {})
            if "kernel" in conv:  # HWIO -> OIHW
                out[f"{prefix}{name}.conv.weight"] = \
                    np.asarray(conv["kernel"]).transpose(3, 2, 0, 1)
            if "bias" in conv:
                out[f"{prefix}{name}.conv.bias"] = np.asarray(conv["bias"])
            bn = node.get("bn", {})
            sbn = sub_stats.get("bn", {})
            if bn:
                out[f"{prefix}{name}.bn.weight"] = np.asarray(bn["scale"])
                out[f"{prefix}{name}.bn.bias"] = np.asarray(bn["bias"])
                if "mean" in sbn:
                    out[f"{prefix}{name}.bn.running_mean"] = \
                        np.asarray(sbn["mean"])
                if "var" in sbn:
                    out[f"{prefix}{name}.bn.running_var"] = \
                        np.asarray(sbn["var"])
                # torch BN state dicts carry this counter; emit 0 so the
                # reference's strict load_state_dict accepts the export
                out[f"{prefix}{name}.bn.num_batches_tracked"] = \
                    np.asarray(0, np.int64)
        else:
            _convbn_to_statedict(node, sub_stats, out,
                                 f"{prefix}{name}.")


def ppnet_params_to_statedict(params: Dict, batch_stats: Optional[Dict],
                              spec, addon_seq_index=None, log=print
                              ) -> Dict[str, np.ndarray]:
    """Inverse of ``ppnet_statedict_to_params``: framework param tree ->
    reference-named torch state dict (numpy values, OIHW kernels).

    The escape hatch of the migration: weights trained here load back
    into the reference's PPNet classes via ``load_state_dict`` (the
    reference's own cross-phase bootstrap uses ``strict=False``,
    `segmentation/finetune_wandb_group.py:74-84`).  Group weights are
    re-packed from our dense padded (C, G, Pc_max) layout into the
    reference's per-nonempty-class ``group_projection.{k}.weight``
    ModuleList entries; ``last_layer_group`` back into its packed
    (C, G·len(nonzero)) form
    (`segmentation/model/model_multiscale_group.py:480-491`).

    ``addon_seq_index`` maps our ``conv{i}`` add-on convs to torch
    Sequential indices; the default ``2*i`` matches the reference's
    [Conv, ReLU]*+Sigmoid stacks (`segmentation/model/model.py:144-186`)
    — all shipped configs use ``deeplab_simple`` (Sigmoid only), where
    this is moot.  Any unrecognized non-empty param subtree is NOT
    exported; ``log`` reports it so the drop is never silent.
    """
    if addon_seq_index is None:
        addon_seq_index = lambda i: 2 * i  # noqa: E731
    sd: Dict[str, np.ndarray] = {}
    bb = params.get("backbone", {})
    bstats = (batch_stats or {}).get("backbone", {})
    _convbn_to_statedict({k: v for k, v in bb.items() if k != "aspp"},
                         bstats, sd, "features.base.")
    for branch, entry in bb.get("aspp", {}).items():
        sd[f"features.base.aspp.{branch}.weight"] = \
            np.asarray(entry["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in entry:
            sd[f"features.base.aspp.{branch}.bias"] = \
                np.asarray(entry["bias"])

    if "prototype_vectors" in params:
        pv = np.asarray(params["prototype_vectors"])
        sd["prototype_vectors"] = pv.reshape(pv.shape[0], pv.shape[1], 1, 1)
    if "last_layer" in params:
        sd["last_layer.weight"] = \
            np.ascontiguousarray(np.asarray(params["last_layer"]).T)
    nonzero = [c for c in range(spec.num_classes)
               if spec.class_counts[c] > 0]
    if "last_layer_group" in params:
        g = spec.num_groups
        full = np.asarray(params["last_layer_group"])   # (C*G, C)
        w = np.zeros((spec.num_classes, len(nonzero) * g), np.float32)
        for k, c in enumerate(nonzero):
            w[:, k * g:(k + 1) * g] = full[c * g:(c + 1) * g, :].T
        sd["last_layer_group.weight"] = w
    if "group_projection" in params:
        gw = np.asarray(params["group_projection"])     # (C, G, Pc_max)
        for k, c in enumerate(nonzero):
            pc = spec.class_counts[c]
            sd[f"group_projection.{k}.weight"] = \
                np.ascontiguousarray(gw[c, :, :pc], np.float32)
    if "scale_head" in params:
        lin = params["scale_head"]["linear"]
        sd["scale_head.output_layer.linear_block.0.weight"] = \
            np.ascontiguousarray(np.asarray(lin["kernel"]).T)
        if "bias" in lin:
            sd["scale_head.output_layer.linear_block.0.bias"] = \
                np.asarray(lin["bias"])
    addon = params.get("add_on_layers", {})
    for name in sorted(addon, key=lambda n: int(n[len("conv"):])):
        seq_i = addon_seq_index(int(name[len("conv"):]))
        entry = addon[name]
        if "kernel" in entry:
            sd[f"add_on_layers.{seq_i}.weight"] = \
                np.asarray(entry["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in entry:
            sd[f"add_on_layers.{seq_i}.bias"] = np.asarray(entry["bias"])
    handled = {"backbone", "prototype_vectors", "last_layer",
               "last_layer_group", "group_projection", "add_on_layers",
               "scale_head"}
    dropped = sorted(k for k in params if k not in handled)
    if dropped:
        log(f"export-torch: NOT exporting unrecognized param subtree(s) "
            f"{dropped} — the reference load will keep its own init "
            "there")
    return sd


def load_torch_backbone_into(variables: Dict, path: str, log=print) -> Dict:
    """Load a torchvision ResNet ``.pth``/``.pt`` into variables'
    backbone subtree (ImageNet init path, ref
    train_wandb_multiscale.py:134-145)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()
          if hasattr(v, "detach")}
    params, stats = torchvision_resnet_to_backbone(sd)
    merged_p = _merge_subtree(variables["params"]["backbone"], params, log)
    variables = dict(variables)
    variables["params"] = dict(variables["params"])
    variables["params"]["backbone"] = merged_p
    bs = dict(variables.get("batch_stats") or {})
    bs["backbone"] = _merge_subtree(bs.get("backbone", {}), stats, log)
    variables["batch_stats"] = bs
    log(f"Loaded pretrained backbone weights from {path}")
    return variables


def _merge_subtree(dst, src, log, prefix=""):
    """Recursively overwrite dst leaves present in src (strict=False)."""
    import jax.numpy as jnp

    out = dict(dst) if isinstance(dst, dict) else {}
    for k, v in src.items():
        if isinstance(v, dict):
            out[k] = _merge_subtree(out.get(k, {}), v, log,
                                    prefix + k + "/")
        else:
            if k in out and hasattr(out[k], "shape") and \
                    tuple(out[k].shape) != tuple(np.shape(v)):
                log(f"shape mismatch at {prefix}{k}: "
                    f"{out[k].shape} vs {np.shape(v)}; skipping")
                continue
            out[k] = jnp.asarray(v)
    return out
