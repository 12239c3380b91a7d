"""Shared CLI plumbing for the training/eval entry points.

Mirrors the reference's entry-script conventions
(`train_wandb_multiscale.py`, `finetune_wandb_group.py`): gin config
resolution (`segmentation/configs/{name}.gin` -> our
``scaleprotoseg_tpu/configs/{name}.gin`` or an explicit path), seeding,
run-directory layout (``RESULTS_DIR/<experiment>/{checkpoints,prototypes}``
with the config copied in), and loader construction.
"""

from __future__ import annotations

import os
import random
import shutil
from typing import Iterator, Optional, Tuple

import numpy as np

from scaleprotoseg_tpu import configlib, settings
from scaleprotoseg_tpu.data.dataset import PatchClassificationDataset
from scaleprotoseg_tpu.data.loader import DataLoader

CONFIGS_DIR = os.path.join(os.path.dirname(__file__), "configs")

# The validated TPU training recipe (1k-step trajectory study,
# benchmarks/bench_bf16_divergence.py): cityscapes joint step 49.6 ->
# 32.0 ms (1.55x) with held-out metrics identical to fp32.  Defaults
# stay fp32/XLA for reference parity; --tpu-recipe opts a run in.
TPU_RECIPE_BINDINGS = (
    "train.compute_dtype = 'bfloat16'",
    "train.fast_aspp = True",
    "train.fast_gradconv = True",
)


def apply_overrides(overrides=None, tpu_recipe: bool = False,
                    log=None) -> list:
    """Apply command-line gin bindings on top of the loaded config.

    ``overrides`` are ``--gin 'name.param = value'`` strings (same
    syntax as a config-file line; later bindings win, so these override
    the file).  ``tpu_recipe=True`` prepends ``TPU_RECIPE_BINDINGS``.
    Call after every ``load_config`` — a config re-parse (e.g.
    ``load_model``'s) clears the binding store.  Returns the applied
    binding lines (they land in the operative config once consumed).
    """
    lines = list(TPU_RECIPE_BINDINGS if tpu_recipe else ()) \
        + list(overrides or [])
    for line in lines:
        configlib.parse_config(line)
    if lines and log:
        log(f"CLI gin overrides: {'; '.join(lines)}")
    return lines


def add_override_args(parser) -> None:
    """Install the shared --gin/--tpu-recipe flags on a training CLI."""
    parser.add_argument(
        "--gin", action="append", default=None, metavar="BINDING",
        help="extra gin binding, e.g. --gin \"train.num_devices = 1\" "
             "(repeatable; overrides the config file)")
    parser.add_argument(
        "--tpu-recipe", action="store_true",
        help="opt into the validated TPU speed recipe: bf16 compute + "
             "fused Pallas ASPP + hybrid grad-conv backward (1.55x the "
             "fp32 default at cityscapes shapes, trajectory-validated "
             "by benchmarks/bench_bf16_divergence.py)")


def resolve_config(config_path: str) -> str:
    candidates = [
        config_path,
        os.path.join(CONFIGS_DIR, config_path + ".gin"),
        os.path.join(CONFIGS_DIR, config_path),
    ]
    for c in candidates:
        if os.path.isfile(c):
            return c
    raise FileNotFoundError(
        f"Config {config_path!r} not found (searched {candidates})")


def enable_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at LOG_DIR/jax_cache.

    A fresh CLI process pays ~2 min compiling the ResNet-101 forward on
    TPU; the persistent cache makes every later train/eval/push/analysis
    invocation at the same shapes start warm.  Respects an explicit
    JAX_COMPILATION_CACHE_DIR; set it to the empty string to disable.
    """
    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        return  # user setting (possibly '' = disabled) wins
    try:
        import jax
        cache_dir = os.path.join(settings.log_dir(), "jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: the CLI surface re-runs whole
        # processes, so everything recompiles otherwise
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never block the CLI on it


def load_config(config_path: str) -> str:
    enable_compilation_cache()
    path = resolve_config(config_path)
    configlib.clear_config()
    configlib.parse_config_file(path)
    return path


def seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def setup_run_dir(experiment_name: str, config_file: str) -> str:
    results_dir = os.path.join(settings.results_dir(), experiment_name)
    os.makedirs(os.path.join(results_dir, "checkpoints"), exist_ok=True)
    os.makedirs(os.path.join(results_dir, "prototypes"), exist_ok=True)
    try:
        shutil.copy(config_file, os.path.join(results_dir, "config.gin"))
    except shutil.SameFileError:
        pass
    return results_dir


def train_hparams() -> dict:
    q = lambda p, d: configlib.query("train", p, d)  # noqa: E731
    return dict(
        random_seed=q("random_seed", 20220227),
        warmup_steps=q("warmup_steps", 0),
        joint_steps=q("joint_steps", 0),
        finetune_steps=q("finetune_steps", 0),
        warmup_batch_size=q("warmup_batch_size", 2),
        joint_batch_size=q("joint_batch_size", 2),
        early_stopping_patience_last_layer=q(
            "early_stopping_patience_last_layer", 100),
        start_checkpoint=q("start_checkpoint", ""),
        load_coco=q("load_coco", False),
        push_proto=q("push_proto", True),
        data_type=q("data_type",
                    configlib.query("PatchClassificationDataModule",
                                    "data_type", None)),
    )


def training_mesh(n_devices: Optional[int] = None):
    """Build the CLI's device mesh from gin bindings.

    Flat data-parallel over all visible devices by default; pin the
    count with ``train.num_devices`` (or the CLI flag).  On a
    multi-slice pod set ``train.num_slices`` to lay the slice boundary
    out as the outer mesh axis (``parallel.create_mesh_multislice``) so
    gradient reduction rides ICI within each slice and only slice-level
    partials cross DCN — training/eval/push semantics are unchanged
    (``shard_batch`` spreads batches over both axes automatically).
    """
    import jax

    from scaleprotoseg_tpu.parallel import (create_mesh,
                                            create_mesh_multislice)

    n = n_devices or configlib.query("train", "num_devices", None)
    n_slices = configlib.query("train", "num_slices", None)
    if n_slices and n_slices > 1:
        devices = jax.devices()[:n] if n else jax.devices()
        if len(devices) % n_slices == 0 and len(devices) >= 2 * n_slices:
            return create_mesh_multislice(n_slices=n_slices,
                                          devices=devices)
        # a run's config.gin travels with its checkpoints: evaluating or
        # prune-finetuning a multi-slice-trained run on a smaller host
        # must degrade to a flat mesh (identical semantics, only the
        # collective routing differs), not crash
        import logging
        logging.getLogger(__name__).warning(
            "train.num_slices=%d does not fit the %d visible device(s); "
            "falling back to a flat data mesh", n_slices, len(devices))
    return create_mesh(n_devices=n)


def data_parallel_batch(batch_size: int, mesh, log=print) -> int:
    """Scale a config batch size to ``batch_size * mesh_size``.

    The reference trains at global batch 2 on one GPU; on an n-chip mesh
    the framework keeps the reference batch PER DEVICE and scales the
    global batch so every step shards cleanly over the data axis (the
    alternative — replicating a batch-2 step over 8 chips — computes the
    same gradient 8 times; see ``parallel.mesh.shard_batch``).  The
    per-sample loss weighting is unchanged; only the effective batch (and
    therefore gradient noise) scales with the mesh, which is the standard
    data-parallel semantics.
    """
    n = getattr(mesh, "devices", np.zeros(1)).size
    if n <= 1:
        return batch_size
    scaled = batch_size * n
    log(f"data-parallel x{n}: global batch {batch_size} -> {scaled} "
        f"({batch_size}/device)")
    return scaled


def make_loaders(batch_size: int, num_workers: Optional[int] = None,
                 seed: int = 0, data_root: Optional[str] = None):
    """(train_loader, val_loader) per the gin dataset bindings.

    ``batch_size`` is the GLOBAL batch (``data_parallel_batch``).  Under
    multi-process (multi-host) execution each process gets a loader over
    its disjoint ``host_id`` index shard yielding its
    ``batch_size / process_count`` local rows — the layout
    ``parallel.assemble_global_batch`` assembles into the global sharded
    batch inside the runner.  Multi-process loaders drop ragged tail
    batches (``drop_last``): every step is a collective, so all
    processes must contribute the same fixed batch shape; a partial
    global batch could not shard over the mesh.  Up to
    ``global_batch - 1`` train images per epoch (rotating with the
    shuffle) and val images (fixed tail) go unseen — single-process
    runs keep every image."""
    if num_workers is None:
        num_workers = configlib.query("PatchClassificationDataModule",
                                      "dataloader_n_jobs", 8)
    train_key = configlib.query("PatchClassificationDataModule",
                                "train_key", "train")
    import jax
    nproc, pid = jax.process_count(), jax.process_index()
    if batch_size % nproc:
        raise ValueError(f"global batch {batch_size} does not divide "
                         f"{nproc} processes")
    local_bs = batch_size // nproc
    train_ds = PatchClassificationDataset(split_key=train_key,
                                          is_eval=False, root=data_root)
    val_ds = PatchClassificationDataset(split_key="val", is_eval=True,
                                        root=data_root)
    # gin PatchClassificationDataModule.loader_backend = 'grain' swaps
    # the threaded prefetcher for the grain engine (same sampled
    # stream — data/grain_loader.py; 'grain_processes' adds process
    # workers for augs that do not release the GIL)
    backend = configlib.query("PatchClassificationDataModule",
                              "loader_backend", "threads")
    if backend in ("grain", "grain_processes"):
        from scaleprotoseg_tpu.data.grain_loader import GrainDataLoader
        import functools
        cls = functools.partial(GrainDataLoader,
                                use_processes=backend == "grain_processes")
    elif backend == "threads":
        cls = DataLoader
    else:
        raise ValueError(f"unknown loader_backend {backend!r} "
                         "(threads | grain | grain_processes)")
    return (cls(train_ds, local_bs, shuffle=True,
                num_workers=num_workers, seed=seed,
                host_id=pid, num_hosts=nproc,
                drop_last=nproc > 1),
            cls(val_ds, local_bs, shuffle=False,
                num_workers=num_workers, seed=seed,
                host_id=pid, num_hosts=nproc,
                drop_last=nproc > 1))


class PushLoader:
    """Re-iterable full-resolution normalized loader for prototype push
    (reference: PNGs + `to_normalized_tensor`, push_*_optimization.py)."""

    def __init__(self, dataset: PatchClassificationDataset,
                 batch_size: int = 1, limit: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.n = len(dataset) if limit is None else min(limit, len(dataset))

    def _item(self, i) -> Tuple[np.ndarray, np.ndarray]:
        image, label = self.dataset._load_raw(i)
        label = self.dataset.convert(label)
        if self.dataset.image_margin_size:
            m = self.dataset.image_margin_size
            image = image[m:-m, m:-m]
        image = image.astype(np.float32) / 255.0
        image = (image - self.dataset.mean) / self.dataset.std
        return image, label

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for start in range(0, self.n, self.batch_size):
            items = [self._item(i)
                     for i in range(start, min(start + self.batch_size,
                                               self.n))]
            yield (np.stack([it[0] for it in items]),
                   np.stack([it[1] for it in items]))


def make_push_loader(batch_size: int = 1, data_root: Optional[str] = None,
                     limit: Optional[int] = None) -> PushLoader:
    ds = PatchClassificationDataset(split_key="train", is_eval=True,
                                    push_prototypes=True, root=data_root)
    return PushLoader(ds, batch_size=batch_size, limit=limit)
