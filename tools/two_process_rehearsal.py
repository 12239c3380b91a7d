"""Two-process distributed DP rehearsal (multi-host execution proof).

`parallel/mesh.py` documents multi-host operation as
``jax.distributed.initialize`` + per-host loader shards
(`data/loader.py`: each process iterates ``idx[host_id::num_hosts]``) —
but everything else ever executed is a single-process virtual mesh.
This script actually runs it: two OS processes rendezvous through the
JAX coordination service (CPU backend, gloo collectives), each feeds its
host shard of a deterministic synthetic dataset into a 2-device global
mesh, and runs every stage of the framework's device-side lifecycle:

  train — N data-parallel steps of the tiny flagship-shaped PPNet via
    the production ``make_train_step`` (loss trajectory recorded);
  eval  — the production ``SegEvaluator`` with per-host local batches
    (``parallel.assemble_global_batch``); the confusion matrix is a
    replicated int32 cross-process reduction;
  push  — the production ``push_prototypes`` min-scan with the
    fixed-order full-split loader on every process
    (``parallel.split_global_batch``).

The parent replays the SAME global batches on a single-process
2-virtual-device mesh and asserts: loss trajectories match, the
confusion matrix is bit-equal, and every prototype projects onto the
same winner — per-host data disjointness feeding real cross-process
collectives, coordinator wiring, and process-local array assembly are
all on the line.

Usage:
  python tools/two_process_rehearsal.py            # orchestrate + assert
  python tools/two_process_rehearsal.py worker <pid> <port> <out.json>

Covered in CI by tests/test_two_process_dp.py (slow marker).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_STEPS = 3
PER_HOST_BATCH = 2
NUM_HOSTS = 2
IMG = 33
N_IMAGES = NUM_HOSTS * PER_HOST_BATCH * N_STEPS


def _dataset():
    """Deterministic synthetic split, index-addressable like the loader."""
    import numpy as np

    rng = np.random.default_rng(7)
    images = rng.standard_normal((N_IMAGES, IMG, IMG, 3)).astype(np.float32)
    targets = rng.integers(0, 4, size=(N_IMAGES, IMG, IMG)).astype(np.int32)
    return images, targets


def _build_step():
    """Tiny flagship-shaped PPNet + the production phase-1 train step."""
    import jax
    import jax.numpy as jnp

    from scaleprotoseg_tpu.models.deeplab import DeepLabV2
    from scaleprotoseg_tpu.models.ppnet import PPNet
    from scaleprotoseg_tpu.spec import ProtoSpec
    from scaleprotoseg_tpu.train.optim import (
        label_params, make_phase_optimizer, partition_params, phase_groups,
        poly_schedule)
    from scaleprotoseg_tpu.train.state import TrainState
    from scaleprotoseg_tpu.train.steps import LossWeights, make_train_step

    spec = ProtoSpec.equal_allocation(24, 8, num_classes=3, num_scales=4)
    backbone = DeepLabV2(n_out=8, n_blocks=(1, 1, 1, 1),
                         aspp_mode="concat")
    model = PPNet(backbone=backbone, spec=spec,
                  backbone_channels=spec.feature_depth)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 3)))
    hp = dict(warm_lr_add_on=2.5e-3, warm_lr_protos=2.5e-3, warm_wd=5e-4,
              joint_lr_features=1e-3, joint_lr_add_on=2.5e-3,
              joint_lr_protos=2.5e-3, joint_wd=5e-4, last_layer_lr=2.5e-3,
              warm_lr_group=2.5e-3, joint_lr_group=2.5e-3)
    groups = phase_groups("multiscale", 1, hp)
    trainable, _ = partition_params(variables["params"], set(groups))
    tx = make_phase_optimizer(groups, label_params(trainable),
                              schedule=poly_schedule(0.9, N_STEPS))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"),
                              tx.init(trainable))
    step = make_train_step(model, spec, tx, set(groups),
                           LossWeights(crs_ent=1.0, kld=0.25, l1=1e-4),
                           donate=False)
    return model, spec, state, step


def _variables(state):
    v = {"params": state.params}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


def _run_eval(model, variables, batches, mesh):
    """Mesh-sharded eval; multi-process passes per-host local rows
    (assemble_global_batch inside SegEvaluator.update), single-process
    the assembled global batches — outputs are replicated reductions."""
    from scaleprotoseg_tpu.eval.miou import SegEvaluator

    ev = SegEvaluator(model, num_classes=3, mesh=mesh)
    for img, tgt in batches:
        ev.update(variables, img, tgt)
    res = ev.result()
    import numpy as np
    return np.asarray(ev.cm).astype(int).tolist(), res["mean_iou"]


class _PushLoader:
    """Fixed-order full-split loader — IDENTICAL on every process (the
    shared-filesystem contract push's multi-process path documents)."""

    shuffle = False

    def __init__(self, images, targets, batch):
        self.images, self.targets, self.batch = images, targets, batch

    def __iter__(self):
        for i in range(0, len(self.images), self.batch):
            yield (self.images[i:i + self.batch],
                   self.targets[i:i + self.batch])

    def __len__(self):
        return -(-len(self.images) // self.batch)


def _run_push_scan(model, spec, variables, images, targets, mesh):
    """The production push over the mesh (min-scan sharded via
    split_global_batch in multi-process).  Batch 5 over 12 images makes
    the scan cover BOTH placements: two ragged batches (5 % 2 devices
    -> the replicated fallback a real split's tail hits) and one even
    final batch (sharded path)."""
    from scaleprotoseg_tpu.push.push import push_prototypes

    res = push_prototypes(
        model, variables, spec,
        _PushLoader(images, targets, 5),
        dedup=False, mesh=mesh, log=lambda *a: None)
    return ([int(w) for w in res.winners],
            [float(d) for d in res.min_dists])


def _run_phase_trainer(model, spec, variables, data_root, out_dir, mesh):
    """The production PhaseTrainer end-to-end: host-sharded det_seed
    loaders (the cli_common.make_loaders layout) feed
    assemble_global_batch inside run_phase; checkpoints/metrics are
    written by process 0 only; the async Orbax state save runs as a
    collective on every process.  Single-process batches hold the same
    image SETS in a different row order, so trajectories match to fp
    tolerance (the losses are means over the batch)."""
    import jax

    from scaleprotoseg_tpu.data.dataset import PatchClassificationDataset
    from scaleprotoseg_tpu.data.loader import DataLoader
    from scaleprotoseg_tpu.train.metrics import MetricsLogger
    from scaleprotoseg_tpu.train.runner import PhaseTrainer
    from scaleprotoseg_tpu.train.steps import LossWeights

    nproc, pid = jax.process_count(), jax.process_index()

    def loader(split, is_eval):
        ds = PatchClassificationDataset(
            split_key=split, is_eval=is_eval, data_type="em",
            window_size=(32, 32), image_margin_size=0,
            mean=[0.5] * 3, std=[0.5] * 3, scales=(0.9, 1.1),
            only_19_from_cityscapes=False, root=data_root, det_seed=7)
        return DataLoader(ds, 4 // nproc, shuffle=not is_eval, seed=3,
                          num_workers=2, host_id=pid, num_hosts=nproc)

    hparams = dict(
        weights=LossWeights(), hp=dict(
            warm_lr_add_on=1e-3, warm_lr_protos=1e-3, warm_wd=0.0,
            joint_lr_features=1e-4, joint_lr_add_on=1e-3,
            joint_lr_protos=1e-3, joint_wd=0.0, last_layer_lr=1e-3,
            warm_lr_group=1e-3, joint_lr_group=1e-3),
        poly_lr_power=0.9, iter_size=1, ignore_void_class=True,
        freeze_type="all", joint_no_proto=False, joint_last=True)
    trainer = PhaseTrainer(model, spec, "multiscale", out_dir, hparams,
                           logger=MetricsLogger(out_dir),
                           mesh=mesh, log=lambda *a: None)
    res = trainer.run_phase(variables, phase=2, max_steps=4,
                            train_loader=loader("train", False),
                            val_loader=loader("val", True),
                            val_every_steps=2)
    import numpy as np
    return ([float(v) for v in
             np.asarray(res.state.params["last_layer"]).ravel()],
            float(res.best_acc))


def _run_find_nearest(model, spec, variables, images, targets, mesh):
    """The production pruning scan (device-side per-batch top-k) over the
    mesh — the run_pruning stage's hot loop."""
    from scaleprotoseg_tpu.find_nearest import \
        find_k_nearest_patches_to_prototypes

    labels = find_k_nearest_patches_to_prototypes(
        _PushLoader(images, targets, PER_HOST_BATCH * NUM_HOSTS),
        model, variables, spec, k=3, mesh=mesh, log=lambda *a: None)
    return [[int(v) for v in row] for row in labels]


def _global_batches(images, targets):
    """Global batch layout as assembled from per-host shards: device d of
    the 2-device mesh holds host d's rows (loader stride
    ``idx[host_id::num_hosts]``)."""
    for k in range(N_STEPS):
        rows = []
        for host in range(NUM_HOSTS):
            idx = list(range(host, N_IMAGES, NUM_HOSTS))
            rows.extend(idx[k * PER_HOST_BATCH:(k + 1) * PER_HOST_BATCH])
        yield images[rows], targets[rows]


def run_worker(pid: int, port: int, out_path: str, data_root: str,
               run_dir: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"127.0.0.1:{port}",
                               num_processes=NUM_HOSTS, process_id=pid)
    assert jax.process_count() == NUM_HOSTS
    assert jax.device_count() == NUM_HOSTS  # 1 CPU device per process

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scaleprotoseg_tpu.parallel import create_mesh

    mesh = create_mesh()
    batch_sh = NamedSharding(mesh, P("data"))

    model, spec, state, step = _build_step()
    # eval/push legs run on the INITIAL variables: bit-identical across
    # process layouts (the trained params only match to ~1e-5 across
    # collective implementations, which could flip argmax ties and make
    # the exact cm/winner asserts flaky)
    init_vars = _variables(state)

    images, targets = _dataset()
    # per-host shard: exactly the loader's idx[host_id::num_hosts] stream
    my_idx = list(range(pid, N_IMAGES, NUM_HOSTS))

    losses = []
    for k in range(N_STEPS):
        rows = my_idx[k * PER_HOST_BATCH:(k + 1) * PER_HOST_BATCH]
        local_img, local_tgt = images[rows], targets[rows]
        g_img = jax.make_array_from_process_local_data(
            batch_sh, local_img,
            (PER_HOST_BATCH * NUM_HOSTS,) + local_img.shape[1:])
        g_tgt = jax.make_array_from_process_local_data(
            batch_sh, local_tgt,
            (PER_HOST_BATCH * NUM_HOSTS,) + local_tgt.shape[1:])
        state, metrics = step(state, g_img, g_tgt)
        losses.append(float(metrics["loss"]))  # loss is replicated

    # ---- eval leg: SegEvaluator over the mesh, per-host loader shards
    # feed assemble_global_batch inside update(); the confusion matrix is
    # a replicated cross-process reduction, exact in int32.
    local_batches = [
        (images[my_idx[k * PER_HOST_BATCH:(k + 1) * PER_HOST_BATCH]],
         targets[my_idx[k * PER_HOST_BATCH:(k + 1) * PER_HOST_BATCH]])
        for k in range(N_STEPS)]
    cm, miou = _run_eval(model, init_vars, local_batches, mesh)

    # ---- push leg: the min-scan over the mesh with the production
    # push_prototypes (fixed-order FULL-split loader on every process,
    # split_global_batch contributes this process's rows).
    winners, dists = _run_push_scan(model, spec, init_vars,
                                    images, targets, mesh)

    # ---- pruning leg: find_nearest's device-side per-batch top-k scan.
    nearest = _run_find_nearest(model, spec, init_vars, images, targets,
                                mesh)

    # ---- runner leg (LAST: run_phase donates its state buffers): the
    # production PhaseTrainer over real host-sharded disk loaders.
    import jax.numpy as jnp
    ll, best = _run_phase_trainer(
        model, spec, jax.tree.map(jnp.array, init_vars), data_root,
        run_dir, mesh)

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "cm": cm, "miou": miou,
                       "push_winners": winners, "push_dists": dists,
                       "nearest_labels": nearest,
                       "runner_last_layer": ll, "runner_best": best}, f)
    jax.distributed.shutdown()


def run_single_process(data_root: str, run_dir: str):
    """The same trajectory on one process (2 virtual devices)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from scaleprotoseg_tpu.parallel import create_mesh, shard_batch

    mesh = create_mesh(n_devices=2)
    model, spec, state, step = _build_step()
    init_vars = _variables(state)
    images, targets = _dataset()
    losses = []
    for img, tgt in _global_batches(images, targets):
        s_img, s_tgt = shard_batch((jnp.asarray(img), jnp.asarray(tgt)),
                                   mesh)
        state, metrics = step(state, s_img, s_tgt)
        losses.append(float(metrics["loss"]))
    cm, miou = _run_eval(model, init_vars,
                         _global_batches(images, targets), mesh)
    winners, dists = _run_push_scan(model, spec, init_vars, images,
                                    targets, mesh)
    nearest = _run_find_nearest(model, spec, init_vars, images, targets,
                                mesh)
    ll, best = _run_phase_trainer(
        model, spec, jax.tree.map(jnp.array, init_vars), data_root,
        run_dir, mesh)
    return {"losses": losses, "cm": cm, "miou": miou,
            "push_winners": winners, "push_dists": dists,
            "nearest_labels": nearest,
            "runner_last_layer": ll, "runner_best": best}


def orchestrate(tol: float = 1e-5) -> dict:
    import tempfile

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    tmp = tempfile.mkdtemp()
    out = os.path.join(tmp, "mp_losses.json")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from e2e_utils import build_synthetic_dataset
    data_root = build_synthetic_dataset(os.path.join(tmp, "data"),
                                        n_train=8, n_val=4, size=32)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)  # workers use 1 real cpu device each
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(pid),
         str(port), out, data_root, os.path.join(tmp, "mp_run")],
        env=env, cwd=REPO)
        for pid in range(NUM_HOSTS)]
    rcs = [p.wait(timeout=1200) for p in procs]
    assert all(rc == 0 for rc in rcs), f"worker exit codes: {rcs}"
    with open(out) as f:
        mp = json.load(f)

    sp = run_single_process(data_root, os.path.join(tmp, "sp_run"))
    import numpy as np

    # train: DP loss trajectory matches across collective implementations
    np.testing.assert_allclose(mp["losses"], sp["losses"],
                               rtol=tol, atol=tol)
    # eval: the confusion matrix is an exact int32 reduction — equal
    # bit-for-bit (both legs run on the bit-identical initial params)
    np.testing.assert_array_equal(mp["cm"], sp["cm"])
    assert mp["miou"] == sp["miou"]
    # push: every prototype projects onto the same winning image
    np.testing.assert_array_equal(mp["push_winners"], sp["push_winners"])
    np.testing.assert_allclose(mp["push_dists"], sp["push_dists"],
                               rtol=tol, atol=tol)
    # pruning: find_nearest's k-nearest patch labels are identical
    np.testing.assert_array_equal(mp["nearest_labels"],
                                  sp["nearest_labels"])
    # runner: the production PhaseTrainer over real host-sharded disk
    # loaders lands on the same params (batch rows are permuted between
    # the layouts, so fp tolerance rather than bit equality).  The best
    # val accuracy is a pixel count from argmax over those fp-divergent
    # params — a borderline pixel may flip, so tolerance here too.
    np.testing.assert_allclose(mp["runner_last_layer"],
                               sp["runner_last_layer"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(mp["runner_best"], sp["runner_best"],
                               atol=5e-3)
    return {"two_process": mp["losses"], "single_process": sp["losses"],
            "miou": sp["miou"],
            "push_matched": int(sum(w >= 0 for w in sp["push_winners"]))}


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
                   sys.argv[5], sys.argv[6])
    else:
        result = orchestrate()
        print(json.dumps(result))
        print("two-process train/eval/push/prune/runner == "
              "single-process: OK")
