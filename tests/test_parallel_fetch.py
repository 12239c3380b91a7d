"""BulkFetcher unit tests + multi-host loader index-sharding invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from scaleprotoseg_tpu.parallel import BulkFetcher


def test_bulk_fetcher_order_threshold_and_drain():
    got = []
    f = BulkFetcher(got.append, limit=3)
    for i in range(4):
        f.add(jnp.asarray(i))
    # limit 3 -> first three drained, fourth pending
    assert [int(x) for x in got] == [0, 1, 2]
    f.drain()
    assert [int(x) for x in got] == [0, 1, 2, 3]
    f.drain()  # idempotent on empty
    assert len(got) == 4


def test_bulk_fetcher_pytree_items():
    got = []
    f = BulkFetcher(got.append, limit=10)
    f.add((jnp.ones(2), {"k": jnp.zeros(3)}))
    f.drain()
    (a, d), = got
    np.testing.assert_array_equal(np.asarray(a), np.ones(2))
    assert set(d) == {"k"}


def test_loader_host_sharding_disjoint_and_complete(tmp_path):
    """Each host's index stream is disjoint; the union covers the epoch
    (multi-host data parallelism, loader.py docstring)."""
    import sys
    sys.path.insert(0, "tests")
    from e2e_utils import build_synthetic_dataset

    from scaleprotoseg_tpu.data.dataset import PatchClassificationDataset
    from scaleprotoseg_tpu.data.loader import DataLoader

    root = build_synthetic_dataset(str(tmp_path / "d"), n_train=8, n_val=2)
    def make(host_id, num_hosts):
        ds = PatchClassificationDataset(
            split_key="train", is_eval=True, push_prototypes=True,
            data_type="em", window_size=(32, 32), image_margin_size=0,
            mean=[0.5] * 3, std=[0.5] * 3, scales=(),
            only_19_from_cityscapes=False, root=root)
        return DataLoader(ds, batch_size=2, shuffle=False, num_workers=0,
                          host_id=host_id, num_hosts=num_hosts)

    seen = []
    for h in range(2):
        for images, _ in make(h, 2):
            for b in range(images.shape[0]):
                seen.append(images[b].sum())
    full = []
    for images, _ in make(0, 1):
        for b in range(images.shape[0]):
            full.append(images[b].sum())
    assert len(seen) == len(full)
    np.testing.assert_allclose(sorted(np.asarray(seen)),
                               sorted(np.asarray(full)), rtol=1e-6)


class _TinyItems:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (np.full((2, 2, 3), i, np.float32),
                np.zeros((2, 2), np.int32))


def test_loader_host_sharding_equalizes_uneven_datasets():
    """len(dataset) % num_hosts != 0: every host must yield the SAME
    batch count and batch sizes — multi-process steps are collectives
    and desynchronized loaders deadlock them.  The len % num_hosts tail
    is dropped (rotating with the shuffle)."""
    from scaleprotoseg_tpu.data.loader import DataLoader

    loaders = [DataLoader(_TinyItems(9), batch_size=2, shuffle=False,
                          num_workers=1, host_id=h, num_hosts=2)
               for h in range(2)]
    per_host = [[img.shape[0] for img, _ in ld] for ld in loaders]
    assert per_host[0] == per_host[1]            # lockstep shapes
    assert sum(per_host[0]) == 4 == len(_TinyItems(9)) // 2
    assert len(loaders[0]) == len(per_host[0])   # __len__ == yielded
    # shards are disjoint and cover 8 of the 9 items
    seen = set()
    for ld in (DataLoader(_TinyItems(9), 2, shuffle=False, num_workers=1,
                          host_id=h, num_hosts=2) for h in range(2)):
        for img, _ in ld:
            seen.update(int(v) for v in img[:, 0, 0, 0])
    assert len(seen) == 8

    # shuffled: the dropped item rotates with the epoch
    dropped = []
    ld = DataLoader(_TinyItems(9), 2, shuffle=True, seed=3, num_workers=1,
                    host_id=0, num_hosts=2)
    other = DataLoader(_TinyItems(9), 2, shuffle=True, seed=3,
                       num_workers=1, host_id=1, num_hosts=2)
    for _ in range(3):
        epoch_seen = set()
        for a, b in zip(ld, other):
            epoch_seen.update(int(v) for v in a[0][:, 0, 0, 0])
            epoch_seen.update(int(v) for v in b[0][:, 0, 0, 0])
        dropped.append((set(range(9)) - epoch_seen).pop())
    assert len(set(dropped)) > 1


def test_equivariance_shim_import_path():
    from scaleprotoseg_tpu.analysis.equivariance import quantile_map
    m = quantile_map(np.arange(16.0).reshape(4, 4), 0.75)
    assert m.shape == (4, 4, 1) and m.sum() == 4


def test_det_seed_dataset_schedule_independent(tmp_path):
    """det_seed makes item contents a pure function of (seed, epoch,
    index) — independent of loader thread scheduling and of any other
    consumer of the process-global `random` stream (the property exact
    mid-phase resume needs; data/dataset.py)."""
    import random
    import sys
    sys.path.insert(0, "tests")
    from e2e_utils import build_synthetic_dataset

    from scaleprotoseg_tpu.data.dataset import PatchClassificationDataset

    root = build_synthetic_dataset(str(tmp_path / "d"), n_train=4, n_val=1)

    def make(**kw):
        return PatchClassificationDataset(
            split_key="train", is_eval=False, data_type="em",
            window_size=(24, 24), image_margin_size=0,
            mean=[0.5] * 3, std=[0.5] * 3, scales=(0.7, 1.3),
            only_19_from_cityscapes=False, root=root, jitter=True, **kw)

    ds = make(det_seed=7)
    img_a, lab_a = ds[1]
    random.random()  # perturb the global stream between fetches
    img_b, lab_b = ds[1]
    np.testing.assert_array_equal(img_a, img_b)
    np.testing.assert_array_equal(lab_a, lab_b)

    # the epoch advances the stream; a fresh instance at the same epoch
    # reproduces it
    ds.set_epoch(1)
    img_e1, _ = ds[1]
    assert not np.array_equal(img_a, img_e1)
    ds2 = make(det_seed=7)
    ds2.set_epoch(1)
    np.testing.assert_array_equal(img_e1, ds2[1][0])

    # default (no det_seed) keeps the reference's global-stream behavior
    ds_global = make()
    random.seed(3)
    g1 = ds_global[1][0]
    random.seed(3)
    np.testing.assert_array_equal(g1, ds_global[1][0])


def test_loader_fast_forward_resumes_stream(tmp_path):
    """fast_forward(k) makes the next epochs replay exactly what an
    uninterrupted run would have produced after k batches (mid-epoch
    offset + epoch seed; data/loader.py)."""
    import sys
    sys.path.insert(0, "tests")
    from e2e_utils import build_synthetic_dataset

    from scaleprotoseg_tpu.data.dataset import PatchClassificationDataset
    from scaleprotoseg_tpu.data.loader import DataLoader

    root = build_synthetic_dataset(str(tmp_path / "d"), n_train=8, n_val=1)

    def make_loader():
        ds = PatchClassificationDataset(
            split_key="train", is_eval=False, data_type="em",
            window_size=(24, 24), image_margin_size=0,
            mean=[0.5] * 3, std=[0.5] * 3, scales=(0.7, 1.3),
            only_19_from_cityscapes=False, root=root, det_seed=11)
        return DataLoader(ds, batch_size=2, shuffle=True, seed=5,
                          num_workers=2)

    full = make_loader()
    straight = []
    for _ in range(2):  # 2 epochs of 4 batches
        straight += [img.copy() for img, _ in full]

    resumed = make_loader()
    resumed.fast_forward(3)  # 3 batches "already done" mid-epoch 0
    replay = []
    while len(replay) < 5:
        replay += [img.copy() for img, _ in resumed]
    for got, want in zip(replay, straight[3:]):
        np.testing.assert_array_equal(got, want)


def test_make_loaders_multiprocess_wiring(tmp_path, monkeypatch):
    """Under multi-process execution the CLI loaders are host-sharded and
    yield global_batch / process_count local rows (cli_common.make_loaders
    -> parallel.assemble_global_batch layout); an indivisible global
    batch fails fast."""
    import sys
    sys.path.insert(0, "tests")
    import jax
    from e2e_utils import TINY_EM_CONFIG, build_synthetic_dataset

    from scaleprotoseg_tpu import configlib
    from scaleprotoseg_tpu.cli_common import make_loaders

    root = build_synthetic_dataset(str(tmp_path / "d"), n_train=8, n_val=4)
    configlib.clear_config()
    configlib.parse_config(TINY_EM_CONFIG)
    try:
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        train, val = make_loaders(4, num_workers=1, data_root=root)
        assert train.batch_size == val.batch_size == 2
        assert train.host_id == val.host_id == 1
        assert train.num_hosts == val.num_hosts == 2
        assert len(train) == 2  # 8 images / 2 hosts / batch 2
        # ragged tail batches cannot shard the collective step
        assert train.drop_last and val.drop_last

        with pytest.raises(ValueError, match="does not divide"):
            make_loaders(5, num_workers=1, data_root=root)
    finally:
        configlib.clear_config()


# ---------------------------------------------------------------------------
# Grain backend (data/grain_loader.py)
# ---------------------------------------------------------------------------
def test_grain_loader_matches_threaded_stream():
    """The grain backend draws the SAME per-epoch index permutation as
    the threaded loader (it inherits the bookkeeping), so the batch
    streams are identical item-for-item — switching backends never
    changes a training trajectory."""
    pytest.importorskip("grain")
    from scaleprotoseg_tpu.data.grain_loader import GrainDataLoader
    from scaleprotoseg_tpu.data.loader import DataLoader

    for shuffle in (False, True):
        a = DataLoader(_TinyItems(9), 2, shuffle=shuffle, seed=5,
                       num_workers=2)
        b = GrainDataLoader(_TinyItems(9), 2, shuffle=shuffle, seed=5,
                            num_workers=2)
        assert len(a) == len(b)
        for _ in range(2):  # two epochs: the epoch seed advances alike
            batches_a, batches_b = list(a), list(b)
            assert len(batches_a) == len(batches_b)
            for (ia, la), (ib, lb) in zip(batches_a, batches_b):
                np.testing.assert_array_equal(ia, ib)
                np.testing.assert_array_equal(la, lb)


def test_grain_loader_fast_forward_and_sharding():
    pytest.importorskip("grain")
    from scaleprotoseg_tpu.data.grain_loader import GrainDataLoader

    # fast_forward(k) == skip the first k batches of the same stream
    ref = GrainDataLoader(_TinyItems(9), 2, shuffle=True, seed=1,
                          num_workers=1)
    full = list(ref)
    resumed = GrainDataLoader(_TinyItems(9), 2, shuffle=True, seed=1,
                              num_workers=1)
    resumed.fast_forward(2)
    for (ia, _), (ib, _) in zip(full[2:], resumed):
        np.testing.assert_array_equal(ia, ib)

    # host shards are disjoint, equal-sized, and drop the ragged tail
    seen = set()
    for h in range(2):
        ld = GrainDataLoader(_TinyItems(9), 2, shuffle=False,
                             num_workers=1, host_id=h, num_hosts=2)
        for img, _ in ld:
            seen.update(int(v) for v in img[:, 0, 0, 0])
    assert len(seen) == 8


def test_make_loaders_grain_backend(tmp_path):
    """gin PatchClassificationDataModule.loader_backend='grain' routes
    make_loaders through the grain engine."""
    pytest.importorskip("grain")
    import sys
    sys.path.insert(0, "tests")
    from e2e_utils import TINY_EM_CONFIG, build_synthetic_dataset

    from scaleprotoseg_tpu import configlib
    from scaleprotoseg_tpu.cli_common import make_loaders
    from scaleprotoseg_tpu.data.grain_loader import GrainDataLoader

    root = build_synthetic_dataset(str(tmp_path / "d"), n_train=4, n_val=2)
    cfg = tmp_path / "cfg.gin"
    cfg.write_text(TINY_EM_CONFIG +
                   "\nPatchClassificationDataModule.loader_backend = "
                   "'grain'\n")
    configlib.parse_config(cfg.read_text())
    try:
        tl, vl = make_loaders(2, num_workers=1, data_root=root)
        assert isinstance(tl, GrainDataLoader)
        images, labels = next(iter(vl))
        assert images.shape == (2, 32, 32, 3)
        assert labels.shape == (2, 32, 32)
    finally:
        configlib.clear_config()


@pytest.mark.slow
def test_grain_loader_process_workers():
    """use_processes=True (grain mp_prefetch): same stream, process
    workers running the augmentation map."""
    pytest.importorskip("grain")
    from scaleprotoseg_tpu.data.grain_loader import GrainDataLoader

    ld = GrainDataLoader(_TinyItems(9), 2, shuffle=True, seed=1,
                         num_workers=2, use_processes=True)
    ref = GrainDataLoader(_TinyItems(9), 2, shuffle=True, seed=1,
                          num_workers=2)
    for (a, _), (b, _) in zip(ld, ref):
        np.testing.assert_array_equal(a, b)


def test_grain_loader_det_seed_real_dataset_parity(tmp_path):
    """With the real augmentation stack in det_seed mode (item contents
    a pure function of (seed, epoch, index)), the grain and threaded
    backends yield bit-identical batches — the guarantee that lets a
    run switch loader_backend without changing its trajectory."""
    pytest.importorskip("grain")
    import sys
    sys.path.insert(0, "tests")
    from e2e_utils import build_synthetic_dataset

    from scaleprotoseg_tpu.data.dataset import PatchClassificationDataset
    from scaleprotoseg_tpu.data.grain_loader import GrainDataLoader
    from scaleprotoseg_tpu.data.loader import DataLoader

    root = build_synthetic_dataset(str(tmp_path / "d"), n_train=6, n_val=2)

    def make(cls):
        ds = PatchClassificationDataset(
            split_key="train", is_eval=False, data_type="em",
            window_size=(32, 32), image_margin_size=0,
            mean=[0.5] * 3, std=[0.5] * 3, scales=(0.8, 1.2),
            only_19_from_cityscapes=False, root=root, det_seed=11)
        return cls(ds, 2, shuffle=True, seed=4, num_workers=2)

    a, b = make(DataLoader), make(GrainDataLoader)
    for _ in range(2):  # two epochs: set_epoch advances identically
        for (ia, la), (ib, lb) in zip(list(a), list(b)):
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(la, lb)
