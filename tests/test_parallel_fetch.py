"""BulkFetcher unit tests + multi-host loader index-sharding invariants."""

import numpy as np

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


def test_equivariance_shim_import_path():
    from scaleprotoseg_tpu.analysis.equivariance import quantile_map
    m = quantile_map(np.arange(16.0).reshape(4, 4), 0.75)
    assert m.shape == (4, 4, 1) and m.sum() == 4
