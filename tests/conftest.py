"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4 item 5).  These env
vars must be set before the first ``import jax`` anywhere in the test
process, which conftest guarantees.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# The fast profile is XLA:CPU-compile-dominated on this 1-core host
# (~10 min cold).  Share one persistent compilation cache across runs at
# a stable per-user path OUTSIDE the repo (ephemeral LOG_DIRs mean the
# CLI's own LOG_DIR/jax_cache never persists under pytest): warm runs
# drop to roughly half.  Set JAX_COMPILATION_CACHE_DIR='' to force a
# cold run (that is what the documented cold time measures).
_cache = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/scaleprotoseg_tpu/test_jax_cache"))
# the XLA:CPU AOT loader logs 2 benign machine-feature-mismatch ERROR
# lines per cache hit (prefer-no-scatter/gather pseudo-features); hide
# native log spam under pytest
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# The hosted TPU plugin pins JAX_PLATFORMS at interpreter startup; the env
# assignment above is not enough, so force the platform through the config.
jax.config.update("jax_platforms", "cpu")
if _cache:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20220227)


@pytest.fixture(scope="session")
def shared_tiny_run(tmp_path_factory):
    """One tiny-EM e2e training shared by read-mostly CLI tests.

    The training is compile-dominated (~1 min on this 1-core host), so
    the eval-CLI and pruning suites share a single run ("shared_run")
    instead of each training their own.  Contract: consumers may ADD
    artifacts under the run dir (evaluation/, pruned/, th-* checkpoints)
    but must never modify checkpoints/{warmup,nopush,push}* or the
    dataset — those are shared inputs.  Returns (results_root,
    data_root, config_path); the run name is "shared_run".
    """
    root = build_synthetic_dataset(
        str(tmp_path_factory.mktemp("synth_shared")))
    results = tmp_path_factory.mktemp("results_shared")
    os.environ["RESULTS_DIR"] = str(results)
    from scaleprotoseg_tpu.train_wandb_multiscale import train
    cfg = results / "tiny.gin"
    cfg.write_text(TINY_EM_CONFIG.replace("train.joint_steps = 6",
                                          "train.joint_steps = 3")
                   .replace("train.finetune_steps = 4",
                            "train.finetune_steps = 0"))
    train(str(cfg), "shared_run", data_root=root, num_workers=2)
    return str(results), root, str(cfg)


# imported late so the jax platform pinning above runs first
from e2e_utils import TINY_EM_CONFIG, build_synthetic_dataset  # noqa: E402
