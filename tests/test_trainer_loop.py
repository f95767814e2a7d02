"""EpochTrainer end-to-end mini loop (CPU): train 1 epoch, snapshot, resume,
validate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcrnet_tpu.config import make_test_cfg
from lcrnet_tpu.data.loader import RegistrationPairDataset, pair_loader
from lcrnet_tpu.engine.trainer import EpochTrainer

from test_model import make_pair


@pytest.mark.slow
def test_trainer_epoch_snapshot_resume_validate(tmp_path, rng):
    cfg = make_test_cfg()
    scans = {}
    pairs = []
    for i in range(3):
        r = np.random.default_rng(100 + i)
        ref, src, t = make_pair(r, n=320)
        scans[2 * i] = src
        scans[2 * i + 1] = ref
        pairs.append({"anc_idx": 2 * i, "pos_idx": 2 * i + 1, "transform": t})
    ds = RegistrationPairDataset(lambda i: scans[i], pairs, cfg)

    def loader():
        return pair_loader(ds, batch_size=1, shuffle=False, drop_last=False)

    out = str(tmp_path / "run")
    trainer = EpochTrainer(
        cfg,
        loader,
        val_loader=loader,
        output_dir=out,
        steps_per_epoch=3,
        log_steps=2,
        val_after=0,
        val_every=1,
    )
    trainer.run(max_epoch=1)
    assert trainer.epoch == 1

    # resume into a fresh trainer
    trainer2 = EpochTrainer(cfg, loader, output_dir=out, steps_per_epoch=3)
    trainer2.resume()
    assert trainer2.epoch == 1
    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(trainer2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # validation produces the registration metrics
    metrics = trainer.validate()
    assert set(metrics) >= {"PIR", "IR", "RRE", "RTE", "RR"}


@pytest.mark.slow
def test_trainer_chunked_epoch(tmp_path, rng):
    """chunk=2 over 3 batches: one scanned chunk + a per-step tail, all 3
    samples consumed, iteration count exact."""
    cfg = make_test_cfg()
    scans = {}
    pairs = []
    for i in range(3):
        r = np.random.default_rng(200 + i)
        ref, src, t = make_pair(r, n=320)
        scans[2 * i] = src
        scans[2 * i + 1] = ref
        pairs.append({"anc_idx": 2 * i, "pos_idx": 2 * i + 1, "transform": t})
    ds = RegistrationPairDataset(lambda i: scans[i], pairs, cfg)

    def loader():
        return pair_loader(ds, batch_size=1, shuffle=False, drop_last=False)

    trainer = EpochTrainer(
        cfg,
        loader,
        output_dir=str(tmp_path / "run"),
        steps_per_epoch=3,
        log_steps=1,
        chunk=2,
    )
    summary = trainer.train_epoch()
    assert trainer.iteration == 3
    assert np.isfinite(summary["loss"])

    # chunked stepping is single-chip only
    class FakeMesh:
        pass

    with pytest.raises(ValueError):
        EpochTrainer(cfg, loader, output_dir=str(tmp_path / "x"), chunk=2, mesh=FakeMesh())


@pytest.mark.slow
def test_run_iterations_chunked_budget_exact(tmp_path, rng):
    """Chunked run_iterations must consume exactly max_iterations samples
    even when the budget is not a chunk multiple (partial-chunk drain)."""
    cfg = make_test_cfg()
    scans = {}
    pairs = []
    for i in range(5):
        r = np.random.default_rng(300 + i)
        ref, src, t = make_pair(r, n=320)
        scans[2 * i] = src
        scans[2 * i + 1] = ref
        pairs.append({"anc_idx": 2 * i, "pos_idx": 2 * i + 1, "transform": t})
    ds = RegistrationPairDataset(lambda i: scans[i], pairs, cfg)

    def loader():
        return pair_loader(ds, batch_size=1, shuffle=False, drop_last=False)

    trainer = EpochTrainer(
        cfg, loader, output_dir=str(tmp_path / "run"),
        steps_per_epoch=5, log_steps=2, chunk=2,
    )
    trainer.run_iterations(max_iterations=5, snapshot_every=100)
    assert trainer.iteration == 5


@pytest.mark.slow
def test_trainer_halo_epoch(tmp_path, rng):
    """EpochTrainer(halo=True) trains an epoch through the ring-halo
    shard_map step on a (dp=1, mp=2) mesh and produces finite metrics."""
    if len(jax.devices()) < 2:
        pytest.skip("needs forced host devices")
    from lcrnet_tpu.parallel.mesh import make_mesh

    cfg = make_test_cfg()
    scans = {}
    pairs = []
    for i in range(2):
        r = np.random.default_rng(400 + i)
        ref, src, t = make_pair(r, n=320)
        scans[2 * i] = src
        scans[2 * i + 1] = ref
        pairs.append({"anc_idx": 2 * i, "pos_idx": 2 * i + 1, "transform": t})
    ds = RegistrationPairDataset(lambda i: scans[i], pairs, cfg)

    def loader():
        return pair_loader(ds, batch_size=1, shuffle=False, drop_last=False)

    trainer = EpochTrainer(
        cfg, loader, output_dir=str(tmp_path / "run"),
        steps_per_epoch=2, log_steps=1,
        mesh=make_mesh(dp=1, mp=2), halo=True,
    )
    trainer.run(max_epoch=1)
    assert trainer.epoch == 1

    # halo without a mesh is a configuration error
    with pytest.raises(ValueError):
        EpochTrainer(cfg, loader, output_dir=str(tmp_path / "y"), halo=True)
