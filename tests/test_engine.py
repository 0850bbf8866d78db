"""End-to-end engine tests: short training run, checkpoint/auto-resume,
evaluation, visualization — all on the synthetic KITTI tree."""

import glob
import os

import numpy as np
import pytest

from monocon_tpu.config import get_default_cfg
from monocon_tpu.data.synthetic import generate_kitti_dataset


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_engine")
    out = tmp_path_factory.mktemp("outputs")
    generate_kitti_dataset(
        str(root), num_train=4, num_val=2, image_hw=(160, 512), seed=5
    )
    cfg = get_default_cfg()
    cfg.DATA.ROOT = str(root)
    cfg.DATA.BATCH_SIZE = 2
    cfg.DATA.NUM_WORKERS = 2
    cfg.SOLVER.OPTIM.NUM_EPOCHS = 2
    cfg.PERIOD.EVAL_PERIOD = -1  # no mid-train eval; we call it explicitly
    cfg.PERIOD.LOG_PERIOD = 1
    cfg.OUTPUT_DIR = str(out)
    cfg.SEED = 0
    cfg.TPU.PAD_HW = [160, 512]
    cfg.DATA.CROP_HW = [128, 384]  # images are 160x512 in this fixture
    return cfg


def test_train_eval_resume_cycle(env, capsys):
    from monocon_tpu.engine import MonoConEngine

    engine = MonoConEngine(env.clone())
    assert len(engine.train_loader) == 2
    engine.train()
    out = capsys.readouterr().out
    assert "Progress" in out and "LR" in out
    # Loss history is per-STEP (reference monocon_engine.py:84-90), kept
    # as host floats once each epoch closes.
    assert len(engine.entire_losses) == engine.global_iters - 1
    assert all(isinstance(v, float) for v in engine.entire_losses)
    # current_lr reads the injected hyperparams, not the config fallback.
    assert engine.current_lr > 0

    # final checkpoint exists
    ckpts = sorted(glob.glob(os.path.join(env.OUTPUT_DIR, "checkpoints", "epoch_*")))
    assert ckpts, "no checkpoint written"
    assert ckpts[-1].endswith("_final")
    # config exported
    assert os.path.isfile(os.path.join(env.OUTPUT_DIR, "config.yaml"))
    # metrics written
    assert os.path.isfile(
        os.path.join(env.OUTPUT_DIR, "tf_logs", "metrics.jsonl")
    )

    # Evaluation runs end-to-end and returns the reference key scheme.
    results = engine.evaluate(verbose=False)
    assert any("KITTI/Car_3D_AP40_moderate_strict" in k for k in results)

    # Auto-resume: a fresh engine picks up the latest checkpoint.
    cfg2 = env.clone()
    cfg2.SOLVER.OPTIM.NUM_EPOCHS = 3
    engine2 = MonoConEngine(cfg2)
    assert engine2.epochs == 3  # resumed past the 2 trained epochs
    np.testing.assert_allclose(
        float(np.asarray(engine2.state.step)),
        float(np.asarray(engine.state.step)),
    )
    # Loss/time history restores with the checkpoint (reference
    # base_engine.py:191-219): the 100-step moving average and the ETA
    # continue across preemption instead of resetting.
    assert engine2.entire_losses == engine.entire_losses
    assert engine2.epoch_times == pytest.approx(engine.epoch_times)


class _FirstN:
    """Loader wrapper yielding only the first n batches of each epoch —
    simulates preemption mid-epoch."""

    def __init__(self, loader, n):
        self.loader, self.n = loader, n

    def __len__(self):
        return len(self.loader)

    def set_epoch(self, epoch):
        self.loader.set_epoch(epoch)

    def __iter__(self):
        it = iter(self.loader)
        for _ in range(self.n):
            yield next(it)


def test_midepoch_resume_matches_uninterrupted(env, tmp_path):
    """A CKPT_PERIOD_STEPS checkpoint taken mid-epoch must resume INSIDE
    the interrupted epoch (skipping its already-trained prefix via the
    loader's deterministic per-epoch shuffle), so the continued run
    reproduces an uninterrupted run bit-for-bit. Previously the resume
    jumped to epoch+1 and silently dropped the rest of the epoch."""
    import jax

    from monocon_tpu.engine import MonoConEngine

    def make_cfg(out):
        cfg = env.clone()
        cfg.SOLVER.OPTIM.NUM_EPOCHS = 1  # 4 imgs / B=2 -> 2 steps
        cfg.OUTPUT_DIR = str(out)
        cfg.PERIOD.CKPT_PERIOD_STEPS = 1
        return cfg

    # Reference: one uninterrupted epoch.
    engine_a = MonoConEngine(make_cfg(tmp_path / "a"))
    engine_a.train()

    # Interrupted: only step 1 of the epoch runs, then the process "dies"
    # (the step-periodic checkpoint has already been written).
    engine_b = MonoConEngine(make_cfg(tmp_path / "b"))
    engine_b.train_loader = _FirstN(engine_b.train_loader, 1)
    engine_b.train_one_epoch()

    # Resume: a fresh engine picks up the mid-epoch checkpoint, re-enters
    # the SAME epoch, and skips the trained prefix. The resuming process
    # deliberately starts with a DIFFERENT SEED (train.py randomizes
    # SEED=-1 per process): the engine must adopt the checkpoint's seed,
    # or the replayed shuffle/augmentation stream diverges from the
    # interrupted run's and the prefix skip drops/duplicates samples.
    cfg_c = make_cfg(tmp_path / "b")
    cfg_c.SEED = 12345
    engine_c = MonoConEngine(cfg_c)
    assert engine_c.epochs == engine_b.epochs  # same epoch, not +1
    assert engine_c._resume_step_in_epoch == 1
    assert engine_c.cfg.SEED == 0  # adopted from the checkpoint
    assert engine_c.train_loader.seed == 0
    engine_c.train()

    # The continued run equals the uninterrupted one: same step counters,
    # same loss history, bit-identical parameters.
    assert engine_c.global_iters == engine_a.global_iters
    assert engine_c.entire_losses == engine_a.entire_losses
    leaves_a = jax.tree.leaves(engine_a.state.params)
    leaves_c = jax.tree.leaves(engine_c.state.params)
    for la, lc in zip(leaves_a, leaves_c):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lc))


def test_partial_checkpoint_skipped(tmp_path):
    """A crash in the window between the Orbax state commit and the
    meta.json write must not be auto-resumed: a resume that loads the
    newest weights but resets epochs/global_iters/seed silently breaks
    the shuffle-stream contract. latest_checkpoint only accepts dirs
    carrying the meta.json commit marker (written last, atomically)."""
    import jax.numpy as jnp
    import optax

    from monocon_tpu.engine.checkpoint import (latest_checkpoint,
                                               load_checkpoint,
                                               save_checkpoint)
    from monocon_tpu.engine.train_step import TrainState

    opt = optax.sgd(1e-3)
    params = {"w": jnp.ones((2,))}
    state = TrainState(params=params, batch_stats={"m": jnp.zeros((2,))},
                       opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    wd = str(tmp_path / "ckpts")
    p1 = save_checkpoint(wd, state, epoch=1, global_iters=10)
    p2 = save_checkpoint(wd, state, epoch=2, global_iters=20)
    assert latest_checkpoint(wd) == p2
    _, meta = load_checkpoint(p2, state)
    assert meta["epoch"] == 2 and meta["global_iters"] == 20
    # Simulate the crash window: state fully committed, meta never written.
    os.remove(os.path.join(p2, "meta.json"))
    assert latest_checkpoint(wd) == p1  # partial dir skipped
    os.remove(os.path.join(p1, "meta.json"))
    assert latest_checkpoint(wd) is None


def test_epoch_boundary_resume_skips_replay(env):
    """A resume whose checkpoint landed exactly on an epoch's last step
    (step_in_epoch == steps, e.g. CKPT_PERIOD_STEPS a multiple of the
    epoch length) must early-return from train_one_epoch — not iterate,
    decode and augment every batch just to skip it — and must report the
    restored epoch's true average, not NaN."""
    from monocon_tpu.engine import MonoConEngine

    engine = MonoConEngine(env.clone())
    steps = len(engine.train_loader)

    class _Boom:
        def __len__(self):
            return steps

        def set_epoch(self, epoch):
            pass

        def __iter__(self):
            raise AssertionError("completed epoch was replayed")

    # Simulate the restored state: the whole epoch's loss history is back
    # from meta.json and the resume marker says the epoch finished.
    engine.entire_losses = [2.0] * steps
    engine._resume_step_in_epoch = steps
    engine.train_loader = _Boom()
    assert engine.train_one_epoch() == pytest.approx(2.0)


def test_visualize(env, tmp_path):
    from monocon_tpu.engine import MonoConEngine

    cfg = env.clone()
    engine = MonoConEngine(cfg, is_test=True)
    out = str(tmp_path / "vis")
    engine.visualize(out, draw_items=["2d", "3d", "bev"])
    for item in ("2d", "3d", "bev"):
        files = os.listdir(os.path.join(out, item))
        assert len(files) == len(engine.test_dataset)


def test_torch_checkpoint_import(env, tmp_path):
    """Reference-format .pth loads through the engine test path."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    try:
        torch.manual_seed(0)
        from model.detector.monocon_detector import MonoConDetector as TorchDet
    finally:
        sys.path.pop(0)
    det = TorchDet(num_dla_layers=34, pretrained_backbone=False)
    pth = str(tmp_path / "ref.pth")
    torch.save({"state_dict": {"model": det.state_dict()}}, pth)

    from monocon_tpu.engine import MonoConEngine

    engine = MonoConEngine(env.clone(), is_test=True)
    engine.load_checkpoint(pth)
    # params actually replaced: compare one leaf against the torch tensor
    w = np.asarray(engine.state.params["heads"]["heatmap"]["conv2"]["bias"])
    ref = det.state_dict()["head.heatmap_head.3.bias"].numpy()
    np.testing.assert_allclose(w, ref, rtol=1e-6)
