"""The real-KITTI reproduction path, proven end-to-end on synthetic data:
a reference-format detector ``.pth`` (exactly what the published
``best.pth`` is) drives ``test.py --checkpoint_file best.pth --evaluate``
to a full AP table. With real KITTI at DATA.ROOT and the published
checkpoint, the same command reproduces the reference's AP 19.02 —
see README "Reproducing the reference AP".
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    from monocon_tpu.data.synthetic import generate_kitti_dataset

    root = tmp_path_factory.mktemp("kitti_pth")
    generate_kitti_dataset(str(root), num_train=2, num_val=3,
                           image_hw=(160, 512), seed=9)
    return str(root)


@pytest.fixture(scope="module")
def reference_pth(tmp_path_factory):
    """A detector checkpoint in the reference's published format:
    {'state_dict'/'model': MonoConDetector.state_dict()}."""
    import torch

    sys.path.insert(0, REFERENCE)
    try:
        torch.manual_seed(3)
        from model.detector.monocon_detector import MonoConDetector
    finally:
        sys.path.pop(0)
    det = MonoConDetector(num_dla_layers=34, pretrained_backbone=False)
    path = str(tmp_path_factory.mktemp("ckpt") / "best.pth")
    torch.save({"state_dict": det.state_dict()}, path)
    return path


def test_test_cli_evaluates_reference_pth(synthetic_root, reference_pth,
                                          tmp_path):
    """One command: test.py --checkpoint_file best.pth --evaluate."""
    cfg_path = str(tmp_path / "cfg.yaml")
    from monocon_tpu.config import export_cfg, get_default_cfg

    cfg = get_default_cfg()
    cfg.DATA.ROOT = synthetic_root
    cfg.DATA.BATCH_SIZE = 2
    cfg.DATA.NUM_WORKERS = 2
    cfg.TPU.PAD_HW = [160, 512]
    export_cfg(cfg, cfg_path)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "/root/repo/test.py",
         "--config_file", cfg_path,
         "--checkpoint_file", reference_pth,
         "--evaluate"],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout
    assert "loaded" in out
    assert "Eval Results" in out
    assert "Car AP40@0.70, 0.70, 0.70:" in out
    assert "3d   AP40:" in out


def test_loaded_pth_forward_matches_reference(synthetic_root, reference_pth):
    """The .pth import is numerically the reference model: forward parity
    on a real batch after engine.load_checkpoint(best.pth)."""
    import torch

    import jax.numpy as jnp

    from monocon_tpu.config import get_default_cfg
    from monocon_tpu.engine import MonoConEngine

    cfg = get_default_cfg()
    cfg.DATA.ROOT = synthetic_root
    cfg.DATA.BATCH_SIZE = 2
    cfg.DATA.NUM_WORKERS = 2
    cfg.TPU.PAD_HW = [160, 512]
    engine = MonoConEngine(cfg, is_test=True)
    engine.load_checkpoint(reference_pth)

    batch = next(iter(engine.test_loader))
    # The loader ships raw uint8 (TPU.IMAGE_TRANSPORT); materialize the
    # device-side normalization once so both frameworks see the same f32
    # input (ops/image_norm.py is bit-equal to the host Normalize).
    from monocon_tpu.ops.image_norm import normalize_if_raw

    img = np.asarray(normalize_if_raw(jnp.asarray(batch["img"])))
    pred = engine.model.apply(
        {"params": engine.state.params,
         "batch_stats": engine.state.batch_stats},
        jnp.asarray(img), train=False,
    )

    sys.path.insert(0, REFERENCE)
    try:
        from model.detector.monocon_detector import MonoConDetector
    finally:
        sys.path.pop(0)
    det = MonoConDetector(num_dla_layers=34, pretrained_backbone=False)
    det.load_state_dict(torch.load(reference_pth, weights_only=False)["state_dict"])
    det.eval()
    with torch.no_grad():
        x = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
        feat = det.neck(list(det.backbone(x)))[0]
        ref = det.head.forward_test(feat)
    ref_heat = ref["center_heatmap_pred"].numpy()  # NCHW

    np.testing.assert_allclose(
        np.transpose(np.asarray(pred["center_heatmap_pred"]), (0, 3, 1, 2)),
        ref_heat, rtol=1e-3, atol=1e-4,
    )
