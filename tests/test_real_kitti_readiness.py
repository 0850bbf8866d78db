"""Real-KITTI readiness: non-trained classes (Van/Truck/Person_sitting),
DontCare regions, and the real size diversity (370-376 x 1224-1242) through
dataset -> loader -> targets -> eval."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from monocon_tpu.data import DataLoader, MonoConDataset
from monocon_tpu.data.synthetic import make_calib_text, make_label_line


@pytest.fixture(scope="module")
def mixed_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("kitti_mixed")
    training = root / "training"
    for sub in ("image_2", "calib", "label_2"):
        (training / sub).mkdir(parents=True)
    (root / "ImageSets").mkdir()

    sizes = [(375, 1242), (370, 1224), (374, 1238), (376, 1241)]
    rng = np.random.default_rng(0)
    ids = []
    for i, hw in enumerate(sizes):
        sid = f"{i:06d}"
        ids.append(sid)
        cv2.imwrite(str(training / "image_2" / f"{sid}.png"),
                    rng.integers(0, 255, (*hw, 3), np.uint8))
        (training / "calib" / f"{sid}.txt").write_text(make_calib_text())
        lines = [
            make_label_line(name="Car", bbox=(390, 180, 510, 250),
                            loc=(-2.0, 1.8, 25.0)),
            make_label_line(name="Van", bbox=(600, 170, 700, 230),
                            loc=(3.0, 1.7, 30.0)),
            make_label_line(name="Truck", bbox=(200, 150, 380, 260),
                            dim_hwl=(3.2, 2.5, 9.0), loc=(-8.0, 2.0, 22.0)),
            make_label_line(name="Person_sitting", bbox=(520, 185, 555, 235),
                            dim_hwl=(1.3, 0.6, 0.9), loc=(1.0, 1.6, 18.0)),
            make_label_line(name="Pedestrian", bbox=(560, 180, 590, 240),
                            dim_hwl=(1.8, 0.6, 0.9), loc=(1.8, 1.6, 16.0)),
            "DontCare -1 -1 -10 700.00 160.00 800.00 200.00 "
            "-1 -1 -1 -1000 -1000 -1000 -10",
        ]
        (training / "label_2" / f"{sid}.txt").write_text("\n".join(lines) + "\n")
    (root / "ImageSets" / "train.txt").write_text("\n".join(ids) + "\n")
    (root / "ImageSets" / "val.txt").write_text("\n".join(ids) + "\n")
    return str(root)


def test_untrained_classes_excluded_from_training(mixed_root):
    ds = MonoConDataset(mixed_root, "train", transforms=[])
    sample = ds.get_sample(0)
    m = sample["label"]["mask"]
    # only Car (2) and Pedestrian (0) are trainable classes here
    classes = set(sample["label"]["gt_labels"][m].tolist())
    assert classes <= {0.0, 2.0}
    assert m.sum() == 2


def test_size_diversity_collates_to_one_canvas(mixed_root):
    ds = MonoConDataset(mixed_root, "train")
    loader = DataLoader(ds, batch_size=4, num_workers=2,
                        pad_hw=(384, 1248), seed=0)
    batch = next(iter(loader))
    assert batch["img"].shape == (4, 384, 1248, 3)
    # targets build from the common canvas without NaN
    from monocon_tpu.ops.targets import generate_targets

    tgt = generate_targets(
        {k: jnp.asarray(v) for k, v in batch["label"].items()},
        (96, 312), (384, 1248),
    )
    assert not any(bool(jnp.isnan(v).any()) for v in tgt.values())


def test_gt_eval_keeps_neighbor_classes(mixed_root):
    """Van/Person_sitting must reach the evaluator as ignore-neighbors."""
    ds = MonoConDataset(mixed_root, "val", transforms=[])
    annos = ds.collect_gt_annos()
    names = set(annos[0]["name"].tolist())
    assert {"Van", "Truck", "Person_sitting", "DontCare"} <= names

    from monocon_tpu.eval import clean_data

    dt = {
        "name": np.array(["Car"]),
        "bbox": np.array([[390.0, 180.0, 510.0, 250.0]]),
        "alpha": np.array([0.1]),
        "score": np.array([0.9]),
    }
    num_valid, ig_gt, ig_dt, dc = clean_data(annos[0], dt, 0, 2)  # Car, hard
    # Van is ignore (1), Truck skip (-1), Car counted (0)
    by_name = dict(zip(annos[0]["name"].tolist(), ig_gt.tolist()))
    assert by_name["Car"] == 0
    assert by_name["Van"] == 1
    assert by_name["Truck"] == -1
    assert dc.shape == (1, 4)
