"""Reverse weight conversion: Flax variables -> reference torch .pth.

Round-trip property: reference state dict -> convert_state_dict ->
export_state_dict must reproduce the original BIT-FOR-BIT (the layout
transforms are pure transposes/flips), with the exact torch key set, and
the result must pass ``load_state_dict(strict=True)`` on the reference
model — so TPU-trained weights flow back into the reference ecosystem
(its test.py / visualizers / downstream consumers)."""

import os
import sys
import tempfile

import numpy as np
import pytest

REFERENCE = "/root/reference"


def _ref_model(num_layers):
    sys.path.insert(0, REFERENCE)
    try:
        import torch

        torch.manual_seed(0)
        from model.detector.monocon_detector import MonoConDetector
    finally:
        sys.path.pop(0)
    return MonoConDetector(num_dla_layers=num_layers,
                           pretrained_backbone=False)


@pytest.mark.parametrize("num_layers", [34, 46, 60, 102])
def test_roundtrip_bit_exact(num_layers):
    import torch

    from monocon_tpu.utils.torch_convert import (convert_state_dict,
                                                 export_state_dict)

    model = _ref_model(num_layers)
    original = {k: v.numpy() for k, v in model.state_dict().items()}

    exported = export_state_dict(convert_state_dict(model.state_dict()))

    assert set(exported) == set(original)
    for key, val in original.items():
        np.testing.assert_array_equal(
            exported[key], val, err_msg=key, strict=True
        )

    # And torch accepts it strictly.
    model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in exported.items()},
        strict=True,
    )


def test_pth_checkpoint_loads_in_reference_engine_format():
    """save_torch_checkpoint emits the reference engine container
    (base_engine.py:176-187) and our own loader reads it back."""
    import torch

    from monocon_tpu.utils.torch_convert import (convert_state_dict,
                                                 load_torch_checkpoint,
                                                 save_torch_checkpoint)

    model = _ref_model(34)
    variables = convert_state_dict(model.state_dict())

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "epoch_007.pth")
        save_torch_checkpoint(variables, path, epoch=7, iters=1234)

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        assert ckpt["engine_attrs"] == {"epochs": 7, "global_iters": 1234}
        assert ckpt["state_dict"]["optimizer"] is None
        model.load_state_dict(ckpt["state_dict"]["model"], strict=True)

        # Our own .pth import path reads what we wrote.
        reloaded = load_torch_checkpoint(path)
        flat0 = jax_flatten(variables)
        flat1 = jax_flatten(reloaded)
        assert set(flat0) == set(flat1)
        for k in flat0:
            np.testing.assert_array_equal(flat0[k], flat1[k], err_msg=k)


def jax_flatten(tree):
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(p): np.asarray(l) for p, l in flat}
