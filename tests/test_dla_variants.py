"""Parity for the non-default DLA variants (Bottleneck blocks, deeper
trees, 128-channel heads)."""

import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.mark.parametrize("num_layers", [46, 60])
def test_dla_variant_parity(num_layers):
    import torch

    sys.path.insert(0, REFERENCE)
    try:
        torch.manual_seed(0)
        from model.backbone.dla import DLA as TorchDLA
    finally:
        sys.path.pop(0)

    import jax.numpy as jnp

    from monocon_tpu.models.dla import DLA
    from monocon_tpu.utils.torch_convert import convert_state_dict

    torch_bb = TorchDLA(num_layers, pretrained=False)
    torch_bb.eval()
    state = {f"backbone.{k}": v for k, v in torch_bb.state_dict().items()}
    variables = convert_state_dict(state)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = torch_bb(torch.from_numpy(x))

    ours = DLA(num_layers).apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False,
    )
    for i, (a, b) in enumerate(zip(ours, ref)):
        # fp32 accumulation noise grows through the deeper bottleneck trees
        np.testing.assert_allclose(
            np.transpose(np.asarray(a), (0, 3, 1, 2)), b.numpy(),
            rtol=1e-3, atol=2e-3, err_msg=f"dla{num_layers} level{i}",
        )


def test_dla60_detector_shapes():
    """Full detector with 128-ch heads builds and produces stride-4 maps."""
    import jax
    import jax.numpy as jnp

    from monocon_tpu.models import create_detector_state

    model, variables = create_detector_state(
        jax.random.PRNGKey(0), num_layers=60, image_hw=(64, 96)
    )
    out = model.apply(variables, jnp.zeros((1, 64, 96, 3)), train=False)
    assert out["center_heatmap_pred"].shape == (1, 16, 24, 3)
    assert out["dim_pred"].shape == (1, 16, 24, 3)
