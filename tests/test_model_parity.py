"""Full-model numerical parity: reference torch MonoConDetector (random
init) -> weight conversion -> our Flax detector, identical predictions."""

import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def torch_detector():
    sys.path.insert(0, REFERENCE)
    try:
        import torch

        torch.manual_seed(0)
        from model.detector.monocon_detector import MonoConDetector as TorchDetector
    finally:
        sys.path.pop(0)
    model = TorchDetector(num_dla_layers=34, pretrained_backbone=False)
    model.eval()
    return model


def test_forward_parity(torch_detector):
    import jax.numpy as jnp
    import torch

    from monocon_tpu.models import MonoConDetector
    from monocon_tpu.utils.torch_convert import convert_state_dict

    variables = convert_state_dict(torch_detector.state_dict())
    variables = {
        k: jnp.asarray(v) if not isinstance(v, dict) else v for k, v in variables.items()
    }

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 64, 160)).astype(np.float32)

    with torch.no_grad():
        feat = torch_detector.backbone(torch.from_numpy(x))
        feat = torch_detector.neck(list(feat))[0]
        ref_preds = torch_detector.head.forward_test(feat)

    model = MonoConDetector(num_layers=34)
    ours = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       train=False)

    assert set(ours.keys()) == set(ref_preds.keys())
    for key in ref_preds:
        theirs = ref_preds[key].numpy()
        mine = np.transpose(np.asarray(ours[key]), (0, 3, 1, 2))
        np.testing.assert_allclose(
            mine, theirs, rtol=1e-3, atol=1e-4, err_msg=key
        )


def test_forward_golden_f64(torch_detector):
    """Eval forward in float64 on BOTH sides (torch ``.double()`` vs
    ``jax.enable_x64``): proves the forward has NO semantic deviation —
    the f32 test above tolerates ~1e-4 which is reduction-order noise
    (one-pass AttnWeights moments, fast-variance BN, XLA fusion order);
    in f64 that noise floor collapses and the heads must agree to ~1e-9,
    so a wrong estimator, eps, or momentum anywhere would fail loudly."""
    import jax
    import jax.numpy as jnp
    import torch

    from monocon_tpu.models import MonoConDetector
    from monocon_tpu.utils.torch_convert import convert_state_dict

    variables = convert_state_dict(torch_detector.state_dict())

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 64, 160)).astype(np.float32)

    ref64 = torch_detector.double()
    with torch.no_grad():
        feat = ref64.backbone(torch.from_numpy(x).double())
        feat = ref64.neck(list(feat))[0]
        ref_preds = {k: v.numpy() for k, v in
                     ref64.head.forward_test(feat).items()}
    torch_detector.float()  # restore for other tests in the module

    model = MonoConDetector(num_layers=34)
    with jax.enable_x64(True):
        v64 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), variables)
        ours = jax.jit(
            lambda v, img: model.apply(v, img, train=False)
        )(v64, jnp.asarray(np.transpose(x, (0, 2, 3, 1)), jnp.float64))
        ours = jax.tree.map(np.asarray, ours)

    assert set(ours.keys()) == set(ref_preds.keys())
    for key in ref_preds:
        mine = np.transpose(ours[key], (0, 3, 1, 2))
        np.testing.assert_allclose(
            mine, ref_preds[key], rtol=1e-6, atol=1e-9, err_msg=key
        )


def test_variable_tree_is_exhaustive(torch_detector):
    """Every converted leaf must land on an existing flax variable (and
    vice versa) — guards against silently dropped weights."""
    import jax

    from monocon_tpu.models import create_detector_state
    from monocon_tpu.utils.torch_convert import convert_state_dict

    converted = convert_state_dict(torch_detector.state_dict())
    _, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=(64, 160)
    )

    def paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + (k,))
            else:
                out.add(prefix + (k, tuple(np.shape(v))))
        return out

    for col in ("params", "batch_stats"):
        ours = paths(jax.tree.map(np.asarray, dict(variables[col])))
        theirs = paths(converted[col])
        missing = ours - theirs
        extra = theirs - ours
        assert not missing, f"{col}: not covered by conversion: {sorted(missing)[:5]}"
        assert not extra, f"{col}: converted but unused: {sorted(extra)[:5]}"
