"""Map profiled HLO fusion names to their source ops (metadata op_name).

Compiles the flagship forward (same config as scripts/profile_forward.py),
then prints, for each requested HLO instruction name (default: read from
stdin, one per line, e.g. pasted from the profile table), the XLA metadata
of its root and a few interior instructions — enough to attribute device
time to model components.

Usage:
  python scripts/map_fusions.py fusion.51 fusion.74 copy.119 ...
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()

import re
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from monocon_tpu.data.synthetic import DEFAULT_P2
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.ops.decode import decode_predictions

    names = sys.argv[1:]
    train = "--train" in names
    if train:
        names.remove("--train")
    bf16 = "--bf16" in names
    if bf16:
        names.remove("--bf16")

    pad_hw = (384, 1280)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(16, *pad_hw, 3)).astype(np.float32))

    if train:
        from monocon_tpu.engine import create_train_state, make_train_step
        from monocon_tpu.solver import build_optimizer

        model, variables = create_detector_state(
            jax.random.PRNGKey(0), image_hw=pad_hw,
            dtype=jnp.bfloat16 if bf16 else None,
        )
        optimizer = build_optimizer(total_steps=1000)
        state = create_train_state(variables, optimizer)
        step_fn = jax.jit(make_train_step(model, optimizer))
        b, o = 16, 30
        label = {
            "gt_bboxes": np.zeros((b, o, 4), np.float32),
            "gt_labels": np.zeros((b, o), np.float32),
            "gt_bboxes_3d": np.zeros((b, o, 7), np.float32),
            "depths": np.zeros((b, o), np.float32),
            "gt_kpts_2d": np.zeros((b, o, 18), np.float32),
            "gt_kpts_valid_mask": np.full((b, o, 9), 2, np.float32),
            "mask": np.zeros((b, o), np.float32),
        }
        label["mask"][:, :5] = 1
        label = {k: jnp.asarray(v) for k, v in label.items()}
        batch = {"img": image, "label": label}
        hlo = step_fn.lower(state, batch).compile().as_text()
    else:
        model, variables = create_detector_state(
            jax.random.PRNGKey(0), image_hw=pad_hw, dtype=jnp.bfloat16
        )

        @jax.jit
        def forward(variables, image, p2):
            pred = model.apply(variables, image, train=False)
            return decode_predictions(pred, p2, pad_hw)

        p2 = jnp.asarray(np.tile(DEFAULT_P2[None], (16, 1, 1)))
        hlo = forward.lower(variables, image, p2).compile().as_text()
    # Parse the HLO into blocks per computation, find fusion defs.
    # A fused computation is named %fused_computation... and the fusion
    # instruction refers to it: %fusion.51 = ... fusion(...), calls=%fused_X
    inst_re = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=\s*(.*)$")
    lines = hlo.splitlines()
    defs = {}
    for i, ln in enumerate(lines):
        m = inst_re.match(ln)
        if m:
            defs.setdefault(m.group(1), []).append((i, m.group(2)))

    comp_bodies = {}  # computation name -> (start, end) line range
    comp_re = re.compile(r"^%?([\w.\-]+)\s+(?:\([^)]*\)\s*->|\{)")
    cur = None
    for i, ln in enumerate(lines):
        if ln and not ln[0].isspace():
            m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)", ln)
            if m and ("{" in ln or "->" in ln):
                cur = m.group(1)
                comp_bodies[cur] = [i, i]
        if cur is not None:
            comp_bodies[cur][1] = i

    meta_re = re.compile(r'op_name="([^"]*)"')
    for name in names:
        entries = defs.get(name) or defs.get(name.replace("%", ""))
        if not entries:
            print(f"{name}: NOT FOUND")
            continue
        i, body = entries[0]
        metas = meta_re.findall(body)
        print(f"\n=== {name}")
        print("  " + body[:160])
        if metas:
            print(f"  root op_name: {metas[0]}")
        m = re.search(r"calls=%?([\w.\-]+)", body)
        if m and m.group(1) in comp_bodies:
            s, e = comp_bodies[m.group(1)]
            inner = set()
            for ln in lines[s:e + 1]:
                for om in meta_re.findall(ln):
                    inner.add(om)
            for om in sorted(inner)[:12]:
                print(f"    {om}")


if __name__ == "__main__":
    main()
