"""Fetch ImageNet-pretrained DLA backbone weights and cache them locally.

The reference auto-downloads by arch hash inside the model constructor
(model/backbone/dla.py:248-262); here it is an explicit, hash-checked,
resumable tool so offline environments can pre-place the file and training
is one command either way:

    python scripts/fetch_dla_weights.py --arch 34 --out weights/
    python train.py --data_root <kitti> \
        # with MODEL.BACKBONE.PRETRAINED_PATH: weights/dla34-ba72cf86.pth

The torch-url hash suffix is the first 8 hex chars of the file's SHA256,
which torch.hub verifies; we check the same prefix after download. With
``--convert`` the .pth is additionally converted to our Flax variable tree
and saved as a .npz for torch-free startup.
"""

import argparse
import hashlib
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (arch_name, torch-hub hash prefix) — reference dla.py:250-254.
NUM_LAYERS_TO_HASH = {
    34: ("dla34", "ba72cf86"),
    46: ("dla46_c", "2bfd52c3"),
    60: ("dla60", "24839fc4"),
    102: ("dla102", "d94d9790"),
}
BASE_URL = "http://dl.yf.io/dla/models/imagenet"


def fetch(arch: int, out_dir: str) -> str:
    name, hash_prefix = NUM_LAYERS_TO_HASH[arch]
    fname = f"{name}-{hash_prefix}.pth"
    path = os.path.join(out_dir, fname)
    if os.path.isfile(path) and _sha_ok(path, hash_prefix):
        print(f"already cached: {path}")
        return path
    os.makedirs(out_dir, exist_ok=True)
    url = f"{BASE_URL}/{fname}"
    print(f"downloading {url} ...")
    tmp = path + ".part"
    urllib.request.urlretrieve(url, tmp)
    if not _sha_ok(tmp, hash_prefix):
        os.remove(tmp)
        raise RuntimeError(f"SHA256 prefix mismatch for {fname}")
    os.replace(tmp, path)
    print(f"saved {path}")
    return path


def _sha_ok(path: str, hash_prefix: str) -> bool:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest().startswith(hash_prefix)


def convert(path: str) -> str:
    """Convert the torch .pth to our Flax variable tree, cached as .npz."""
    import numpy as np

    from monocon_tpu.utils.torch_convert import load_imagenet_backbone

    variables = load_imagenet_backbone(path)
    out = os.path.splitext(path)[0] + ".flax.npz"
    from flax.traverse_util import flatten_dict

    flat = {
        "/".join(("params",) + k): np.asarray(v)
        for k, v in flatten_dict(variables["params"]).items()
    }
    flat.update({
        "/".join(("batch_stats",) + k): np.asarray(v)
        for k, v in flatten_dict(variables["batch_stats"]).items()
    })
    np.savez(out, **flat)
    print(f"converted -> {out} ({len(flat)} arrays)")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", type=int, default=34,
                    choices=sorted(NUM_LAYERS_TO_HASH))
    ap.add_argument("--out", default="weights")
    ap.add_argument("--convert", action="store_true",
                    help="also convert to a Flax .npz")
    args = ap.parse_args()
    path = fetch(args.arch, args.out)
    if args.convert:
        convert(path)
    return 0


if __name__ == "__main__":
    main()
