"""MonoCon training/evaluation engine.

Parity: reference ``engine/base_engine.py`` + ``engine/monocon_engine.py``:
1-based epoch counters, auto-resume from the latest checkpoint, periodic
eval + checkpointing every EVAL_PERIOD epochs, per-step console logging
with progress bar / LR / 100-step moving average, TensorBoard scalars
(``loss/*``, ``eval/*``), config export at train start.

TPU-native differences:
  * one jitted SPMD train step over a data-parallel mesh (all local
    devices by default) instead of a single-GPU loop;
  * the eval path is a second jitted program (forward + decode) with the
    score-threshold/KITTI conversion on host;
  * checkpoints are Orbax trees (+ meta.json), and reference ``.pth``
    checkpoints are importable via the weight converter.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode, export_cfg, get_default_cfg, load_cfg
from ..data import DataLoader, MonoConDataset
from ..models import create_detector_state
from ..ops.decode import decode_predictions
from ..ops.image_norm import normalize_if_raw
from ..parallel import make_mesh, replicate_state, shard_batch
from ..solver import build_optimizer
from ..utils.convert import (
    convert_to_kitti_2d,
    convert_to_kitti_3d,
    split_batch_detections,
    to_vis_format,
)
from ..utils.logging_utils import MetricsWriter, progress_bar, tprint
from .checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_weights_auto,
    save_checkpoint,
)
from .train_step import TrainState, create_train_state, make_train_step

TEST_SCORE_THRESHOLD = 0.4  # reference DEFAULT_TEST_CFG (monocon_heads.py:30-35)


class MonoConEngine:
    def __init__(
        self,
        cfg: Union[str, ConfigNode, None] = None,
        auto_resume: bool = True,
        is_test: bool = False,
    ):
        if cfg is None:
            cfg = get_default_cfg()
        elif isinstance(cfg, str):
            cfg = load_cfg(cfg)
        self.cfg = cfg
        self.is_test = is_test

        # Counters (1-based, reference base_engine.py:35-42).
        self.epochs = 1
        self.global_iters = 1
        # Steps of the current epoch already trained before a mid-epoch
        # (CKPT_PERIOD_STEPS) resume; consumed by train_one_epoch.
        self._resume_step_in_epoch = 0
        self.target_epochs = cfg.SOLVER.OPTIM.NUM_EPOCHS
        self.log_period = cfg.PERIOD.LOG_PERIOD
        self.val_period = cfg.PERIOD.EVAL_PERIOD
        self.ckpt_period_steps = cfg.PERIOD.get("CKPT_PERIOD_STEPS", 0)
        self.entire_losses: List[float] = []
        self.epoch_times: List[float] = []

        # Multi-host (DCN): join the jax.distributed cluster before any
        # device use so jax.devices() is the GLOBAL device list (parallel/
        # distributed.py; env contract JAX_COORDINATOR_ADDRESS/
        # JAX_NUM_PROCESSES/JAX_PROCESS_ID, autodetected on real pods).
        self.process_id = 0
        if cfg.TPU.get("MULTIHOST", False):
            from ..parallel.distributed import initialize_multihost

            self.process_id = initialize_multihost()

        # Mesh over the data axis (single device degenerates gracefully),
        # optionally x a spatial axis that splits image height
        # (TPU.SPATIAL_SHARDS; parallel/mesh.py). Clamp the data axis to
        # the largest count dividing the batch size so it shards evenly.
        n_dev = cfg.TPU.NUM_DEVICES
        available = (len(jax.devices()) if n_dev in (-1, 0, None) else n_dev)
        spatial = max(1, int(cfg.TPU.get("SPATIAL_SHARDS", 1)))
        if spatial > 1:
            # H-sharding is only numerically exact within the measured
            # halo-exchange envelope (parallel/mesh.py); it needs the
            # static canvas to validate against.
            pad_hw_cfg = cfg.TPU.get("PAD_HW")
            if not pad_hw_cfg:
                raise ValueError(
                    "TPU.SPATIAL_SHARDS > 1 requires a static TPU.PAD_HW "
                    "canvas (spatial sharding splits the canvas height)"
                )
            from ..parallel import validate_spatial_shards

            validate_spatial_shards(int(pad_hw_cfg[0]), spatial)
        batch = cfg.DATA.BATCH_SIZE
        data_shards = max(1, available // spatial)
        while data_shards > 1 and batch % data_shards != 0:
            data_shards -= 1
        self.mesh = make_mesh(data_shards * spatial, spatial=spatial)
        self.num_devices = self.mesh.devices.size
        self.num_data_shards = data_shards

        # Data.
        self.train_dataset = self.train_loader = None
        if not is_test:
            self.train_dataset, self.train_loader = self._build_loader(True)
        self.test_dataset, self.test_loader = self._build_loader(False)

        # Model / solver / state.
        dtype = (
            jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else None
        )
        self.model, variables = create_detector_state(
            jax.random.PRNGKey(max(cfg.SEED, 0)),
            num_layers=cfg.MODEL.BACKBONE.NUM_LAYERS,
            num_classes=cfg.MODEL.HEAD.NUM_CLASSES,
            image_hw=(64, 96),  # init-only shape; model is shape-agnostic
            dtype=dtype,
        )
        pretrained = cfg.MODEL.BACKBONE.get("PRETRAINED_PATH", "")
        if (not is_test and cfg.MODEL.BACKBONE.IMAGENET_PRETRAINED
                and pretrained):
            from ..utils.torch_convert import load_imagenet_backbone

            bb = load_imagenet_backbone(pretrained)
            variables["params"]["backbone"] = bb["params"]["backbone"]
            variables["batch_stats"]["backbone"] = (
                bb["batch_stats"]["backbone"]
            )
            tprint(f"ImageNet backbone loaded from '{pretrained}'.")
        if not is_test:
            # Gradient accumulation (TPU.GRAD_ACCUM_STEPS > 1): every
            # optimizer step consumes that many loader batches, so the
            # one-cycle schedules run over optimizer steps, not batches.
            self.grad_accum = max(1, int(cfg.TPU.get("GRAD_ACCUM_STEPS", 1)))
            loader_steps = len(self.train_loader) * self.target_epochs
            self.optimizer = build_optimizer(
                lr=cfg.SOLVER.OPTIM.LR,
                weight_decay=cfg.SOLVER.OPTIM.WEIGHT_DECAY,
                total_steps=max(1, loader_steps // self.grad_accum),
                use_scheduler=cfg.SOLVER.SCHEDULER.ENABLE,
                clip_grad_norm=(cfg.SOLVER.CLIP_GRAD.MAX_NORM
                                if cfg.SOLVER.CLIP_GRAD.ENABLE else None),
                grad_accum=self.grad_accum,
            )
            self.state = create_train_state(variables, self.optimizer)
            self.state = replicate_state(self.state, self.mesh)
            # Donate the state: optimizer/batch-stat buffers update in
            # place, halving peak HBM for the step.
            from ..ops.targets import resolve_pallas_targets

            use_pallas = resolve_pallas_targets(
                cfg.TPU.get("PALLAS_TARGETS", "auto")
            )
            if use_pallas:
                tprint("Target generation: Pallas splat kernel enabled.")
            self._train_step = jax.jit(
                make_train_step(self.model, self.optimizer,
                                use_pallas=use_pallas),
                donate_argnums=0,
            )
        else:
            self.optimizer = None
            self.state = TrainState(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
                opt_state=None,
                step=jnp.zeros((), jnp.int32),
            )

        self._eval_fn = jax.jit(self._eval_forward)

        # Output dirs + auto-resume (reference base_engine.py:57-78).
        self.root = cfg.OUTPUT_DIR or "./outputs"
        self.writer_dir = os.path.join(self.root, "tf_logs")
        self.weight_dir = os.path.join(self.root, "checkpoints")
        self.writer = None
        if not is_test:
            resumed = None
            if auto_resume:
                resumed = latest_checkpoint(self.weight_dir)
            if resumed:
                self.load_checkpoint(resumed)
                tprint(f"Existing checkpoint '{resumed}' is found and loaded "
                       "automatically.")
            os.makedirs(self.writer_dir, exist_ok=True)
            os.makedirs(self.weight_dir, exist_ok=True)
            self.writer = MetricsWriter(self.writer_dir)

    # ------------------------------------------------------------------
    def _build_loader(self, is_train: bool):
        from ..data.transforms import (
            default_test_transforms,
            default_train_transforms,
        )

        cfg = self.cfg
        split = cfg.DATA.TRAIN_SPLIT if is_train else cfg.DATA.TEST_SPLIT
        # uint8 transport defers normalization to the jitted programs
        # (ops/image_norm.py): 4x fewer bytes over the host->device link.
        dev_norm = cfg.TPU.get("IMAGE_TRANSPORT", "uint8") == "uint8"
        if is_train and split == "train":
            transforms = (
                default_train_transforms(
                    tuple(cfg.DATA.get("CROP_HW", (320, 960))),
                    device_normalize=dev_norm,
                )
                if cfg.DATA.get("AUGMENT", True)
                # DATA.AUGMENT False: normalize/pad only
                else default_test_transforms(device_normalize=dev_norm)
            )
        else:
            transforms = default_test_transforms(device_normalize=dev_norm)
        dataset = MonoConDataset(
            base_root=cfg.DATA.ROOT,
            split=split,
            max_objs=cfg.MODEL.HEAD.MAX_OBJS,
            transforms=transforms,
            filter_configs={
                k.lower(): v for k, v in cfg.DATA.FILTER.items()
            },
            image_cache=cfg.DATA.get("IMAGE_CACHE", ""),
        )
        pad_hw = cfg.TPU.get("PAD_HW")
        loader = DataLoader(
            dataset,
            batch_size=cfg.DATA.BATCH_SIZE,
            shuffle=is_train,
            num_workers=cfg.DATA.NUM_WORKERS,
            drop_last=False,
            pad_hw=tuple(pad_hw) if pad_hw else None,
            seed=max(cfg.SEED, 0),
            prefetch_batches=cfg.TPU.PREFETCH_BATCHES,
            # Device placement happens on the loader's prefetch thread so
            # H2D transfers overlap the previous step's compute.
            device_put_fn=(self._device_batch if is_train
                           else self._device_eval_batch),
            # Static batch shapes: remainder batches are padded with
            # repeated samples (masked out of the loss / eval results), so
            # the train and eval programs each compile exactly once.
            pad_to_batch=True,
        )
        return dataset, loader

    def _eval_forward(self, variables, image, p2, img_hw=None):
        # uint8 transport -> f32 in-jit; img_hw zeroes the padded border
        # so it matches the float32 transport's post-Normalize 0.0.
        image = normalize_if_raw(image, img_hw)
        pad_hw = (image.shape[1], image.shape[2])
        pred = self.model.apply(variables, image, train=False)
        return decode_predictions(pred, p2, pad_hw)

    # ------------------------------------------------------------------
    @property
    def current_lr(self) -> float:
        """LR of the upcoming step (reference base_engine.py lr property).

        The optimizer chain ends in inject_hyperparams(adamw) (see
        solver/schedule.py), whose state carries the materialized schedule
        values; peek_hyperparams unwraps the MultiSteps layer when
        gradient accumulation is on."""
        if self.optimizer is None or self.state.opt_state is None:
            return float(self.cfg.SOLVER.OPTIM.LR)
        from ..solver import peek_hyperparams

        hp = peek_hyperparams(self.state.opt_state)
        if hp is None or "learning_rate" not in hp:
            return float(self.cfg.SOLVER.OPTIM.LR)
        return float(hp["learning_rate"])

    def _device_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Place the train tensors of a host batch on device (idempotent:
        already-placed batches pass through)."""
        img = batch["img"]
        if isinstance(img, jax.Array):
            return batch
        img_hw = batch.get("img_hw")
        if img_hw is None:  # ad-hoc batch: full extent, mask is a no-op
            img_hw = np.tile(np.int32(img.shape[1:3]), (img.shape[0], 1))
        dev = {
            "img": jnp.asarray(img),
            "img_hw": jnp.asarray(img_hw),
            "label": {k: jnp.asarray(v) for k, v in batch["label"].items()},
        }
        if "valid" in batch:
            dev["valid"] = jnp.asarray(batch["valid"])
        # pad_to_batch keeps shapes static; the guard covers ad-hoc batches.
        if img.shape[0] % self.num_data_shards == 0:
            dev = shard_batch(dev, self.mesh)
        # keep host-side fields for logging/debugging consumers
        out = dict(batch)
        out.update(dev)
        return out

    def _device_eval_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Place the eval tensors (img, p2) on device from the loader's
        prefetch thread so H2D transfers overlap the previous batch's
        forward; host-side fields (calib, img_metas) stay put."""
        img = batch["img"]
        if isinstance(img, jax.Array):
            return batch
        # Ad-hoc batches without collate's img_hw get the full canvas
        # extent (mask becomes a no-op).
        img_hw = batch.get("img_hw")
        if img_hw is None:
            img_hw = np.tile(np.int32(img.shape[1:3]), (img.shape[0], 1))
        dev = {"img": jnp.asarray(img), "p2": jnp.asarray(batch["p2"]),
               "img_hw": jnp.asarray(img_hw)}
        if (img.shape[0] % self.num_data_shards == 0
                and self.num_devices > 1):
            dev = shard_batch(dev, self.mesh)
        out = dict(batch)
        out.update(dev)
        return out

    def _materialize_losses(self) -> None:
        """Convert any still-async device scalars in ``entire_losses`` to
        host floats with ONE stacked transfer (a per-scalar ``float()``
        loop forces one device->host round trip each — ~2 s apiece
        through the axon tunnel, see CLAUDE.md)."""
        dev_idx = [i for i, v in enumerate(self.entire_losses)
                   if not isinstance(v, float)]
        if not dev_idx:
            return
        vals = np.asarray(jnp.stack([self.entire_losses[i]
                                     for i in dev_idx]))
        for i, x in zip(dev_idx, vals):
            self.entire_losses[i] = float(x)

    def train_one_epoch(self) -> float:
        self.train_loader.set_epoch(self.epochs)
        steps = len(self.train_loader)
        # Mid-epoch resume (CKPT_PERIOD_STEPS): replay the loader's
        # deterministic per-epoch order and skip the already-trained
        # prefix, so the interrupted epoch continues where it stopped
        # instead of being silently abandoned.
        skip_steps = self._resume_step_in_epoch
        self._resume_step_in_epoch = 0
        # The restored per-step history already contains the resumed
        # epoch's prefix (persisted in meta.json): start this epoch's
        # average slice before it, so the printed '- Average Loss' covers
        # the WHOLE epoch and matches an uninterrupted run.
        epoch_start = max(len(self.entire_losses) - skip_steps, 0)
        if skip_steps >= steps:
            # The resume checkpoint landed exactly on the epoch's last
            # step: nothing left to train — return the restored epoch's
            # mean instead of iterating/decoding/augmenting every batch
            # just to skip it (a full epoch of host time on a 1-core
            # host).
            epoch_losses = self.entire_losses[epoch_start:]
            return (float(np.mean(epoch_losses)) if epoch_losses
                    else float("nan"))
        for batch_idx, batch in enumerate(self.train_loader):
            if batch_idx < skip_steps:
                continue
            dev = self._device_batch(batch)
            step_in = {"img": dev["img"], "img_hw": dev["img_hw"],
                       "label": dev["label"]}
            # Pass the validity mask only when the batch actually has
            # padded rows: full batches take the plain program (the
            # masked-BN variant measures ~3% slower), remainder batches
            # the masked one — at most two compiles per run, and zero
            # when the dataset divides the batch size (KITTI 3712 does).
            # (shape[0] — never np.asarray: the prefetch thread already
            # placed "valid" on device, and materializing it would force
            # a device->host round trip EVERY step.)
            if "valid" in dev and batch.get("num_valid", 0) < int(
                    dev["valid"].shape[0]):
                step_in["valid"] = dev["valid"]
            with self.mesh:
                self.state, losses = self._train_step(self.state, step_in)

            # Per-step history, as the reference keeps
            # (monocon_engine.py:84-90) — appended as the *device* scalar
            # (an async future), so the dispatch queue never stalls; it is
            # materialized lazily on log steps / at epoch end.
            self.entire_losses.append(losses["total_loss"])

            if self.global_iters % self.log_period == 0:
                # Two stacked transfers per log step (loss dict + pending
                # history), not one fetch per scalar.
                names = sorted(losses)
                vals = np.asarray(jnp.stack([losses[k] for k in names]))
                loss_host = dict(zip(names, (float(v) for v in vals)))
                total = loss_host.pop("total_loss")
                self._materialize_losses()
                recent = self.entire_losses[-100:]
                bar = progress_bar(batch_idx + 1, steps)
                print(
                    f"| Progress {bar} | LR {self.current_lr:.6f} "
                    f"| Loss {total:8.4f} "
                    f"({sum(recent) / len(recent):8.4f}) |",
                    flush=True,
                )
                if self.writer is not None:
                    self.writer.add_scalars(
                        loss_host, tag="loss", step=self.global_iters
                    )
            if (self.ckpt_period_steps > 0
                    and self.global_iters % self.ckpt_period_steps == 0):
                self.save_checkpoint(step_in_epoch=batch_idx + 1)
            self.global_iters += 1

        # keep history as host floats once the epoch is done
        self._materialize_losses()
        epoch_losses = self.entire_losses[epoch_start:]
        return float(np.mean(epoch_losses)) if epoch_losses else float("nan")

    def _print_engine_info(self) -> None:
        """Engine banner (reference base_engine.py:253-269)."""
        from ..utils.logging_utils import count_params

        print("=" * 70)
        print(f" MonoCon-TPU Engine | {self.cfg.VERSION}")
        print(f" - Description : {self.cfg.DESCRIPTION}")
        mesh_desc = (f" [mesh {dict(self.mesh.shape)}]"
                     if len(self.mesh.axis_names) > 1 else "")
        print(f" - Devices     : {self.num_devices} x "
              f"{jax.devices()[0].platform.upper()} "
              f"({jax.devices()[0].device_kind}){mesh_desc}")
        print(f" - Model       : DLA-{self.cfg.MODEL.BACKBONE.NUM_LAYERS}, "
              f"{count_params(self.state.params) / 1e6:.2f}M params")
        if self.train_dataset is not None:
            print(f" - Train Data  : {len(self.train_dataset)} samples "
                  f"({self.cfg.DATA.TRAIN_SPLIT})")
        print(f" - Test Data   : {len(self.test_dataset)} samples "
              f"({self.cfg.DATA.TEST_SPLIT})")
        print(f" - Batch/Seed  : {self.cfg.DATA.BATCH_SIZE} / {self.cfg.SEED}")
        print("=" * 70)

    def train(self, resume_from: Optional[str] = None) -> None:
        assert self.epochs <= self.target_epochs
        self._print_engine_info()
        export_cfg(self.cfg, os.path.join(self.root, "config.yaml"))
        if resume_from is not None:
            self.load_checkpoint(resume_from)
            tprint(f"Training resumes from '{resume_from}'. "
                   f"(Start Epoch: {self.epochs})")

        tprint(f"Training proceeds from epoch {self.epochs} to "
               f"epoch {self.target_epochs}.")
        tprint(f"Result files are saved to '{self.root}'.")
        for _ in range(self.epochs, self.target_epochs + 1):
            print(f" Epoch {self.epochs:3d} / {self.target_epochs:3d} "
                  .center(90, "="))
            t0 = time.time()
            avg_loss = self.train_one_epoch()
            elapsed = time.time() - t0
            self.epoch_times.append(elapsed)

            remaining = (self.target_epochs - self.epochs) * float(
                np.mean(self.epoch_times)
            )
            print(f"\n- Average Loss: {avg_loss:.3f}")
            print(f"- Epoch Time: {elapsed:.1f}s | ETA {remaining / 3600:.2f}h")

            if (self.val_period > 0) and (self.epochs % self.val_period == 0):
                eval_dict = self.evaluate()
                if self.writer is not None:
                    self.writer.add_scalars(
                        eval_dict, tag="eval", step=self.epochs
                    )
                self.save_checkpoint()
            self.epochs += 1
        self.epochs = self.target_epochs
        self.save_checkpoint(final=True)

    # ------------------------------------------------------------------
    def evaluate(self, verbose: bool = True) -> Dict[str, float]:
        """Collect detections over the test split and run KITTI AP.

        Software-pipelined: batch i+1's forward is dispatched (async)
        before batch i's device->host transfer + KITTI conversion, so the
        chip never waits on the host.
        """
        container: Dict[str, List] = {"img_bbox": [], "img_bbox2d": []}
        pending = None  # (decoded_device, batch)
        for batch in self.test_loader:
            decoded = self._dispatch_eval(batch)
            if pending is not None:
                self._collect_eval(*pending, container)
            pending = (decoded, batch)
        if pending is not None:
            self._collect_eval(*pending, container)
        return self.test_dataset.evaluate(
            container,
            eval_classes=("Pedestrian", "Cyclist", "Car"),
            verbose=verbose,
        )

    def _dispatch_eval(self, batch: Dict[str, Any]):
        variables = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }
        # The loader's prefetch thread normally placed these already
        # (_device_eval_batch); this covers ad-hoc host batches.
        if not isinstance(batch["img"], jax.Array):
            batch = self._device_eval_batch(batch)
        with self.mesh:
            return self._eval_fn(
                variables, batch["img"], batch["p2"], batch["img_hw"]
            )

    def _finalize_eval(self, decoded, batch, vis_format: bool = False):
        """Fetch a dispatched eval batch's decoded arrays and convert to
        KITTI (or vis) format. One amortized transfer for all leaves
        (``jax.device_get`` starts every copy async before blocking —
        a per-key ``np.asarray`` loop pays one round trip per array)."""
        decoded = jax.device_get(decoded)
        per_image = split_batch_detections(decoded, TEST_SCORE_THRESHOLD)
        # Drop padded remainder rows (pad_to_batch).
        per_image = per_image[:batch.get("num_valid", len(per_image))]
        if vis_format:
            return to_vis_format(per_image)
        return {
            "img_bbox": convert_to_kitti_3d(
                per_image, batch["img_metas"], batch["calib"]
            ),
            "img_bbox2d": convert_to_kitti_2d(per_image, batch["img_metas"]),
        }

    def _collect_eval(self, decoded, batch, container) -> None:
        result = self._finalize_eval(decoded, batch)
        container["img_bbox"].extend(result["img_bbox"])
        container["img_bbox2d"].extend(result["img_bbox2d"])

    def _run_eval_batch(self, batch: Dict[str, Any],
                        vis_format: bool = False):
        return self._finalize_eval(self._dispatch_eval(batch), batch,
                                   vis_format=vis_format)

    def visualize(self, output_dir: str,
                  draw_items: List[str] = ("2d", "3d", "bev")) -> None:
        from ..utils.visualizer import Visualizer

        vis_container: List[Dict] = []
        scale_hw = None
        for batch in self.test_loader:
            if scale_hw is None and batch["img_metas"].get("scale_hw"):
                scale_hw = batch["img_metas"]["scale_hw"][0]
            vis_container.extend(self._run_eval_batch(batch, vis_format=True))

        visualizer = Visualizer(self.test_dataset, vis_container,
                                scale_hw=scale_hw)
        fn_map = {"2d": visualizer.plot_bboxes_2d,
                  "3d": visualizer.plot_bboxes_3d,
                  "bev": visualizer.plot_bev}
        for item in draw_items:
            save_dir = os.path.join(output_dir, item)
            os.makedirs(save_dir, exist_ok=True)
            for idx in range(len(self.test_dataset)):
                name = os.path.basename(self.test_dataset.image_path(idx))
                fn_map[item](idx, save_path=os.path.join(save_dir, name))

    # ------------------------------------------------------------------
    def save_checkpoint(self, final: bool = False,
                        step_in_epoch: int = 0) -> str:
        # Materialize any still-async device loss scalars so the history
        # persists as host floats (reference base_engine.py:155-189 pickles
        # entire_losses/epoch_times; we keep them in meta.json so the
        # 100-step moving average and ETA survive preemption).
        self._materialize_losses()
        # Mid-epoch (CKPT_PERIOD_STEPS) saves record how many steps of the
        # in-progress epoch completed so resume can continue it; the saved
        # global_iters is advanced past the just-finished step (the loop
        # increments after saving).
        path = save_checkpoint(
            self.weight_dir, self.state, self.epochs,
            self.global_iters + (1 if step_in_epoch else 0),
            final=final,
            extra={"entire_losses": self.entire_losses,
                   "epoch_times": list(self.epoch_times),
                   "step_in_epoch": int(step_in_epoch),
                   # The run's data seed: the loader's per-epoch shuffle
                   # and per-sample augmentation RNG all derive from it
                   # (data/loader.py:162-174), so a resuming process must
                   # reuse it or it replays a DIFFERENT stream — which
                   # silently breaks the mid-epoch prefix skip above and
                   # changes every remaining epoch's order. train.py
                   # randomizes SEED=-1 per process (reference
                   # train.py:31-36 does too), so this cannot be left to
                   # the config.
                   "seed": max(int(self.cfg.SEED), 0)},
        )
        tprint(f"Checkpoint saved to '{path}'.")
        return path

    def load_checkpoint(self, path: str) -> None:
        if path.endswith(".pth") or path.endswith(".pt") or self.is_test:
            variables = load_weights_auto(
                path,
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats},
            )
            # Replicate onto the mesh: without this the params stay host
            # numpy and every jitted eval call re-uploads all of them.
            self.state = replicate_state(TrainState(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
                opt_state=self.state.opt_state,
                step=self.state.step,
            ), self.mesh)
            return
        self.state, meta = load_checkpoint(path, self.state)
        self.state = replicate_state(self.state, self.mesh)
        # Adopt the interrupted run's data seed: the loaders were built
        # with this process's cfg.SEED, but the shuffle/augmentation
        # stream belongs to the run being resumed (train.py randomizes
        # SEED=-1 per process, so a resumed process almost always starts
        # with a different one).
        saved_seed = meta.get("seed")
        if saved_seed is not None and int(saved_seed) != max(
                int(self.cfg.SEED), 0):
            tprint(f"Resuming with the checkpoint's data seed {saved_seed} "
                   f"(this process started with SEED={self.cfg.SEED}; the "
                   "shuffle/augmentation stream follows the original run).")
            self.cfg.SEED = int(saved_seed)
            for loader in (self.train_loader, self.test_loader):
                if loader is not None:
                    loader.seed = int(saved_seed)
        step_in_epoch = int(meta.get("step_in_epoch", 0))
        if step_in_epoch > 0:
            # The checkpoint was taken mid-epoch: re-enter the SAME epoch
            # and skip its already-trained prefix (the loader's per-epoch
            # shuffle is deterministic, so the replay is exact).
            self.epochs = int(meta.get("epoch", 0))
            self._resume_step_in_epoch = step_in_epoch
        else:
            self.epochs = int(meta.get("epoch", 0)) + 1
        self.global_iters = int(meta.get("global_iters", 1))
        # Restore loss/time history (reference base_engine.py:191-219) so
        # the moving-average display and ETA continue across resume.
        self.entire_losses = [float(v) for v in meta.get("entire_losses", [])]
        self.epoch_times = [float(v) for v in meta.get("epoch_times", [])]
