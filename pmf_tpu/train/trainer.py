"""Generic experiment trainer.

Replaces the four near-duplicate per-task Trainer classes
(tasks/pmf/trainer.py, tasks/epmf/trainer.py, tasks/salsanext/trainer.py,
tasks/sensat_urban/pmf/trainer.py) with one engine, parameterized by
`Options.net_type` and `Options.dataset`.

Responsibilities (parity with tasks/pmf/trainer.py + main.py):
  * datasets + loaders with per-process sharding and per-epoch shuffles;
  * class-frequency focal alpha (trainer.py:194-199);
  * hybrid AdamW/SGD optimizer + per-iteration WarmupCosine schedule;
  * jitted fused train/eval steps over the device mesh (global-batch =
    DDP + SyncBN + distributed metrics in one program);
  * epoch loop with IoU/Acc/Recall accumulation, per-iter logging with
    data-time/process-time split and ETA, scalar stream, checkpointing
    and best-metric snapshots.
"""
from __future__ import annotations

import datetime
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Options
from ..data import (
    PVConfig, RangeConfig, SemanticKitti, Nuscenes, build_batch,
    build_range_batch, HostLoader, kitti_sample_reader,
    nuscenes_sample_reader,
)
from ..data.perspective_pipeline_v2 import V2Config, build_v2_batch
from ..data.sensat_urban import (SensatConfig, SensatUrban,
                                 build_sensat_batch, sensat_frame_weights)
from ..data.loader import sensat_sample_reader
from ..data.augment import AugmentConfig
from ..data.loader import range_sample_reader
from ..metrics import IOUEval
from ..models import EPMFNet, PMFNet, SalsaNext
from ..parallel import make_mesh, shard_batch
from ..utils import AverageMeter, RemainTime
from .checkpoint import CheckpointManager
from .optim import adamw, hybrid_pmf_optimizer
from .recorder import Recorder
from .schedules import warmup_cosine_lr
from .state import TrainState
from .steps import (
    LossConfig, make_pmf_eval_step, make_pmf_train_step,
    make_salsanext_eval_step, make_salsanext_train_step,
)


def kitti_focal_alpha(cls_freq: np.ndarray, learning_ignore: dict) -> np.ndarray:
    """alpha = log(1 + 1/(freq+1e-3)) / max, ignored classes 0.

    Parity: tasks/pmf/trainer.py:108-114,194-199.
    """
    w = 1.0 / (cls_freq + 1e-3)
    for cl in range(len(w)):
        if learning_ignore.get(cl, False):
            w[cl] = 0.0
    alpha = np.log(1 + w)
    alpha = alpha / alpha.max()
    alpha[0] = 0.0
    return alpha.astype(np.float32)


def config_focal_alpha(cls_freq) -> np.ndarray:
    """alpha from a config-provided raw count list (tasks/epmf/
    trainer.py:123-125,249-251): normalize, zero class 0, log-weight."""
    f = np.asarray(cls_freq, dtype=np.float64)
    f = f / f.sum()
    f[0] = 0
    w = 1.0 / (f + 1e-8)
    alpha = np.log(1 + w)
    alpha = alpha / alpha.max()
    alpha[0] = 0.0
    return alpha.astype(np.float32)


class Trainer:
    def __init__(self, opts: Options, recorder: Recorder | None = None):
        self.opts = opts
        self.recorder = recorder
        self.remain_time = RemainTime(opts.n_epochs)
        self.mesh = make_mesh(opts.mesh_data, opts.mesh_model)

        self._init_data()
        self._init_model()
        self._init_steps()
        self.metrics = IOUEval(opts.nclasses, ignore=self.ignore_class)
        self.metrics_img = IOUEval(opts.nclasses, ignore=self.ignore_class)
        self.ckpt = CheckpointManager(
            recorder.checkpoint_dir if recorder else
            f"{opts.run_dir}/checkpoint")
        self._key = jax.random.PRNGKey(opts.seed)

    # ------------------------------------------------------------ data
    def _init_data(self):
        opts = self.opts
        sensor = opts.group("sensor")
        aug_group = opts.group("augmentation")
        aug = AugmentConfig.from_dict(aug_group)
        # train-time RGB ColorJitter — on by default like the reference
        # (img_aug=True, tasks/pmf/trainer.py:142, epmf/trainer.py:198);
        # set `augmentation.img_jitter: null` to disable
        jitter = aug_group.get("img_jitter", (0.4, 0.4, 0.4))
        self.img_jitter = tuple(jitter) if jitter else None
        self.is_fusion = opts.net_type in ("PMFNet", "EPMFNet")

        if opts.dataset == "SemanticKitti":
            trainset = SemanticKitti(opts.data_root, [0, 1, 2, 3, 4, 5, 6, 7, 9, 10])
            valset = SemanticKitti(opts.data_root, [8])
            if opts.config.get("cls_freq"):
                self.alpha = config_focal_alpha(opts.config["cls_freq"])
            else:
                self.alpha = kitti_focal_alpha(
                    trainset.cls_freq, trainset.data_config["learning_ignore"])
            self.ignore_class = [cl for cl, a in enumerate(self.alpha) if a == 0]
            self.mapped_cls_name = trainset.mapped_cls_name
        elif opts.dataset == "SensatUrban":
            trainset = SensatUrban(opts.data_root, "train")
            # hand-tuned rare-class boosts (sensat trainer.py:175-181)
            self.alpha = np.ones((opts.nclasses,), np.float32)
            self.alpha[0] = 0.0
            for cl, a in [(4, 2.0), (5, 2.5), (7, 3.0), (12, 10.0), (13, 2.5)]:
                if cl < opts.nclasses:
                    self.alpha[cl] = a
            self.ignore_class = [0]
            self.mapped_cls_name = {k + 1: v for k, v in
                                    trainset.mapped_cls_name.items() if k >= 0}
            self.mapped_cls_name[0] = "ignore"
        elif opts.dataset == "nuScenes":
            version = opts.config.get("nusc_version", "v1.0-trainval")
            if opts.is_debug:
                # debug runs use the mini DB (tasks/epmf/trainer.py:153-156)
                version = "v1.0-mini"
            splits_file = opts.config.get("nusc_splits_file")
            trainset = Nuscenes(opts.data_root, version=version, split="train",
                                splits_file=splits_file)
            valset = Nuscenes(opts.data_root, version=version, split="val",
                              splits_file=splits_file)
            # nuScenes: uniform alpha, ignore class 0 (trainer.py:132-134,198)
            self.alpha = np.ones((opts.nclasses,), np.float32)
            self.alpha[0] = 0.0
            self.ignore_class = [0]
            self.mapped_cls_name = trainset.mapped_cls_name
        elif opts.dataset in ("a2d2", "A2D2"):
            import os

            from ..data.a2d2 import A2D2_PV

            cams = opts.config.get(
                "cams_lidars_json", os.path.join(opts.data_root,
                                                 "cams_lidars.json"))
            cidx = opts.config.get(
                "class_index_json", os.path.join(opts.data_root,
                                                 "class_index.json"))
            excl = bool(opts.config.get("apply_excludes", True))
            trainset = A2D2_PV(opts.data_root, cams, cidx, split="train",
                               apply_excludes=excl)
            valset = A2D2_PV(opts.data_root, cams, cidx, split="valid",
                             apply_excludes=excl)
            if len(valset) == 0:
                # tiny debug fixtures fall below the fixed 22407-file
                # split boundary (dataset_a2d2.py split slices)
                valset = trainset
            # alpha from config cls_freq (tasks/epmf/trainer.py:123-125,
            # 171-190: a2d2 uses the yaml count table)
            self.alpha = config_focal_alpha(opts.config["cls_freq"])
            self.ignore_class = [0]
            self.mapped_cls_name = trainset.mapped_cls_name
        else:
            raise ValueError(f"dataset not wired into Trainer yet: {opts.dataset}")

        self.use_v2 = opts.net_type == "EPMFNet"
        self.use_pix = opts.dataset in ("a2d2", "A2D2")
        self.is_sensat = opts.dataset == "SensatUrban"
        if self.is_sensat:
            self.sensat_cfg = SensatConfig(
                img_h=int(sensor.get("proj_ht", 320)),
                img_w=int(sensor.get("proj_wt", 320)))
            self.sensat_eval_cfg = SensatConfig(
                img_h=int(sensor.get("proj_h", 320)),
                img_w=int(sensor.get("proj_w", 320)))
            valset = SensatUrban(opts.data_root, "val",
                                 img_h=self.sensat_eval_cfg.img_h,
                                 img_w=self.sensat_eval_cfg.img_w,
                                 use_crop=True)
            weights = sensat_frame_weights(
                trainset, int(sensor.get("n_samples_split", 200)))
            train_reader = sensat_sample_reader(trainset, self.sensat_cfg,
                                                weights, train=True)
            val_reader = sensat_sample_reader(valset, self.sensat_eval_cfg,
                                              train=False)
            self._sensat_train_len = len(weights)
        elif self.use_v2:
            pv = opts.group("PVconfig") or sensor
            # A2D2 front-center camera frames are 1208x1920
            ch, cw = (1208, 1920) if self.use_pix else (900, 1600)
            self.v2_cfg = V2Config(
                canvas_h=int(pv.get("canvas_h", ch)),
                canvas_w=int(pv.get("canvas_w", cw)),
                proj_h=int(pv.get("proj_h", 320)),
                proj_w=int(pv.get("proj_w", 1280)),
                proj_ht=int(pv.get("proj_ht", 320)),
                proj_wt=int(pv.get("proj_wt", 1280)),
                n_points=int(pv.get("n_points", 131072)),
                img_mean=tuple(pv.get("pcd_mean", V2Config.img_mean)),
                img_stds=tuple(pv.get("pcd_stds", V2Config.img_stds)),
                pcd_aug=bool(pv.get("pcd_aug", False)),
                img_jitter=self.img_jitter,
                augment=aug)
            if self.use_pix:
                from ..data.loader import a2d2_sample_reader

                train_reader = a2d2_sample_reader(trainset, self.v2_cfg)
                val_reader = a2d2_sample_reader(valset, self.v2_cfg)
            elif opts.dataset == "SemanticKitti":
                train_reader = kitti_sample_reader(trainset, self.v2_cfg)
                val_reader = kitti_sample_reader(valset, self.v2_cfg)
            else:
                train_reader = nuscenes_sample_reader(trainset, self.v2_cfg)
                val_reader = nuscenes_sample_reader(valset, self.v2_cfg)
        elif self.is_fusion:
            self.pv_cfg = PVConfig(
                canvas_h=int(sensor.get("canvas_h", 384)),
                canvas_w=int(sensor.get("canvas_w", 1248)),
                proj_h=int(sensor.get("proj_h", 384)),
                proj_w=int(sensor.get("proj_w", 1232)),
                proj_ht=int(sensor.get("proj_ht", 256)),
                proj_wt=int(sensor.get("proj_wt", 1024)),
                h_pad=int(sensor.get("h_pad", 7)),
                w_pad=int(sensor.get("w_pad", 3)),
                n_points=int(sensor.get("n_points", 131072)),
                img_mean=tuple(sensor.get("img_mean", PVConfig.img_mean)),
                img_stds=tuple(sensor.get("img_stds", PVConfig.img_stds)),
                pcd_aug=bool(sensor.get("pcd_aug", False)),
                projection="cam" if opts.dataset == "nuScenes" else "kitti",
                img_jitter=self.img_jitter,
                augment=aug)
            if opts.dataset == "SemanticKitti":
                train_reader = kitti_sample_reader(trainset, self.pv_cfg)
                val_reader = kitti_sample_reader(valset, self.pv_cfg)
            else:
                train_reader = nuscenes_sample_reader(trainset, self.pv_cfg)
                val_reader = nuscenes_sample_reader(valset, self.pv_cfg)
        else:
            self.range_cfg = RangeConfig(
                proj_h=int(sensor.get("proj_h", 64)),
                proj_w=int(sensor.get("proj_w", 2048)),
                fov_up=float(sensor.get("fov_up", 3.0)),
                fov_down=float(sensor.get("fov_down", -25.0)),
                fov_left=float(sensor.get("fov_left", -180.0)),
                fov_right=float(sensor.get("fov_right", 180.0)),
                n_points=int(sensor.get("n_points", 131072)),
                img_mean=tuple(sensor.get("img_mean", RangeConfig.img_mean)),
                img_stds=tuple(sensor.get("img_stds", RangeConfig.img_stds)),
                augment=aug)
            train_reader = range_sample_reader(trainset, self.range_cfg)
            val_reader = range_sample_reader(valset, self.range_cfg)

        self._train_len = getattr(self, "_sensat_train_len", len(trainset))
        self._val_len = len(valset)
        pi, pc = jax.process_index(), jax.process_count()
        # batch_size in the config is PER-DEVICE (reference: per-GPU,
        # config_server_kitti.yaml:14); the global batch spans the mesh
        data_par = self.mesh.shape["data"]
        self.train_loader = HostLoader(
            train_reader, self._train_len, opts.batch_size[0] * data_par,
            shuffle=True,
            drop_last=True, seed=opts.seed, num_workers=opts.n_threads,
            process_index=pi, process_count=pc)
        self.val_loader = HostLoader(
            val_reader, self._val_len, opts.batch_size[1] * data_par,
            shuffle=False,
            drop_last=False, num_workers=opts.n_threads,
            process_index=pi, process_count=pc)

    # ----------------------------------------------------------- model
    def _init_model(self):
        opts = self.opts
        dtype = jnp.bfloat16 if opts.compute_dtype == "bfloat16" \
            else jnp.float32
        if opts.net_type == "PMFNet":
            self.model = PMFNet(nclasses=opts.nclasses,
                                base_channels=opts.base_channels,
                                image_backbone=opts.img_backbone,
                                dtype=dtype, use_packed=opts.use_packed)
        elif opts.net_type == "EPMFNet":
            self.model = EPMFNet(nclasses=opts.nclasses,
                                 base_channels=opts.base_channels,
                                 image_backbone=opts.img_backbone,
                                 dtype=dtype, use_packed=opts.use_packed)
        elif opts.net_type == "SalsaNext":
            self.model = SalsaNext(nclasses=opts.nclasses,
                                   base_channels=opts.base_channels,
                                   dtype=dtype)
        else:
            raise ValueError(f"invalid net_type: {opts.net_type}")

        if self.is_sensat:
            h, w = self.sensat_cfg.img_h, self.sensat_cfg.img_w
            example = (jnp.zeros((1, h, w, 5)), jnp.zeros((1, h, w, 3)))
        elif self.use_v2:
            h, w = self.v2_cfg.proj_ht, self.v2_cfg.proj_wt
            example = (jnp.zeros((1, h, w, 5)), jnp.zeros((1, h, w, 3)))
        elif self.is_fusion:
            h, w = self.pv_cfg.proj_ht, self.pv_cfg.proj_wt
            example = (jnp.zeros((1, h, w, 5)), jnp.zeros((1, h, w, 3)))
        else:
            h, w = self.range_cfg.proj_h, self.range_cfg.proj_w
            example = (jnp.zeros((1, h, w, 5)),)
        # one fused init compile (eager init triggers dozens of small
        # per-op compiles, very slow through the remote-compile path)
        variables = jax.jit(lambda k: self.model.init(
            {"params": k, "dropout": jax.random.PRNGKey(opts.seed + 1)},
            *example, train=False))(jax.random.PRNGKey(opts.seed))

        if opts.pretrained_weights and self.is_fusion:
            from ..models.torch_convert import load_pretrained_resnet_into

            variables = load_pretrained_resnet_into(
                variables, opts.pretrained_weights, opts.img_backbone,
                log=self.recorder.logger if self.recorder else None)

        steps_per_epoch = max(len(self.train_loader), 1)
        schedule = warmup_cosine_lr(
            opts.lr, opts.warmup_epochs * steps_per_epoch,
            (opts.n_epochs - opts.warmup_epochs) * steps_per_epoch)
        self.lr_schedule = schedule
        if self.is_fusion:
            self.tx = hybrid_pmf_optimizer(
                schedule, opts.momentum, opts.weight_decay,
                amsgrad=self.is_sensat)  # sensat trainer.py:84
        else:
            self.tx = adamw(schedule)
        params = dict(variables["params"])
        if self.is_fusion and opts.config.get("use_mtloss"):
            from ..losses import init_multi_task_params

            n_losses = 6 if self.is_fusion else 2
            params["mt_sigma"] = init_multi_task_params(n_losses)
        self.state = TrainState.create(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})}, self.tx)

    # ----------------------------------------------------------- steps
    def _init_steps(self):
        opts = self.opts
        # point_lovasz (default on): Lovász sorts run over the winner
        # points instead of all pixels (losses/lovasz.py) — strictly
        # faster once compiled. Config flag `point_lovasz: false` exists
        # because XLA:TPU currently fails to compile the EPMF train step
        # WITH the point-domain pair loss in any reasonable time (4×
        # >25 min attempts at bs4 320×1216, default and −0.7 effort,
        # 2026-08; the image-domain variant compiles in ~254 s and the
        # PMF train step with the same point machinery compiles in
        # ~505 s — the pathology is specific to that combination).
        self.point_lovasz = bool(opts.config.get("point_lovasz", True))
        self.loss_cfg = LossConfig(
            nclasses=opts.nclasses, alpha=tuple(float(a) for a in self.alpha),
            gamma_focal=2.0, lambda_=opts.lambda_, gamma=opts.gamma,
            tau=opts.tau, use_mtloss=bool(opts.config.get("use_mtloss")),
            use_dice=self.is_sensat)
        if self.is_fusion:
            self.train_step = make_pmf_train_step(
                self.model, self.tx, self.loss_cfg,
                remat=bool(opts.config.get("remat")))
            self.eval_step = make_pmf_eval_step(self.model, self.loss_cfg)

            @jax.jit
            def panel_forward(state, feature):
                params = {k: v for k, v in state.params.items()
                          if k != "mt_sigma"}
                return self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    feature[..., :5], feature[..., 5:8], train=False)

            self._panel_forward = panel_forward
        else:
            self.train_step = make_salsanext_train_step(self.model, self.tx,
                                                        self.loss_cfg)
            self.eval_step = make_salsanext_eval_step(self.model, self.loss_cfg)
        self._panel_batch = None

    # ------------------------------------------------------- preprocess
    def _device_batch(self, batch: dict, train: bool, key):
        """Host batch → sharded device arrays → fused preprocessing."""
        sharded = shard_batch(self.mesh, batch)
        if self.is_sensat:
            cfg = self.sensat_cfg if train else self.sensat_eval_cfg
            f, l = build_sensat_batch(key, sharded["feature_map"],
                                      sharded["label_map"], cfg, train)
        elif self.use_v2 and self.use_pix:
            from ..data.perspective_pipeline_v2 import build_v2_batch_pix

            f, m, l, points = build_v2_batch_pix(
                key, sharded["points"], sharded["labels"], sharded["valid"],
                sharded["rows"], sharded["cols"], sharded["image"],
                sharded["img_h"], sharded["img_w"], self.v2_cfg, train,
                return_points=True)
            return f, l, points
        elif self.use_v2:
            f, m, l, points = build_v2_batch(
                key, sharded["points"], sharded["labels"], sharded["valid"],
                sharded["proj_matrix"], sharded["image"], sharded["img_h"],
                sharded["img_w"], self.v2_cfg, train, return_points=True)
            return f, l, points
        elif self.is_fusion:
            # train mode also returns per-point winner info so the step
            # can run the point-domain Lovász (sort over winner points
            # instead of all pixels)
            f, m, l, points = build_batch(
                key, sharded["points"], sharded["labels"], sharded["valid"],
                sharded["proj_matrix"], sharded["image"], sharded["img_h"],
                sharded["img_w"], self.pv_cfg, train, return_points=True)
            return f, l, points
        else:
            f, l, m = build_range_batch(
                key, sharded["points"], sharded["labels"], sharded["valid"],
                self.range_cfg, train)
        return f, l, None

    # ------------------------------------------------------------- run
    def run(self, epoch: int, mode: str = "Train") -> dict:
        train = mode == "Train"
        loader = self.train_loader if train else self.val_loader
        if train:
            loader.set_epoch(epoch)
        self.metrics.reset()
        self.metrics_img.reset()
        loss_meter = AverageMeter()
        aux_meters: dict[str, AverageMeter] = {}
        total_iter = len(loader)
        pending: list = []
        last_loss = float("nan")
        drain = lambda: None  # rebound inside the loop (closes over aux)
        t_start = time.time()

        profile_dir = self.opts.config.get("profile_dir")
        for i, batch in enumerate(loader):
            if profile_dir and train and epoch == 0 and i == 2:
                jax.profiler.start_trace(profile_dir)
            t_proc = time.time()
            self._key, kp, kd = jax.random.split(self._key, 3)
            feature, label, points = self._device_batch(batch, train, kp)
            if not self.point_lovasz:
                points = None
            if train:
                if points is not None:
                    self.state, aux = self.train_step(
                        self.state, feature, label, kd, points)
                else:
                    self.state, aux = self.train_step(self.state, feature,
                                                      label, kd)
            elif points is not None:
                aux, _ = self.eval_step(self.state, feature, label,
                                        jnp.asarray(batch["batch_valid"]),
                                        points)
            else:
                aux, _ = self.eval_step(self.state, feature, label,
                                        jnp.asarray(batch["batch_valid"]))

            # buffer device scalars; fetching them here would sync every
            # dispatch and stall the pipeline (the fused bs8 train step is
            # ~74 ms of device work; a per-iter sync was costing more than
            # the step itself through the relay). Drained at log points.
            pending.append((aux, feature.shape[0]))
            self._panel_batch = (feature, label)

            def drain():
                nonlocal last_loss
                for p_aux, p_bs in pending:
                    last_loss = float(p_aux["loss"])
                    loss_meter.update(last_loss, p_bs)
                    for k, v in p_aux.items():
                        if k not in ("loss", "conf", "conf_cam"):
                            aux_meters.setdefault(k, AverageMeter()).update(
                                float(v), p_bs)
                    self.metrics.addBatchConf(np.asarray(p_aux["conf"]))
                    if "conf_cam" in p_aux:
                        self.metrics_img.addBatchConf(
                            np.asarray(p_aux["conf_cam"]))
                pending.clear()

            data_t = t_proc - t_start
            proc_t = time.time() - t_proc
            self.remain_time.update(time.time() - t_start, mode)
            t_start = time.time()

            if self.recorder is not None and (
                    i % 10 == 0 or i == total_iter - 1):
                drain()
                loss = last_loss
                miou, _ = self.metrics.getIoU()
                macc, _ = self.metrics.getAcc()
                mrec, _ = self.metrics.getRecall()
                lr = float(self.lr_schedule(self.state.step))
                rt = datetime.timedelta(seconds=int(
                    self.remain_time.getRemainTime(epoch, i, total_iter, mode)))
                line = (
                    f">>> {mode} E[{self.opts.n_epochs:03d}|{epoch + 1:03d}] "
                    f"I[{total_iter:04d}|{i + 1:04d}] DT[{data_t:.3f}] "
                    f"PT[{proc_t:.3f}] LR {lr:.5f} Loss {loss:.4f} "
                    f"Acc {macc:.4f} IOU {miou:.4f} Recall {mrec:.4f}")
                if "entropy" in aux_meters:
                    line += f" Entropy {aux_meters['entropy'].avg:.4f}"
                if "conf_cam" in aux:  # parity: trainer.py:426-431
                    iiou, _ = self.metrics_img.getIoU()
                    iacc, _ = self.metrics_img.getAcc()
                    irec, _ = self.metrics_img.getRecall()
                    line += (f" ImgAcc {iacc:.4f} ImgIOU {iiou:.4f} "
                             f"ImgRecall {irec:.4f}")
                    if "entropy_cam" in aux_meters:
                        line += f" ImgEntropy {aux_meters['entropy_cam'].avg:.4f}"
                self.recorder.logger.info(line + f" RT {rt}")
            if profile_dir and train and epoch == 0 and i == 4:
                jax.profiler.stop_trace()
                profile_dir = None
            if self.opts.is_debug:
                break
        drain()

        miou, class_iou = self.metrics.getIoU()
        macc, class_acc = self.metrics.getAcc()
        mrecall, class_recall = self.metrics.getRecall()
        if self.recorder is not None:
            # scalar parity: tasks/pmf/trainer.py:440-494
            lr = float(self.lr_schedule(self.state.step))
            for tag, v in [("Loss", loss_meter.avg), ("meanAcc", macc),
                           ("meanIOU", miou), ("meanRecall", mrecall),
                           ("lr", lr)]:
                self.recorder.add_scalar(f"{mode}_{tag}", v, epoch)
            scalar_tags = {
                "loss_focal": "LossFocal", "loss_lovasz": "LossLovasz",
                "loss_focal_cam": "LossImageFocal",
                "loss_lovasz_cam": "LossImageLovasz",
                "loss_perception": "LossPerception",
                "entropy": "entropy", "entropy_cam": "ImageEntropy",
            }
            for k, m in aux_meters.items():
                self.recorder.add_scalar(
                    f"{mode}_{scalar_tags.get(k, k)}", m.avg, epoch)
            for c, name in self.mapped_cls_name.items():
                c = int(c)
                if c >= len(class_iou):
                    continue
                for metric, vals in [("Acc", class_acc),
                                     ("Recall", class_recall),
                                     ("IOU", class_iou)]:
                    self.recorder.add_scalar(
                        f"{mode}_{c:02d}_{name}_{metric}",
                        float(vals[c]), epoch)
            if self.is_fusion:
                imiou, ciou = self.metrics_img.getIoU()
                imacc, cacc = self.metrics_img.getAcc()
                imrec, crec = self.metrics_img.getRecall()
                for tag, v in [("Image_meanAcc", imacc),
                               ("Image_meanIOU", imiou),
                               ("Image_meanRecall", imrec)]:
                    self.recorder.add_scalar(f"{mode}_{tag}", v, epoch)
                for c, name in self.mapped_cls_name.items():
                    c = int(c)
                    if c >= len(ciou):
                        continue
                    for metric, vals in [("ImageAcc", cacc),
                                         ("ImageRecall", crec),
                                         ("ImageIOU", ciou)]:
                        self.recorder.add_scalar(
                            f"{mode}_{c:02d}_{name}_{metric}",
                            float(vals[c]), epoch)
            self._log_image_panels(mode, epoch)

        return {"Acc": float(macc), "IOU": float(miou),
                "Recall": float(mrecall), "last": 0.0,
                "Loss": loss_meter.avg}

    def _log_image_panels(self, mode: str, epoch: int):
        """Image panel parity (tasks/pmf/trainer.py:497-524): input pcd
        channels + RGB, per-class probability maps of both streams,
        entropy maps, PA guide weights, per-class label masks — every
        print_frequency epochs, fusion nets, non-nuScenes."""
        opts = self.opts
        if (not self.is_fusion or self.recorder is None
                or not bool(opts.config.get("log_images", True))
                or epoch % opts.print_frequency != 0
                or opts.dataset == "nuScenes"
                or getattr(self, "_panel_batch", None) is None):
            return
        feature, label = self._panel_batch
        feature = feature[:1]
        lidar, cam = self._panel_forward(self.state, feature)
        lidar = np.asarray(lidar[0], np.float32)
        cam = np.asarray(cam[0], np.float32)
        f0 = np.asarray(feature[0], np.float32)
        lab = np.asarray(label[0])

        rec = self.recorder
        for c in range(f0.shape[-1] - 3):
            rec.add_image(f"{mode}_PCDFeature_{c}", f0[..., c], epoch)
        rec.add_image(f"{mode}_RGB", f0[..., -3:], epoch)
        for c, name in self.mapped_cls_name.items():
            c = int(c)
            if c >= lidar.shape[-1]:
                continue
            rec.add_image(f"{mode}_Pred_cls_{c:02d}_{name}",
                          lidar[..., c], epoch)
            rec.add_image(f"{mode}_RGBPred_cls_{c:02d}_{name}",
                          cam[..., c], epoch)
            rec.add_image(f"{mode}_Label_cls_{c:02d}_{name}",
                          (lab == c).astype(np.float32), epoch)
        # entropy + PA guide weights (losses/perception_aware.py formulas)
        nc = lidar.shape[-1]
        ent_pcd = -(lidar * np.log(np.clip(lidar, 1e-8, None))).sum(-1) / np.log(nc)
        ent_img = -(cam * np.log(np.clip(cam, 1e-8, None))).sum(-1) / np.log(nc)
        conf_pcd, conf_img = 1.0 - ent_pcd, 1.0 - ent_img
        imp = conf_pcd - conf_img
        tau = opts.tau
        pcd_guide = (imp > 0) * np.abs(imp) * (conf_pcd >= tau)
        img_guide = (imp < 0) * np.abs(imp) * (conf_img >= tau)
        rec.add_image(f"{mode}_PredEntropy", ent_pcd, epoch)
        rec.add_image(f"{mode}_RGBPredEntropy", ent_img, epoch)
        rec.add_image(f"{mode}_PCDGuideWeight", pcd_guide, epoch)
        rec.add_image(f"{mode}_RGBGuideWeight", img_guide, epoch)
