"""Training entry point.

Parity: tasks/pmf/main.py (Experiment): seeding, recorder construction
(rank-0 only), model/trainer construction, checkpoint resume or
pretrained load, epoch loop with val runs, best-metric model snapshots,
final cost-time log.

Usage:
  python -m pmf_tpu.tools.train <config.yaml> [--val-only] [--debug]

Multi-host: launch one process per host with COORDINATOR_ADDRESS /
PROCESS_COUNT / PROCESS_ID set (replaces torch.distributed.launch,
tasks/pmf/run.sh:4).
"""
from __future__ import annotations

import argparse
import datetime
import time

import numpy as np

from ..config import check_run_dir, load_options
from ..parallel import init_distributed
from ..train import Recorder, Trainer
from ..utils import is_main_process


class Experiment:
    def __init__(self, opts):
        self.opts = opts
        np.random.seed(opts.seed)
        self.recorder = Recorder(
            opts.run_dir, settings_dict={
                k: v for k, v in vars(opts).items() if k != "config"},
            snapshot_code=True,  # reference always snapshots run code
                                 # (pc_processor/checkpoint/recorder.py:63-75)
        ) if is_main_process() else None
        self.trainer = Trainer(opts, self.recorder)
        self.start_epoch = 0
        self.best = {"Acc": 0.0, "IOU": 0.0, "Recall": 0.0}

        if opts.checkpoint:
            state, epoch = self.trainer.ckpt.restore(self.trainer.state)
            self.trainer.state = state
            self.start_epoch = epoch + 1
            self._log(f"resumed from epoch {epoch}")

    def _log(self, msg):
        if self.recorder:
            self.recorder.logger.info(msg)

    def run(self):
        opts = self.opts
        t0 = time.time()
        if opts.val_only:
            metrics = self.trainer.run(0, "Validation")
            self._log(f"val-only metrics: {metrics}")
            return metrics

        for epoch in range(self.start_epoch, opts.n_epochs):
            self.trainer.run(epoch, "Train")
            if (epoch % opts.val_frequency == 0 or epoch == opts.n_epochs - 1) \
                    and opts.has_label:
                metrics = self.trainer.run(epoch, "Validation")
                # best-metric snapshots (main.py:104-114)
                for k in ["Acc", "IOU", "Recall"]:
                    if metrics[k] > self.best[k]:
                        self.best[k] = metrics[k]
                        self.trainer.ckpt.save_best(
                            {"params": self.trainer.state.params,
                             "batch_stats": self.trainer.state.batch_stats}, k)
                        self._log(f"new best {k}: {metrics[k]:.4f}")
                self.trainer.ckpt.save_best(
                    {"params": self.trainer.state.params,
                     "batch_stats": self.trainer.state.batch_stats}, "last")
            # resume checkpoint every epoch (main.py:117-127)
            self.trainer.ckpt.save(self.trainer.state, epoch)
            cost = datetime.timedelta(seconds=int(time.time() - t0))
            self._log(f"epoch {epoch} done; elapsed {cost}; best {self.best}")
        self._log(f"training done; best {self.best}")
        return self.best


def main():
    # NOTE: no configure_compiler() here — the low-effort codegen that
    # speeds up inference programs makes the train-step compile
    # pathologically slow (>25 min vs ~8 at default; see
    # pmf_tpu/utils/compiler.py) and costs ~10% step throughput
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="experiment yaml")
    parser.add_argument("--val-only", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--overwrite-policy", default=None,
                        choices=["auto", "ask", "reuse", "delete", "abort"],
                        help="what to do when the run dir already exists "
                             "(default: config overwrite_policy, else auto)")
    args = parser.parse_args()

    init_distributed()
    overrides = {}
    if args.val_only:
        overrides["val_only"] = True
    if args.debug:
        overrides["is_debug"] = True
    opts = load_options(args.config, overrides)
    if is_main_process():
        check_run_dir(opts.run_dir, args.overwrite_policy or
                      opts.config.get("overwrite_policy", "auto"))
    Experiment(opts).run()


if __name__ == "__main__":
    main()
