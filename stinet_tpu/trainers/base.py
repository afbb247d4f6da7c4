"""BaseTrainer — epoch loop with wall-clock timing, metric-monitored best
tracking, early stopping and periodic checkpointing; behavioral parity with
/root/reference/base/base_trainer.py:8-202 (monitor strings like
"min val_loss", save_period, early_stop, dry_run gating)."""
import time
from abc import abstractmethod

import numpy as np

from stinet_tpu.core.writer import TensorboardWriter
from stinet_tpu.parallel import multihost


class BaseTrainer:
    def __init__(self, config):
        self.config = config
        self.logger = config.get_logger(
            "trainer", config["trainer"].get("verbosity", 2))

        cfg = config["trainer"]
        self.epochs = cfg["epochs"]
        self.save_period = cfg.get("save_period", 1)
        self.monitor = cfg.get("monitor", "off")

        if self.monitor == "off":
            self.mnt_mode, self.mnt_best = "off", 0
            self.early_stop = np.inf
        else:
            self.mnt_mode, self.mnt_metric = self.monitor.split()
            assert self.mnt_mode in ("min", "max")
            self.mnt_best = np.inf if self.mnt_mode == "min" else -np.inf
            self.early_stop = cfg.get("early_stop", np.inf)

        self.start_epoch = 1
        self.checkpoint_dir = config.save_dir
        self.writer = TensorboardWriter(
            config.log_dir, self.logger,
            cfg.get("tensorboard", False) and not config.dry_run
            and multihost.is_primary())

    @abstractmethod
    def _train_epoch(self, epoch):
        raise NotImplementedError

    @abstractmethod
    def _eval(self, mode):
        raise NotImplementedError

    def train(self):
        not_improved_count = 0
        for epoch in range(self.start_epoch, self.epochs + 1):
            t0 = time.perf_counter()
            result = self._train_epoch(epoch)
            log = {"epoch": epoch, "time elapsed": time.perf_counter() - t0}
            log.update(result)
            # Multi-host: each process trained/validated on its own scene
            # shard — average the scalars so best/early-stop/plateau
            # decisions below are identical on every host (identity when
            # single-process).
            log = multihost.mean_scalar_metrics(log)

            for key, value in log.items():
                self.logger.info("    {:15s}: {}".format(str(key), value))

            self._observe_lr(log)

            best = False
            if self.mnt_mode != "off":
                if self.mnt_metric not in log:
                    self.logger.warning(
                        "Warning: Metric '%s' is not found. Model "
                        "performance monitoring is disabled.",
                        self.mnt_metric)
                    self.mnt_mode = "off"
                else:
                    improved = (
                        (self.mnt_mode == "min"
                         and log[self.mnt_metric] <= self.mnt_best)
                        or (self.mnt_mode == "max"
                            and log[self.mnt_metric] >= self.mnt_best))
                    if improved:
                        self.mnt_best = log[self.mnt_metric]
                        not_improved_count = 0
                        best = True
                    else:
                        not_improved_count += 1
                    if not_improved_count > self.early_stop:
                        self.logger.info(
                            "Validation performance didn't improve for %s "
                            "epochs. Training stops.", self.early_stop)
                        break

            if not self.config.dry_run:
                # One host writes; all hosts wait at the same point so a
                # slow serialization can't skew the next epoch's collective
                # timing (every process reaches sync_hosts — the monitor
                # decisions above are host-uniform after the metric mean).
                if epoch % self.save_period == 0:
                    if multihost.is_primary():
                        self._save_checkpoint(epoch)
                    multihost.sync_hosts("save_checkpoint")
                if best:
                    if multihost.is_primary():
                        self._save_best(epoch)
                    multihost.sync_hosts("save_best")

    def _observe_lr(self, log):
        """Feed the monitored metric to stateful LR schedulers
        (ReduceLROnPlateau parity: torch scheduler.step(metric) once per
        epoch). Stateless schedulers' observe() is a no-op."""
        fn = getattr(self, "lr_fn", None)
        if fn is None or not hasattr(fn, "observe"):
            return
        key = getattr(self, "mnt_metric", None)
        for k in (key, "val_loss", "loss"):
            if k is not None and k in log:
                fn.observe(log[k])
                return

    def eval(self, mode):
        assert self.config.resume is not None, \
            "ERROR: Cannot evaluate model without loaded weights"
        self._eval(mode)

    def _progress(self, batch_idx, len_epoch):
        return "[{}/{} ({:.0f}%)]".format(
            batch_idx, len_epoch, 100.0 * batch_idx / max(len_epoch, 1))
