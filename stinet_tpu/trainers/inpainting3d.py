"""Inpainting3DTrainer — the flagship 3D surface-texture-inpainting workload.

Behavioral parity with /root/reference/trainers/inpainting3d_trainer.py:
masked-composite forward, optional 0.99^mask-weighted L1, gradient
accumulation, per-batch metrics (loss/l1/mse/graph_tv/graph_lap_var/psnr/
psnr_mask_only), bs=1 full-scene validation, multi-model checkpoint dicts
with enabled-aware resume, epoch-stepped StepLR. The train step is one jitted
XLA program per graph-size bucket; device memory stats replace the CUDA
memory counters."""
import jax
import jax.numpy as jnp
import numpy as np

from stinet_tpu.core.checkpoint import save_checkpoint, load_checkpoint
from stinet_tpu.core.registry import TRAINERS, DATALOADERS
from stinet_tpu.metrics import MetricTracker
from stinet_tpu.models.factory import define_G, count_parameters
from stinet_tpu.trainers.base import BaseTrainer
from stinet_tpu.trainers.graph_common import (
    TrainState, build_optimizer, step_lr, make_inpainting_steps,
    make_stacked_inpainting_steps, host_metrics, iter_placed,
    maybe_data_mesh, replicate_to_mesh, place_graph_on_mesh,
    place_stacked)


def check_nan_in_params(params, logger=None):
    """NaN-parameter scan at each epoch start
    (reference utils/unit_tests.py:5-9)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if not np.all(np.isfinite(np.asarray(leaf))):
            name = "/".join(str(p) for p in path)
            msg = f"NaN/inf detected in parameter {name}"
            if logger:
                logger.error(msg)
            raise FloatingPointError(msg)


@TRAINERS.register("Inpainting3DTrainer")
class Inpainting3DTrainer(BaseTrainer):
    ARCH_KEY = "SurfaceTextureInpaintingNet"

    def __init__(self, config):
        super().__init__(config)
        logger = config.get_logger("train")

        arch_args = dict(config["archs"][self.ARCH_KEY]["args"])
        self.model = define_G(**arch_args)
        self.norm_type = arch_args.get("norm", "instance")
        self._has_batch_stats = self.norm_type == "batch"

        self.data_loader = config.init_obj_with_config(
            "data_loader", DATALOADERS)

        dl_args = config["data_loader"]["args"]
        self.num_accum = int(dl_args.get("num_cumulated_train_batches", 1))
        self.tx, self.base_lr = build_optimizer(
            config["optimizer"], self.num_accum)
        self.lr_fn = step_lr(self.base_lr, config.get("lr_scheduler", {}))

        tcfg = config["trainer"]
        self.use_mask_weighted_loss = tcfg.get("use_mask_weighted_loss", False)
        self.do_validation = tcfg.get("do_validation", True)
        self.batches_per_log = tcfg.get("batches_per_log", 1)

        # stacked batching (vmapped per-scene tables; the multi-host
        # layout): the loader decides, the trainer follows
        self._stacked = bool(getattr(self.data_loader, "stacked", False))

        # Initialize params with the first available graph (shapes don't
        # affect parameter shapes; one init serves all buckets).
        seed = config.get("seed", 123) or 123
        example = self._example_graph()
        if self._stacked:  # init on one scene slice of the stacked batch
            example = jax.tree.map(lambda a: a[0], example)
        variables = jax.jit(self.model.init)(
            jax.random.key(seed), example)
        params = variables["params"]
        logger.info("Number of parameters in graph: %d",
                    count_parameters(params))
        self.state = TrainState(
            params=params, opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            batch_stats=variables.get("batch_stats"))

        # mesh first: the stacked steps scan scenes sequentially per
        # device, so data parallelism must be explicit shard_map over the
        # mesh (a GSPMD-sharded scan axis would be all-gathered), not
        # placement-driven like the concatenated path.
        self._mesh = maybe_data_mesh(config.config, logger)
        if self._stacked:
            self._train_step, self._eval_step = \
                make_stacked_inpainting_steps(
                    self.model, self.tx, self.use_mask_weighted_loss,
                    self._has_batch_stats, mesh=self._mesh)
        else:
            self._train_step, self._eval_step = make_inpainting_steps(
                self.model, self.tx, self.use_mask_weighted_loss,
                self._has_batch_stats)

        if config.resume is not None:
            self._resume_checkpoint(config.resume)
        self.state = replicate_to_mesh(self._mesh, self.state)

        metrics = ["loss", "l1", "mse", "graph_tv", "graph_lap_var", "psnr",
                   "psnr_mask_only", "mem_allocated", "mem_reserved"]
        self.train_metrics = MetricTracker(*metrics, writer=self.writer)
        self.valid_metrics = MetricTracker(*metrics, writer=self.writer)

    def _place_graph(self, graph):
        if self._stacked:
            return place_stacked(self._mesh, graph)
        return place_graph_on_mesh(self._mesh, graph)

    # ------------------------------------------------------------------
    def _example_graph(self):
        for loader in (self.data_loader.train_loader,
                       self.data_loader.val_loader):
            for g, _ in loader:
                return g
        raise RuntimeError("No data available to initialize the model")

    def _train_epoch(self, epoch):
        check_nan_in_params(self.state.params, self.logger)
        self.train_metrics.reset()
        lr = jnp.float32(self.lr_fn(epoch))

        loader = self.data_loader.train_loader
        len_epoch = len(loader)
        from stinet_tpu.utils.profiling import device_memory_stats
        # iter_placed: batch i+1's packed H2D overlaps batch i's step +
        # metric sync on a background thread (single-device only)
        for batch_idx, (graph, names) in enumerate(iter_placed(
                loader, self._place_graph, overlap=self._mesh is None)):
            self.writer.set_step((epoch - 1) * len_epoch + batch_idx)
            for k, v in device_memory_stats().items():
                self.train_metrics.update(k, v)
            self.state, metrics = self._train_step(self.state, graph, lr)
            m = host_metrics(metrics)
            for k, v in m.items():
                self.train_metrics.update(k, v)
            if batch_idx % self.batches_per_log == 0:
                self.logger.debug(
                    ":Train Epoch: %s %s I Loss: %.6f Names: %s", epoch,
                    self._progress(batch_idx, len_epoch), m["loss"], names)

        self.writer.set_step(epoch - 1, "epoch_train", quiet=True)
        log = self.train_metrics.result(write=True)
        log["lr"] = float(lr)
        if self.do_validation:
            val_log = self._valid_epoch(epoch)
            log.update(**{"val_" + k: v for k, v in val_log.items()})
        return log

    def _valid_epoch(self, epoch):
        self.valid_metrics.reset()
        loader = self.data_loader.val_loader
        len_epoch = len(loader)
        for batch_idx, (graph, names) in enumerate(iter_placed(
                loader, self._place_graph, overlap=self._mesh is None)):
            self.writer.set_step((epoch - 1) * len_epoch + batch_idx, "valid")
            metrics, _ = self._eval_step(self.state, graph)
            for k, v in host_metrics(metrics).items():
                self.valid_metrics.update(k, v)
        self.writer.set_step(epoch - 1, "epoch_valid", quiet=True)
        return self.valid_metrics.result(write=True)

    def _eval(self, mode):
        loader = (self.data_loader.train_loader if mode == "train"
                  else self.data_loader.val_loader)
        self.valid_metrics.reset()
        visualizer = None
        if self.config["vis"]:
            from stinet_tpu.utils.visualization import ColorCompletionVisualizer
            visualizer = ColorCompletionVisualizer(
                self.data_loader, "visualizations/")
        for batch_idx, (graph, names) in enumerate(loader):
            metrics, composite = self._eval_step(
                self.state, self._place_graph(graph))
            m = host_metrics(metrics)
            for k, v in m.items():
                self.valid_metrics.update(k, v, write=False)
            self.logger.info("    %s %-15s: %s", names[0], "loss", m["loss"])
            if visualizer is not None:
                comp = np.asarray(composite)
                color = np.asarray(graph.color)
                mask = np.asarray(graph.mask)
                nvs = np.atleast_1d(
                    np.asarray(graph.levels[0].num_vertices))
                if self._stacked:  # [B, V, C] slices, one scene per row
                    for bi, name in enumerate(names):
                        n = int(nvs[bi])
                        visualizer.visualize_result(
                            name, comp[bi, :n] / 2.0 + 0.5,
                            color[bi, :n] / 2.0 + 0.5, mask[bi, :n] > 0)
                else:
                    n = int(nvs[0])
                    visualizer.visualize_result(
                        names[0], comp[:n] / 2.0 + 0.5,
                        color[:n] / 2.0 + 0.5, mask[:n] > 0)
        for key, value in self.valid_metrics.result(write=False).items():
            self.logger.info("    %-15s: %s", str(key), value)

    # ------------------------------------------------------------------
    def _state_save(self, epoch, path):
        save_checkpoint(
            path,
            models={"graph": self.state.params},
            opt_states={"graph": self.state.opt_state},
            epoch=epoch, monitor_best=self.mnt_best,
            config=self.config.config,
            archs={"graph": type(self.model).__name__},
            extra={"batch_stats": self.state.batch_stats or {}})

    def _save_checkpoint(self, epoch):
        path = str(self.checkpoint_dir / f"checkpoint-epoch{epoch}.ckpt")
        self._state_save(epoch, path)
        self.logger.info("Saving checkpoint: %s ...", path)

    def _save_best(self, epoch):
        path = str(self.checkpoint_dir / "model_best.ckpt")
        self._state_save(epoch, path)
        self.logger.info("Saving current best: model_best.ckpt ...")

    def _resume_checkpoint(self, resume_path):
        self.logger.info("Loading checkpoint: %s ...", resume_path)
        models, opts, extra, meta = load_checkpoint(
            resume_path,
            {"graph": self.state.params},
            {"graph": self.state.opt_state},
            {"batch_stats": self.state.batch_stats or {}})
        self.state = self.state.replace(
            params=models["graph"], opt_state=opts["graph"],
            batch_stats=extra["batch_stats"] or None)
        self.start_epoch = meta["epoch"] + 1
        self.mnt_best = meta["monitor_best"]
        self.logger.info(
            "Checkpoint loaded. Resume training from epoch %s",
            self.start_epoch)
