"""GraphSegmentationTrainer — ScanNet 21-class semantic segmentation with
SingleConvMeshNet. Parity with /root/reference/trainers/
segmentation_trainer.py: weighted CrossEntropy(ignore_index=0) with the
precomputed class weights, confusion-matrix -> per-class/mean IoU per epoch,
crop training + full-scene validation with predictions projected back to
original vertices via original_index_traces (reference :93,223)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from stinet_tpu.core.checkpoint import save_checkpoint, load_checkpoint
from stinet_tpu.core.registry import TRAINERS, DATALOADERS
from stinet_tpu.data.scannetlabel import CLASS_WEIGHTS, CLASS_LABELS
from stinet_tpu.metrics import MetricTracker
from stinet_tpu.metrics.iou import IoU, confusion_matrix_update
from stinet_tpu.models.factory import count_parameters
from stinet_tpu.models.losses import cse_loss, cse_loss_terms
from stinet_tpu.models.singleconvmeshnet import SingleConvMeshNet
from stinet_tpu.trainers.base import BaseTrainer
from stinet_tpu.trainers.graph_common import (
    TrainState, build_optimizer, step_lr, host_metrics, iter_placed,
    maybe_data_mesh, replicate_to_mesh, place_graph_on_mesh, place_stacked)


def make_stacked_segmentation_steps(model, tx, class_weights, num_classes,
                                    mesh=None):
    """Scan-over-scenes segmentation steps for STACKED batches (leading
    scene axis on every leaf; graph/build.py:build_stacked_graph) — the
    multi-host data-parallel layout, mirroring
    graph_common.make_stacked_inpainting_steps.

    Loss/gradients are EXACT vs the concatenated batch: weighted-CE
    combines as loss = sum_b(wsum_b) / sum_b(wnorm_b) with the class-weight
    normalizer wnorm_b parameter-independent (models/losses.py:
    cse_loss_terms), so grads = sum_b grad(wsum_b) / sum_b(wnorm_b).
    Confusion matrices are plain sums. All accumulators psum across the
    mesh's data axis, so the trajectory is process-count-invariant
    (tests/test_stacked_seg.py locks 2-process == 1-process).

    BatchNorm semantics (documented deviation from the concatenated
    layout): each scene normalizes with its OWN per-scene batch statistics
    (batch-of-one BN — scenes are processed sequentially in the scan, so
    cross-scene activation statistics do not exist at normalization time),
    and the running-stats EMA advances ONE step per optimizer step using
    the across-scene mean. Every scene's updated stats are computed from
    the SAME incoming running stats: new_bs_i = (1-m)*ra + m*stats_i, so
    mean_i(new_bs_i) = (1-m)*ra + m*mean_i(stats_i) — order-independent,
    hence identical for any sharding of the scenes over hosts.
    """
    assert class_weights is not None

    def _scene_train_wsum(params, batch_stats, graph):
        vmask = graph.levels[0].vertex_mask()
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, graph,
            train=True, mutable=["batch_stats"])
        wsum, wnorm = cse_loss_terms(logits, graph.labels,
                                     weights=class_weights, ignore_index=0,
                                     valid_mask=vmask)
        pred = jnp.argmax(logits, axis=-1)
        conf = confusion_matrix_update(pred, graph.labels, num_classes,
                                       vmask * (graph.labels != 0))
        return wsum, (wnorm, conf, updates["batch_stats"])

    def local_train_terms(params, batch_stats, sgraph):
        """lax.scan over the local scenes, accumulating
        (grads, wsum, wnorm, conf, batch-stat sums, scene count)."""
        zero = (jax.tree.map(jnp.zeros_like, params),
                jnp.float32(0.0), jnp.float32(0.0),
                jnp.zeros((num_classes, num_classes), jnp.float32),
                jax.tree.map(jnp.zeros_like, batch_stats),
                jnp.float32(0.0))

        def body(carry, graph):
            gsum, wsum_a, wnorm_a, conf_a, bs_a, b_a = carry
            (wsum, (wnorm, conf, new_bs)), grads = jax.value_and_grad(
                _scene_train_wsum, has_aux=True)(params, batch_stats, graph)
            carry = (jax.tree.map(jnp.add, gsum, grads),
                     wsum_a + wsum, wnorm_a + wnorm, conf_a + conf,
                     jax.tree.map(jnp.add, bs_a, new_bs), b_a + 1.0)
            return carry, None

        carry, _ = jax.lax.scan(body, zero, sgraph)
        return carry

    def local_eval_terms(params, batch_stats, sgraph, w):
        """w: [B_local] per-scene validity weights — 0.0 zeroes a tail-
        repeat row (data/scannet.py pads a short global batch by repeating
        scenes to keep the [B] signature) out of the loss and confusion
        accumulators so duplicated scenes cannot bias val metrics
        (ADVICE r4). All-ones on full batches."""
        def body(args):
            graph, wi = args
            vmask = graph.levels[0].vertex_mask()
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, graph,
                train=False)
            wsum, wnorm = cse_loss_terms(
                logits, graph.labels, weights=class_weights, ignore_index=0,
                valid_mask=vmask)
            pred = jnp.argmax(logits, axis=-1)
            conf = confusion_matrix_update(pred, graph.labels, num_classes,
                                           vmask * (graph.labels != 0))
            return wsum * wi, wnorm * wi, conf * wi, pred

        wsum, wnorm, conf, pred = jax.lax.map(body, (sgraph, w))
        return jnp.sum(wsum), jnp.sum(wnorm), jnp.sum(conf, axis=0), pred

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        ax = mesh.axis_names[0]

        def _psum_tree(tree):
            return jax.tree.map(lambda x: jax.lax.psum(x, ax), tree)

        def _train_shard(params, batch_stats, sgraph):
            gsum, wsum, wnorm, conf, bs_sum, b = local_train_terms(
                params, batch_stats, sgraph)
            return (_psum_tree(gsum), jax.lax.psum(wsum, ax),
                    jax.lax.psum(wnorm, ax), jax.lax.psum(conf, ax),
                    _psum_tree(bs_sum), jax.lax.psum(b, ax))

        def _eval_shard(params, batch_stats, sgraph, w):
            wsum, wnorm, conf, pred = local_eval_terms(
                params, batch_stats, sgraph, w)
            return (jax.lax.psum(wsum, ax), jax.lax.psum(wnorm, ax),
                    jax.lax.psum(conf, ax), pred)

        batch_train_terms = shard_map(
            _train_shard, mesh=mesh, in_specs=(P(), P(), P(ax)),
            out_specs=(P(), P(), P(), P(), P(), P()), check_vma=False)
        batch_eval_terms = shard_map(
            _eval_shard, mesh=mesh, in_specs=(P(), P(), P(ax), P(ax)),
            out_specs=(P(), P(), P(), P(ax)), check_vma=False)
    else:
        batch_train_terms = local_train_terms
        batch_eval_terms = local_eval_terms

    def train_step(state, sgraph, lr):
        gsum, wsum, wnorm, conf, bs_sum, b = batch_train_terms(
            state.params, state.batch_stats, sgraph)
        denom = jnp.maximum(wnorm, 1e-8)
        loss = wsum / denom
        grads = jax.tree.map(lambda g: g / denom, gsum)
        new_bs = jax.tree.map(lambda s: s / jnp.maximum(b, 1.0), bs_sum)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1, batch_stats=new_bs)
        return new_state, {"loss": loss}, conf

    def eval_step(state, sgraph, w):
        wsum, wnorm, conf, pred = batch_eval_terms(
            state.params, state.batch_stats, sgraph, w)
        loss = wsum / jnp.maximum(wnorm, 1e-8)
        return {"loss": loss}, pred, conf

    return (jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step))


@TRAINERS.register("GraphSegmentationTrainer")
class GraphSegmentationTrainer(BaseTrainer):
    ARCH_KEY = "SingleConvMeshNet"

    def __init__(self, config):
        super().__init__(config)
        logger = config.get_logger("train")
        arch_args = dict(config["archs"][self.ARCH_KEY]["args"])
        self.model = SingleConvMeshNet(**arch_args)
        self.num_classes = arch_args.get("num_classes", 21)

        self.data_loader = config.init_obj_with_config(
            "data_loader", DATALOADERS)
        dl_args = config["data_loader"]["args"]
        self.num_accum = int(dl_args.get("num_cumulated_train_batches", 1))
        self.tx, self.base_lr = build_optimizer(
            config["optimizer"], self.num_accum)
        self.lr_fn = step_lr(self.base_lr, config.get("lr_scheduler", {}))
        tcfg = config["trainer"]
        self.do_validation = tcfg.get("do_validation", True)
        self.batches_per_log = tcfg.get("batches_per_log", 1)

        # stacked batching (scan-over-scenes per-scene tables; the
        # multi-host layout): the loader decides, the trainer follows
        self._stacked = bool(getattr(self.data_loader, "stacked", False))

        seed = config.get("seed", 123) or 123
        example = self._example_graph()
        if self._stacked:  # init on one scene slice of the stacked batch
            example = jax.tree.map(lambda a: a[0], example)
        variables = jax.jit(self.model.init)(
            jax.random.key(seed), example)
        params = variables["params"]
        logger.info("Number of parameters: %d", count_parameters(params))
        self.state = TrainState(
            params=params, opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            batch_stats=variables.get("batch_stats"))

        self.class_weights = jnp.asarray(CLASS_WEIGHTS[:self.num_classes])
        # Working data parallelism behind the reference's n_gpu key (its
        # own DataParallel path is unreachable and broken,
        # segmentation_trainer.py:34-35,148). Multi-host runs use the
        # stacked layout: the loader switches to it automatically and the
        # steps shard the scene axis over the mesh explicitly.
        self._mesh = maybe_data_mesh(config.config, logger)
        if self._stacked:
            self._train_step, self._eval_step = \
                make_stacked_segmentation_steps(
                    self.model, self.tx, self.class_weights,
                    self.num_classes, mesh=self._mesh)
        else:
            self._train_step = jax.jit(self._make_train_step(),
                                       donate_argnums=(0,))
            self._eval_step = jax.jit(self._make_eval_step())

        if config.resume is not None:
            self._resume_checkpoint(config.resume)
        self.state = replicate_to_mesh(self._mesh, self.state)

        self.train_metrics = MetricTracker("loss", writer=self.writer)
        self.valid_metrics = MetricTracker("loss", writer=self.writer)

    def _example_graph(self):
        for loader in (self.data_loader.train_loader,
                       self.data_loader.val_loader):
            for g, _ in loader:
                return g
        raise RuntimeError("No data available")

    def _place_graph(self, graph):
        if self._stacked:
            return place_stacked(self._mesh, graph)
        return place_graph_on_mesh(self._mesh, graph)

    def _stacked_val_weights(self):
        """Per-scene validity weights ([B_local], placed like the scene
        axis) for stacked validation batches. The val loader pads a short
        global batch by REPEATING scenes to keep the [B] signature
        (data/scannet.py:_produce); that happens exactly when the val set
        is smaller than the global test batch, with the repeats at global
        tail positions — weight them 0 so duplicated scenes cannot bias
        val loss / IoU / 'min val_loss' monitoring (ADVICE r4). All-ones
        otherwise, which reproduces the unweighted accumulators bit-for-
        bit (x*1.0)."""
        from stinet_tpu.parallel import multihost
        loader = self.data_loader.val_loader
        B = loader.batch_size
        w = np.zeros(B, np.float32)
        w[:min(len(loader.dataset), B)] = 1.0
        p, npc = multihost.process_index(), multihost.process_count()
        bl = B // npc
        w_local = w[p * bl:(p + 1) * bl]
        return w_local, place_stacked(self._mesh, w_local)

    def _make_train_step(self):
        model, tx, weights = self.model, self.tx, self.class_weights
        nc = self.num_classes

        def train_step(state, graph, lr):
            vmask = graph.levels[0].vertex_mask()

            # Grads of the UN-normalized weighted-CE sum, divided by the
            # (parameter-independent) weight total afterwards — the same
            # float order as the stacked scan layout, so bs=1 stacked ==
            # concat trajectories line up exactly (tests/test_stacked_seg.py).
            def loss_fn(params):
                variables = {"params": params,
                             "batch_stats": state.batch_stats}
                logits, updates = model.apply(
                    variables, graph, train=True, mutable=["batch_stats"])
                wsum, wnorm = cse_loss_terms(
                    logits, graph.labels, weights=weights, ignore_index=0,
                    valid_mask=vmask)
                return wsum, (wnorm, logits, updates["batch_stats"])

            (wsum, (wnorm, logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            denom = jnp.maximum(wnorm, 1e-8)
            loss = wsum / denom
            grads = jax.tree.map(lambda g: g / denom, grads)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(state.params, updates)
            pred = jnp.argmax(logits, axis=-1)
            conf = confusion_matrix_update(
                pred, graph.labels, nc,
                vmask * (graph.labels != 0))
            new_state = state.replace(params=params, opt_state=opt_state,
                                      step=state.step + 1,
                                      batch_stats=new_bs)
            return new_state, {"loss": loss}, conf

        return train_step

    def _make_eval_step(self):
        model, weights, nc = self.model, self.class_weights, self.num_classes

        def eval_step(state, graph):
            vmask = graph.levels[0].vertex_mask()
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                graph, train=False)
            loss = cse_loss(logits, graph.labels, weights=weights,
                            ignore_index=0, valid_mask=vmask)
            pred = jnp.argmax(logits, axis=-1)
            conf = confusion_matrix_update(
                pred, graph.labels, nc, vmask * (graph.labels != 0))
            return {"loss": loss}, pred, conf

        return eval_step

    def _train_epoch(self, epoch):
        from stinet_tpu.trainers.inpainting3d import check_nan_in_params
        check_nan_in_params(self.state.params, self.logger)
        self.train_metrics.reset()
        iou = IoU(self.num_classes, ignore_index=0)
        lr = jnp.float32(self.lr_fn(epoch))
        loader = self.data_loader.train_loader
        len_epoch = len(loader)
        # iter_placed: batch i+1's packed H2D overlaps batch i's step
        # (single-device only; graph_common.iter_placed docstring)
        for batch_idx, (graph, names) in enumerate(iter_placed(
                loader, self._place_graph, overlap=self._mesh is None)):
            self.writer.set_step((epoch - 1) * len_epoch + batch_idx)
            self.state, metrics, conf = self._train_step(
                self.state, graph, lr)
            iou.add_matrix(conf)
            for k, v in host_metrics(metrics).items():
                self.train_metrics.update(k, v)
            if batch_idx % self.batches_per_log == 0:
                self.logger.debug(":Train Epoch: %s %s", epoch,
                                  self._progress(batch_idx, len_epoch))
        log = self.train_metrics.result(write=True)
        log["lr"] = float(lr)
        _, miou = iou.value()
        log["mean_iou"] = float(miou)
        if self.do_validation:
            val_log = self._valid_epoch(epoch)
            log.update(**{"val_" + k: v for k, v in val_log.items()})
        return log

    def _valid_epoch(self, epoch):
        self.valid_metrics.reset()
        iou = IoU(self.num_classes, ignore_index=0)
        # Full-resolution IoU: project coarse (level-0) predictions back to
        # the original mesh vertices through original_index_traces when the
        # loader provides it (reference segmentation_trainer.py:93,223).
        full_iou = IoU(self.num_classes, ignore_index=0)
        have_full = False
        val_ds = getattr(self.data_loader, "val_dataset", None)
        if self._stacked:
            w_local, w_dev = self._stacked_val_weights()
        for batch_idx, (graph, names) in enumerate(
                self.data_loader.val_loader):
            if self._stacked:
                metrics, pred, conf = self._eval_step(
                    self.state, self._place_graph(graph), w_dev)
            else:
                metrics, pred, conf = self._eval_step(
                    self.state, self._place_graph(graph))
            iou.add_matrix(conf)
            for k, v in host_metrics(metrics).items():
                self.valid_metrics.update(k, v)
            if val_ds is None:
                continue
            # Full-resolution projection rows: stacked preds are [B, V]
            # (this host's local scenes via host_local_block; the per-host
            # confusion matrices are summed across hosts below, so the
            # logged full_scene_mean_iou is GLOBAL); concatenated preds
            # are flat [V] and only single-scene batches project.
            if self._stacked:
                from stinet_tpu.parallel.multihost import host_local_block
                # drop tail-repeat rows (weight 0) from the projection too
                rows = [r for r, wi in zip(host_local_block(pred), w_local)
                        if wi > 0]
                names = [n for n, wi in zip(names, w_local) if wi > 0]
            elif graph.num_graphs == 1:
                rows = [np.asarray(pred)]
            else:
                rows = []
            for name, p_row in zip(names, rows):
                sample = None
                try:
                    idx = list(val_ds.index2filenames).index(name)
                    sample = val_ds[idx]
                except (ValueError, AttributeError):
                    pass
                orig = getattr(sample, "original_index_traces", None) \
                    if sample is not None else None
                if orig is not None and sample.labels is not None:
                    p_full = np.asarray(p_row)[np.asarray(orig)]
                    l_full = np.asarray(sample.labels)[
                        :len(orig)] if len(sample.labels) >= len(orig) \
                        else np.asarray(sample.labels)
                    if len(l_full) == len(p_full):
                        full_iou.add(p_full, l_full,
                                     (l_full != 0).astype(np.float32))
                        have_full = True
        log = self.valid_metrics.result(write=True)
        per_class, miou = iou.value()
        _, mprec = iou.precision()
        log["mean_iou"] = float(miou)
        log["mean_precision"] = float(mprec)
        log["overall_accuracy"] = iou.overall_accuracy()
        from stinet_tpu.parallel.multihost import (
            process_count, sum_array_across_hosts)
        if process_count() > 1 and self._stacked:
            # multi-process, each host projects only its local scene shard
            # — sum the confusion matrices across hosts so the logged
            # metric is GLOBAL and the key set host-uniform (ADVICE r4).
            # The collective runs UNCONDITIONALLY: a host whose local rows
            # were all tail repeats contributes zeros instead of dropping
            # the key (which deadlocked/raised in mean_scalar_metrics).
            gconf = sum_array_across_hosts(full_iou.conf_metric.conf)
            if gconf.sum() > 0:
                full_iou.conf_metric.conf = gconf
                _, full_miou = full_iou.value()
                log["full_scene_mean_iou"] = float(full_miou)
        elif have_full:
            _, full_miou = full_iou.value()
            log["full_scene_mean_iou"] = float(full_miou)
        for i, name in enumerate(CLASS_LABELS[:self.num_classes]):
            if not np.isnan(per_class[i]):
                self.writer.set_step(epoch - 1, f"iou_{name}", quiet=True)
                self.writer.add_scalar("per_class_iou", per_class[i])
        return log

    def _eval(self, mode):
        if self.config["vis"]:
            from stinet_tpu.data.scannetlabel import SCANNET_COLOR_MAP
            from stinet_tpu.utils.visualization import SemSegVisualizer
            vis = SemSegVisualizer(self.data_loader, SCANNET_COLOR_MAP,
                                   "visualizations/")
            if self._stacked:
                _, w_dev = self._stacked_val_weights()
            for graph, names in self.data_loader.val_loader:
                if self._stacked:
                    _, pred, _ = self._eval_step(
                        self.state, self._place_graph(graph), w_dev)
                else:
                    _, pred, _ = self._eval_step(
                        self.state, self._place_graph(graph))
                nvs = np.atleast_1d(
                    np.asarray(graph.levels[0].num_vertices))
                labels = np.asarray(graph.labels)
                if self._stacked:  # [B, V] rows, one scene per row
                    from stinet_tpu.parallel.multihost import \
                        host_local_block
                    rows = host_local_block(pred)
                    for bi, name in enumerate(names):
                        n = int(nvs[bi])
                        vis.visualize_result(name, rows[bi, :n],
                                             labels[bi, :n])
                else:
                    n = int(nvs[0])
                    vis.visualize_result(names[0], np.asarray(pred)[:n],
                                         labels[:n])
        log = self._valid_epoch(0)
        for key, value in log.items():
            self.logger.info("    %-15s: %s", str(key), value)

    def _state_save(self, epoch, path):
        save_checkpoint(
            path, models={"seg": self.state.params},
            opt_states={"seg": self.state.opt_state},
            epoch=epoch, monitor_best=self.mnt_best,
            config=self.config.config,
            extra={"batch_stats": self.state.batch_stats or {}})

    def _save_checkpoint(self, epoch):
        self._state_save(
            epoch, str(self.checkpoint_dir / f"checkpoint-epoch{epoch}.ckpt"))

    def _save_best(self, epoch):
        self._state_save(epoch, str(self.checkpoint_dir / "model_best.ckpt"))

    def _resume_checkpoint(self, resume_path):
        models, opts, extra, meta = load_checkpoint(
            resume_path, {"seg": self.state.params},
            {"seg": self.state.opt_state},
            {"batch_stats": self.state.batch_stats or {}})
        self.state = self.state.replace(
            params=models["seg"], opt_state=opts["seg"],
            batch_stats=extra["batch_stats"] or None)
        self.start_epoch = meta["epoch"] + 1
        self.mnt_best = meta["monitor_best"]
