"""Inpainting2DTrainer — 2D texture image inpainting over image-as-grid
graphs, with the conventional conv2d baseline on the same data.

Capability parity with /root/reference/trainers/inpainting2d_trainer.py:
mutually-exclusive graph (STINet) vs 2d (Resnet2D) branches selected by the
enabled archs, masked-composite L1 (+optional total-variation) losses, and
for the 2d branch an optional conditional PatchGAN (prior = masked image +
mask, D/G alternation with lsgan/vanilla losses). Metrics: loss/l1/mse/psnr
per batch. VGG-perceptual and FID epoch metrics are provided by
stinet_tpu.models.losses / stinet_tpu.metrics.fid when pretrained weights are
available (weights are torch-converted offline; see models/losses.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from stinet_tpu.core.checkpoint import save_checkpoint, load_checkpoint
from stinet_tpu.core.registry import TRAINERS, DATALOADERS
from stinet_tpu.metrics import MetricTracker
from stinet_tpu.metrics import graph_metrics as gm
from stinet_tpu.models.factory import define_G, define_D, count_parameters
from stinet_tpu.models.gan_networks import gan_loss
from stinet_tpu.models.losses import total_variation_loss
from stinet_tpu.trainers.base import BaseTrainer
from stinet_tpu.trainers.graph_common import (
    TrainState, build_optimizer, step_lr, host_metrics,
    maybe_data_mesh, replicate_to_mesh, place_graph_on_mesh)


@TRAINERS.register("Inpainting2DTrainer")
class Inpainting2DTrainer(BaseTrainer):
    def __init__(self, config):
        super().__init__(config)
        logger = config.get_logger("train")
        archs = config["archs"]
        graph_enabled = archs.get("SurfaceTextureInpaintingNet",
                                  {}).get("enabled", False)
        conv_enabled = archs.get("Resnet2D", {}).get("enabled", False)
        assert graph_enabled != conv_enabled, \
            "Exactly one of SurfaceTextureInpaintingNet/Resnet2D must be enabled"
        self.branch = "graph" if graph_enabled else "2d"

        self.data_loader = config.init_obj_with_config(
            "data_loader", DATALOADERS)
        self.img_size = config["data_loader"]["args"]["img_size"]

        tcfg = config["trainer"]
        self.use_gan = tcfg.get("use_gan", False) and self.branch == "2d"
        self.gan_mode = tcfg.get("gan_mode", "lsgan")
        self.gan_loss_weight = tcfg.get("gan_loss_weight", 1e-3)
        self.use_total_variation = tcfg.get("use_total_variation", False)
        self.total_variation_weight = tcfg.get("total_variation_weight", 1e-4)
        self.do_validation = tcfg.get("do_validation", True)
        self.batches_per_log = tcfg.get("batches_per_log", 1)
        self.vgg_content_weight = tcfg.get("vgg_content_weight", 0.03)
        self.vgg_style_weight = tcfg.get("vgg_style_weight", 3000.0)
        self.use_vgg = tcfg.get("use_vgg", False)
        # fail-closed: perceptual nets without converted pretrained weights
        # require an explicit opt-in, and their scalars are tagged
        # *_random_features so a random-feature FID can't be mistaken for a
        # real one (VERDICT r1 item 6)
        self.allow_random_features = tcfg.get("allow_random_features", False)
        self.vgg_loss = self._setup_vgg(tcfg) if self.use_vgg else None
        self.visualize_samples = tcfg.get("visualize_samples", False)
        self.epochs_per_fid = tcfg.get("epochs_per_fid", 0)
        self.use_val_fid = tcfg.get("use_val_fid", False)
        self.use_train_fid = tcfg.get("use_train_fid", False)
        self._fid_tag = "fid"
        self._fid = self._setup_fid(tcfg) if (
            (self.use_val_fid or self.use_train_fid)
            and self.epochs_per_fid) else None
        # lpips(alex) per-batch metric (reference tracks it in the 2D
        # trainer, inpainting2d_trainer.py:158-167); opt-in here because the
        # AlexNet+linear-head weights must be converted offline
        self.lpips_tag = "lpips"
        self.lpips = self._setup_lpips(tcfg) if tcfg.get(
            "use_lpips", False) else None
        # jax.profiler trace capture over scheduled steps — the TPU analog of
        # the reference's torch.profiler epoch wrap
        # (inpainting2d_trainer.py:319-325)
        self.profiler = None
        if tcfg.get("profile", False) and not config.dry_run:
            from stinet_tpu.utils.profiling import EpochProfiler
            self.profiler = EpochProfiler(config.log_dir / "profile")

        dl_args = config["data_loader"]["args"]
        self.num_accum = int(dl_args.get("num_cumulated_train_batches", 1))
        seed = config.get("seed", 123) or 123

        arch_key = ("SurfaceTextureInpaintingNet" if self.branch == "graph"
                    else "Resnet2D")
        self.model = define_G(**archs[arch_key]["args"])
        self.tx, self.base_lr = build_optimizer(
            config["optimizer"], self.num_accum)
        self.lr_fn = step_lr(self.base_lr, config.get("lr_scheduler", {}))

        # stacked batching (leading sample axis; the multi-host layout):
        # the loader decides, the trainer follows
        self._stacked = bool(getattr(self.data_loader, "stacked", False))
        # mesh first: the stacked graph-branch steps shard the sample axis
        # explicitly (shard_map); the 2d branch stays placement-driven
        self._mesh = maybe_data_mesh(config.config, logger)

        example = self._example_graph()
        ex_single = (jax.tree.map(lambda a: a[0], example)
                     if self._stacked else example)
        key = jax.random.key(seed)
        if self.branch == "graph":
            params = jax.jit(self.model.init)(key, ex_single)["params"]
            if self._stacked:
                self._train_step, self._eval_step = \
                    self._make_stacked_graph_steps(self._mesh)
            else:
                self._train_step, self._eval_step = self._make_graph_steps()
        else:
            n = ex_single.num_graphs * self.img_size * self.img_size
            img = self._to_images(ex_single.x[:n])
            params = jax.jit(self.model.init)(key, img)["params"]
            if self._stacked:
                self._train_step, self._eval_step = \
                    self._make_stacked_2d_steps()
            else:
                self._train_step, self._eval_step = self._make_2d_steps()
        logger.info("Number of parameters in %s: %d", self.branch,
                    count_parameters(params))
        self.state = TrainState(params=params, opt_state=self.tx.init(params),
                                step=jnp.zeros((), jnp.int32))

        self.disc_state = None
        if self.use_gan:
            self.disc = define_D(input_nc=1 + 3 + 3,
                                 ndf=tcfg.get("ndf", 64), netD="n_layers",
                                 n_layers_D=tcfg.get("n_layers_D", 5),
                                 norm="instance")
            n = ex_single.num_graphs * self.img_size * self.img_size
            dimg = self._to_images(ex_single.x[:n])
            dinput = jnp.concatenate(
                [dimg[..., 3:4], dimg[..., :3], dimg[..., :3]], axis=-1)
            dparams = self.disc.init(jax.random.key(seed + 1), dinput)["params"]
            self.disc_tx, _ = build_optimizer(config["optimizer"], 1)
            self.disc_state = TrainState(
                params=dparams, opt_state=self.disc_tx.init(dparams),
                step=jnp.zeros((), jnp.int32))
            self._gan_step = (self._make_stacked_gan_step()
                              if self._stacked else self._make_gan_step())

        if config.resume is not None:
            self._resume_checkpoint(config.resume)

        # Data parallelism over a device mesh behind the reference's n_gpu
        # key, same pattern as the 3D/segmentation trainers: replicate
        # params/opt-state, shard each batch's sample (stacked) or
        # vertex/pixel (concatenated) dim over `data`. Multi-host launches
        # use the stacked layout (the loader switches automatically): the
        # graph branch scans its local samples under shard_map with an
        # exact equal-weight loss combine; the 2d/GAN branch runs GSPMD
        # over cross-host global image arrays (identical global-mean
        # numerics to the concatenated layout).
        self.state = replicate_to_mesh(self._mesh, self.state)
        if self.disc_state is not None:
            self.disc_state = replicate_to_mesh(self._mesh, self.disc_state)

        metrics = ["loss", "l1", "mse", "psnr", "graph_tv", "graph_lap_var"]
        if self.lpips is not None:
            metrics.append(self.lpips_tag)
        if self.use_gan:
            metrics += ["loss_D_fake", "loss_D_real", "loss_G"]
        self.train_metrics = MetricTracker(*metrics, writer=self.writer)
        self.valid_metrics = MetricTracker(*metrics, writer=self.writer)

    # ------------------------------------------------------------------
    def _example_graph(self):
        for g, _ in self.data_loader.val_loader:
            return g
        for g, _ in self.data_loader.train_loader:
            return g
        raise RuntimeError("No data available")

    def _to_images(self, flat):
        """[B*H*W, C] -> [B, H, W, C] (NHWC; the reference uses NCHW but the
        layout is internal to each branch)."""
        s = self.img_size
        return flat.reshape(-1, s, s, flat.shape[-1])

    def _valid_rows(self, graph):
        n = int(graph.levels[0].num_vertices)
        return n

    def _prep(self, graph):
        """Place a batch for the jitted steps: stacked sample axis (incl.
        the multi-host cross-host stitch) or the concatenated layout."""
        if self._stacked:
            from stinet_tpu.trainers.graph_common import place_stacked
            return place_stacked(self._mesh, graph)
        return place_graph_on_mesh(self._mesh, graph)

    def _local_images(self, composite, n_local):
        """This host's [b, s, s, 3] prediction images from a step's
        composite output in any layout (concat rows / stacked rows / dense
        images; global arrays reduced to the local block)."""
        s = self.img_size
        from stinet_tpu.parallel import multihost
        arr = multihost.host_local_block(composite)
        if arr.ndim == 4:                       # 2d branch: [B, s, s, 3]
            return arr[:n_local]
        if arr.ndim == 3:                       # stacked rows: [B, V, 3]
            return arr[:n_local, :s * s].reshape(-1, s, s, 3)
        return arr[:n_local * s * s].reshape(-1, s, s, 3)

    def _gt_images(self, graph):
        """Ground-truth [b, s, s, 3] images from a (host-local) batch."""
        s = self.img_size
        color = np.asarray(graph.color)
        if color.ndim == 3:                     # stacked: [B, V, 3]
            return color[:, :s * s].reshape(-1, s, s, 3)
        return color[:graph.num_graphs * s * s].reshape(-1, s, s, 3)

    def _require_random_optin(self, what, key):
        """Fail closed: running a perceptual network with random weights
        requires trainer.allow_random_features — a random-feature FID/VGG/
        LPIPS number looks real in TensorBoard otherwise (the reference
        always loads real pretrained weights, models/inception.py:13,
        models/losses/vgg16.py:15-22)."""
        if not self.allow_random_features:
            raise ValueError(
                f"{what} is enabled but trainer.{key} is not set. Either "
                f"point trainer.{key} at a converted torch state-dict file, "
                "or explicitly set trainer.allow_random_features=true to "
                "run with randomly initialized features (emitted scalars "
                "will be tagged *_random_features).")
        self.logger.warning(
            "%s running with RANDOM features (trainer.%s not set): values "
            "are relative trends only, tagged *_random_features", what, key)

    def _setup_vgg(self, tcfg):
        """Build the VGG16 perceptual loss; pretrained torchvision weights
        are converted from `trainer.vgg_weights` (a torch state-dict file)
        when given; without them random features require an explicit
        allow_random_features opt-in."""
        import jax as _jax
        from stinet_tpu.models.vgg import (
            VGG16Features, VGGLoss, convert_torch_vgg16)
        path = tcfg.get("vgg_weights")
        module = VGG16Features()
        if path:
            if path.endswith(".msgpack"):
                from stinet_tpu.utils.convert_perceptual_weights import (
                    load_msgpack)
                variables = load_msgpack(path)
            else:
                import torch
                sd = torch.load(path, map_location="cpu")
                variables = convert_torch_vgg16(sd)
        else:
            self._require_random_optin("use_vgg", "vgg_weights")
            x = jnp.zeros((1, self.img_size, self.img_size, 3))
            variables = module.init(_jax.random.key(0), x)
        return VGGLoss(variables,
                       resize_to=int(tcfg.get("vgg_resize", 224)))

    def _setup_fid(self, tcfg):
        import jax as _jax
        from stinet_tpu.metrics.fid import FIDScoreCumulative
        from stinet_tpu.models.inception import (
            InceptionV3, convert_torch_state_dict)
        model = InceptionV3()
        path = tcfg.get("inception_weights")
        if path:
            if path.endswith(".msgpack"):
                from stinet_tpu.utils.convert_perceptual_weights import (
                    load_msgpack)
                variables = load_msgpack(path)
            else:
                import torch
                variables = convert_torch_state_dict(
                    torch.load(path, map_location="cpu"))
        else:
            self._require_random_optin("FID", "inception_weights")
            self._fid_tag = "fid_random_features"
            x = jnp.zeros((1, 32, 32, 3))
            variables = model.init(_jax.random.key(0), x)
        feature_fn = _jax.jit(
            lambda imgs: model.apply(variables, imgs / 2.0 + 0.5))
        return FIDScoreCumulative(feature_fn=feature_fn)

    def _setup_lpips(self, tcfg):
        from stinet_tpu.metrics.lpips import (
            LPIPS, convert_torch_lpips, random_lpips)
        path = tcfg.get("lpips_weights")
        if path:
            if path.endswith(".msgpack"):
                from stinet_tpu.utils.convert_perceptual_weights import (
                    load_msgpack)
                tree = load_msgpack(path)
                lins = list(tree.get("lins", [])) or None
                return LPIPS(tree["variables"], lins)
            import torch
            sd = torch.load(path, map_location="cpu")
            if isinstance(sd, dict) and "alex" in sd:
                variables, lins = convert_torch_lpips(
                    sd["alex"], sd.get("lins"))
            else:
                variables, lins = convert_torch_lpips(sd, sd)
            return LPIPS(variables, lins)
        self._require_random_optin("use_lpips", "lpips_weights")
        self.lpips_tag = "lpips_random_features"
        return random_lpips(img_size=self.img_size)

    def _perceptual_terms(self, composite_img, color_img):
        """Optional VGG content/style + TV terms shared by both branches
        (reference _compute_graph_loss/_compute_2d_loss,
        inpainting2d_trainer.py:203-245)."""
        extra = 0.0
        if self.vgg_loss is not None:
            content, style = self.vgg_loss(composite_img, color_img)
            extra = extra + self.vgg_content_weight * content \
                + self.vgg_style_weight * style
            if self.use_total_variation:
                extra = extra + total_variation_loss(
                    composite_img, self.total_variation_weight)
        elif self.use_total_variation:
            extra = extra + total_variation_loss(
                composite_img, self.total_variation_weight)
        return extra

    # --------------------------- graph branch --------------------------
    def _make_graph_steps(self):
        model, tx = self.model, self.tx
        img_size = self.img_size

        def to_img(flat, c):
            return flat.reshape(-1, img_size, img_size, c)

        def loss_fn(params, graph, train):
            out = model.apply({"params": params}, graph, train=train)
            composite = jnp.where(graph.mask > 0, out, graph.color)
            n = graph.num_graphs * img_size * img_size
            loss = jnp.mean(jnp.abs(composite[:n] - graph.color[:n]))
            loss = loss + self._perceptual_terms(
                to_img(composite[:n], 3), to_img(graph.color[:n], 3))
            return loss, composite

        def train_step(state, graph, lr):
            (loss, composite), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, graph, True)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=params, opt_state=opt_state,
                                      step=state.step + 1)
            return new_state, self._graph_metrics(composite, graph, loss)

        def eval_step(state, graph):
            loss, composite = loss_fn(state.params, graph, False)
            return self._graph_metrics(composite, graph, loss), composite

        return (jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step))

    def _graph_metrics(self, composite, graph, loss):
        lvl0 = graph.levels[0]
        vmask = lvl0.vertex_mask()
        out = {
            "loss": loss,
            "l1": gm.l1(composite, graph.color, vmask),
            "mse": gm.mse(composite, graph.color, vmask),
            "psnr": gm.psnr(composite, graph.color, vmask, data_range=2.0),
        }
        out["graph_tv"], out["graph_lap_var"] = gm.graph_tv_and_lap_var(
            composite, lvl0.edges, lvl0.num_vertices)
        if self.lpips is not None:
            n = graph.num_graphs * self.img_size * self.img_size
            out[self.lpips_tag] = jnp.mean(self.lpips(
                self._to_images(composite[:n]),
                self._to_images(graph.color[:n])))
        return out

    # ------------------------ stacked graph branch ---------------------
    def _make_stacked_graph_steps(self, mesh):
        """Scan-over-samples steps for STACKED image-graph batches (the
        multi-host layout; mirrors graph_common.make_stacked_inpainting_
        steps). The combine is EXACT for the loss: every sample has the
        same pixel count, so the concatenated batch mean over B*H*W equals
        the mean of per-sample means, and the perceptual terms (VGG
        content/style, TV) are per-image means. Documented deviation
        (same as the 3D stacked trainer): PSNR/graph_lap_var pool
        per-sample then average."""
        model = self.model
        tx = self.tx
        img_size = self.img_size

        def to_img(flat, c):
            return flat.reshape(-1, img_size, img_size, c)

        def scene_loss(params, graph, train):
            out = model.apply({"params": params}, graph, train=train)
            composite = jnp.where(graph.mask > 0, out, graph.color)
            n = img_size * img_size
            loss = jnp.mean(jnp.abs(composite[:n] - graph.color[:n]))
            loss = loss + self._perceptual_terms(
                to_img(composite[:n], 3), to_img(graph.color[:n], 3))
            return loss, composite

        def local_grads(params, sgraph):
            zero = (jax.tree.map(jnp.zeros_like, params), jnp.float32(0.0))

            def body(carry, graph):
                gsum, lsum = carry
                (loss, composite), grads = jax.value_and_grad(
                    scene_loss, has_aux=True)(params, graph, True)
                m = self._graph_metrics(composite, graph, loss)
                return (jax.tree.map(jnp.add, gsum, grads),
                        lsum + loss), (composite, m)

            (gsum, lsum), (composite, ms) = jax.lax.scan(body, zero, sgraph)
            b = jnp.float32(composite.shape[0])
            msums = jax.tree.map(jnp.sum, ms)
            return gsum, lsum, b, msums, composite

        def local_eval(params, sgraph):
            def body(graph):
                loss, composite = scene_loss(params, graph, False)
                return composite, self._graph_metrics(composite, graph,
                                                      loss), loss

            composite, ms, losses = jax.lax.map(body, sgraph)
            return (jnp.sum(losses), jnp.float32(composite.shape[0]),
                    jax.tree.map(jnp.sum, ms), composite)

        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            ax = mesh.axis_names[0]

            def _psum_tree(t):
                return jax.tree.map(lambda x: jax.lax.psum(x, ax), t)

            def _grads_shard(params, sgraph):
                gsum, lsum, b, msums, composite = local_grads(params, sgraph)
                return (_psum_tree(gsum), jax.lax.psum(lsum, ax),
                        jax.lax.psum(b, ax), _psum_tree(msums), composite)

            def _eval_shard(params, sgraph):
                lsum, b, msums, composite = local_eval(params, sgraph)
                return (jax.lax.psum(lsum, ax), jax.lax.psum(b, ax),
                        _psum_tree(msums), composite)

            batch_grads = shard_map(
                _grads_shard, mesh=mesh, in_specs=(P(), P(ax)),
                out_specs=(P(), P(), P(), P(), P(ax)), check_vma=False)
            batch_eval = shard_map(
                _eval_shard, mesh=mesh, in_specs=(P(), P(ax)),
                out_specs=(P(), P(), P(), P(ax)), check_vma=False)
        else:
            batch_grads = local_grads

            def batch_eval(params, sgraph):
                return local_eval(params, sgraph)

        def _combine(lsum, b, msums):
            out = {k: v / b for k, v in msums.items()}
            out["loss"] = lsum / b
            return out

        def train_step(state, sgraph, lr):
            gsum, lsum, b, msums, composite = batch_grads(state.params,
                                                          sgraph)
            grads = jax.tree.map(lambda g: g / b, gsum)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=params, opt_state=opt_state,
                                      step=state.step + 1)
            return new_state, _combine(lsum, b, msums)

        def eval_step(state, sgraph):
            lsum, b, msums, composite = batch_eval(state.params, sgraph)
            return _combine(lsum, b, msums), composite

        return (jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step))

    # ----------------------------- 2d branch ---------------------------
    def _make_2d_steps(self):
        model, tx = self.model, self.tx
        img_size = self.img_size

        def to_img(flat, c):
            return flat.reshape(-1, img_size, img_size, c)

        def loss_fn(params, graph, train):
            b = graph.num_graphs
            n = b * img_size * img_size
            x = to_img(graph.x[:n], graph.x.shape[-1])
            color = to_img(graph.color[:n], 3)
            mask = to_img(graph.mask[:n], 1)
            out = model.apply({"params": params}, x, train=train)
            composite = jnp.where(mask > 0, out, color)
            loss = jnp.mean(jnp.abs(composite - color))
            loss = loss + self._perceptual_terms(composite, color)
            return loss, composite

        def train_step(state, graph, lr):
            (loss, composite), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, graph, True)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=params, opt_state=opt_state,
                                      step=state.step + 1)
            return new_state, self._image_metrics(composite, graph, loss)

        def eval_step(state, graph):
            loss, composite = loss_fn(state.params, graph, False)
            return self._image_metrics(composite, graph, loss), composite

        return (jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step))

    def _image_metrics(self, composite, graph, loss):
        b = graph.num_graphs
        n = b * self.img_size * self.img_size
        return self._image_metrics_from(composite,
                                        self._to_images(graph.color[:n]),
                                        loss)

    def _image_metrics_from(self, composite, color_img, loss):
        """Per-batch image metrics from dense [B, H, W, C] tensors (shared
        by the concatenated and stacked 2d layouts)."""
        flat = composite.reshape(-1, 3)
        color = color_img.reshape(-1, 3)
        mse = jnp.mean((flat - color) ** 2)
        out = {
            "loss": loss,
            "l1": jnp.mean(jnp.abs(flat - color)),
            "mse": mse,
            "psnr": -10.0 * jnp.log10(mse / 4.0 + 1e-8),
            "graph_tv": jnp.zeros(()),
            "graph_lap_var": jnp.zeros(()),
        }
        if self.lpips is not None:
            out[self.lpips_tag] = jnp.mean(self.lpips(composite, color_img))
        return out

    def _make_stacked_2d_steps(self):
        """2d-branch steps on STACKED batches: the [B, V, C] feature
        leaves reshape to dense [B, H, W, C] images inside jit. With the
        sample axis sharded over the data mesh (incl. cross-host global
        arrays, place_stacked_graph), GSPMD computes global batch means —
        numerics identical to the concatenated layout (same pixels, same
        reductions), no shard_map needed."""
        model, tx = self.model, self.tx

        def loss_fn(params, g, train):
            x, color, mask = self._stacked_images(g)
            out = model.apply({"params": params}, x, train=train)
            composite = jnp.where(mask > 0, out, color)
            loss = jnp.mean(jnp.abs(composite - color))
            loss = loss + self._perceptual_terms(composite, color)
            return loss, (composite, color)

        def train_step(state, g, lr):
            (loss, (composite, color)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, g, True)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=params, opt_state=opt_state,
                                      step=state.step + 1)
            return new_state, self._image_metrics_from(composite, color,
                                                       loss)

        def eval_step(state, g):
            loss, (composite, color) = loss_fn(state.params, g, False)
            return self._image_metrics_from(composite, color,
                                            loss), composite

        return (jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step))

    def _stacked_images(self, g):
        """[B, V, C] stacked feature leaves -> dense [B, H, W, C] images
        (valid rows are a per-sample prefix of length H*W)."""
        s = self.img_size
        n = s * s
        return (g.x[:, :n].reshape(-1, s, s, g.x.shape[-1]),
                g.color[:, :n].reshape(-1, s, s, 3),
                g.mask[:, :n].reshape(-1, s, s, 1))

    def _make_stacked_gan_step(self):
        """Conditional PatchGAN D/G alternation on STACKED batches: same
        alternation as _make_gan_step over dense images extracted from the
        stacked leaves; global arrays make the same jitted program correct
        multi-host (D and G losses are global batch means)."""
        disc = self.disc
        tx, dtx = self.tx, self.disc_tx
        gm_mode = self.gan_mode
        model = self.model

        def gan_step(state, dstate, g, lr):
            x, color, mask = self._stacked_images(g)
            prior = jnp.concatenate([color * (1 - (mask > 0)), mask], -1)

            def g_out(params):
                out = model.apply({"params": params}, x, train=True)
                return jnp.where(mask > 0, out, color)

            fake = jax.lax.stop_gradient(g_out(state.params))

            def d_loss_fn(dparams):
                pf = disc.apply({"params": dparams},
                                jnp.concatenate([prior, fake], -1),
                                train=True)
                pr = disc.apply({"params": dparams},
                                jnp.concatenate([prior, color], -1),
                                train=True)
                lf = gan_loss(pf, False, gm_mode)
                lr_ = gan_loss(pr, True, gm_mode)
                acc_f = jnp.mean(1.0 - jax.nn.sigmoid(pf))
                acc_r = jnp.mean(jax.nn.sigmoid(pr))
                return (lf + lr_) * 0.5, (lf, lr_, acc_f, acc_r)

            (dl, (lf, lr_, acc_f, acc_r)), dgrads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(dstate.params)
            dupd, dopt = dtx.update(dgrads, dstate.opt_state, dstate.params)
            dupd = jax.tree.map(lambda u: u * lr, dupd)
            dparams = optax.apply_updates(dstate.params, dupd)
            dstate = dstate.replace(params=dparams, opt_state=dopt,
                                    step=dstate.step + 1)

            def g_loss_fn(params):
                fake = g_out(params)
                loss = jnp.mean(jnp.abs(fake - color))
                if self.use_total_variation:
                    loss = loss + total_variation_loss(
                        fake, self.total_variation_weight)
                pf = disc.apply({"params": dstate.params},
                                jnp.concatenate([prior, fake], -1),
                                train=True)
                lg = gan_loss(pf, True, gm_mode)
                return loss + self.gan_loss_weight * lg, (fake, lg)

            (gl, (fake, lg)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.params)
            upd, opt = tx.update(grads, state.opt_state, state.params)
            upd = jax.tree.map(lambda u: u * lr, upd)
            params = optax.apply_updates(state.params, upd)
            state = state.replace(params=params, opt_state=opt,
                                  step=state.step + 1)

            metrics = self._image_metrics_from(fake, color, gl)
            metrics.update({"loss_D_fake": lf, "loss_D_real": lr_,
                            "loss_G": lg, "accuracy_D_fake": acc_f,
                            "accuracy_D_real": acc_r})
            return state, dstate, metrics

        return jax.jit(gan_step, donate_argnums=(0, 1))

    def _make_gan_step(self):
        model, disc = self.model, self.disc
        tx, dtx = self.tx, self.disc_tx
        img_size = self.img_size
        gm_mode = self.gan_mode

        def to_img(flat, c):
            return flat.reshape(-1, img_size, img_size, c)

        def gan_step(state, dstate, graph, lr):
            b = graph.num_graphs
            n = b * img_size * img_size
            x = to_img(graph.x[:n], graph.x.shape[-1])
            color = to_img(graph.color[:n], 3)
            mask = to_img(graph.mask[:n], 1)
            prior = jnp.concatenate([color * (1 - (mask > 0)), mask], -1)

            def g_out(params):
                out = model.apply({"params": params}, x, train=True)
                return jnp.where(mask > 0, out, color)

            # --- D step (fake detached == stop_gradient through G)
            fake = jax.lax.stop_gradient(g_out(state.params))

            def d_loss_fn(dparams):
                pf = disc.apply({"params": dparams},
                                jnp.concatenate([prior, fake], -1),
                                train=True)
                pr = disc.apply({"params": dparams},
                                jnp.concatenate([prior, color], -1),
                                train=True)
                lf = gan_loss(pf, False, gm_mode)
                lr_ = gan_loss(pr, True, gm_mode)
                acc_f = jnp.mean(1.0 - jax.nn.sigmoid(pf))
                acc_r = jnp.mean(jax.nn.sigmoid(pr))
                return (lf + lr_) * 0.5, (lf, lr_, acc_f, acc_r)

            (dl, (lf, lr_, acc_f, acc_r)), dgrads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(dstate.params)
            dupd, dopt = dtx.update(dgrads, dstate.opt_state, dstate.params)
            dupd = jax.tree.map(lambda u: u * lr, dupd)
            dparams = optax.apply_updates(dstate.params, dupd)
            dstate = dstate.replace(params=dparams, opt_state=dopt,
                                    step=dstate.step + 1)

            # --- G step (D frozen)
            def g_loss_fn(params):
                fake = g_out(params)
                loss = jnp.mean(jnp.abs(fake - color))
                if self.use_total_variation:
                    loss = loss + total_variation_loss(
                        fake, self.total_variation_weight)
                pf = disc.apply({"params": dstate.params},
                                jnp.concatenate([prior, fake], -1),
                                train=True)
                lg = gan_loss(pf, True, gm_mode)
                return loss + self.gan_loss_weight * lg, (fake, lg)

            (gl, (fake, lg)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.params)
            upd, opt = tx.update(grads, state.opt_state, state.params)
            upd = jax.tree.map(lambda u: u * lr, upd)
            params = optax.apply_updates(state.params, upd)
            state = state.replace(params=params, opt_state=opt,
                                  step=state.step + 1)

            metrics = self._image_metrics(fake, graph, gl)
            metrics.update({"loss_D_fake": lf, "loss_D_real": lr_,
                            "loss_G": lg, "accuracy_D_fake": acc_f,
                            "accuracy_D_real": acc_r})
            return state, dstate, metrics

        return jax.jit(gan_step, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def _train_epoch(self, epoch):
        from stinet_tpu.trainers.inpainting3d import check_nan_in_params
        check_nan_in_params(self.state.params, self.logger)
        self.train_metrics.reset()
        lr = jnp.float32(self.lr_fn(epoch))
        loader = self.data_loader.train_loader
        len_epoch = len(loader)
        for batch_idx, (graph, names) in enumerate(loader):
            self.writer.set_step((epoch - 1) * len_epoch + batch_idx)
            if self.profiler is not None:
                self.profiler.step()
            graph = self._prep(graph)
            if self.use_gan:
                self.state, self.disc_state, metrics = self._gan_step(
                    self.state, self.disc_state, graph, lr)
            else:
                self.state, metrics = self._train_step(self.state, graph, lr)
            m = host_metrics(metrics)
            for k, v in m.items():
                self.train_metrics.update(k, v)
            if batch_idx % self.batches_per_log == 0:
                self.logger.debug(
                    ":Train Epoch: %s %s I Loss: %.6f", epoch,
                    self._progress(batch_idx, len_epoch), m["loss"])
        self.writer.set_step(epoch - 1, "epoch_train", quiet=True)
        log = self.train_metrics.result(write=True)
        log["lr"] = float(lr)
        if (self._fid is not None and self.use_train_fid
                and epoch % self.epochs_per_fid == 0):
            log["train_" + self._fid_tag] = self._train_fid()
        if self.do_validation:
            val_log = self._valid_epoch(epoch)
            log.update(**{"val_" + k: v for k, v in val_log.items()})
        return log

    def _train_fid(self):
        """FID of predictions vs GT over the fixed train sample subset
        (reference per-epochs_per_fid train FID sessions,
        inpainting2d_trainer.py:310-313,414-422)."""
        self._fid.reset("train_pred")
        n_img = self.img_size * self.img_size
        first = self._fid.num_samples("train_gt") == 0
        for graph, names in self.data_loader.sample_train_loader:
            _, composite = self._eval_step(self.state, self._prep(graph))
            imgs = self._local_images(composite, len(names))
            self._fid.add_images("train_pred", imgs)
            if first:
                self._fid.add_images("train_gt", self._gt_images(graph))
        if first:
            self._fid.freeze_statistics("train_gt")
        fid = self._fid.fid_between("train_gt", "train_pred")
        self.writer.add_scalar("train_" + self._fid_tag, fid)
        return fid

    def _valid_epoch(self, epoch):
        self.valid_metrics.reset()
        loader = self.data_loader.val_loader
        fid_epoch = (self._fid is not None and epoch > 0
                     and epoch % self.epochs_per_fid == 0)
        if fid_epoch:
            self._fid.reset("val_pred")
        n_img = self.img_size * self.img_size
        for batch_idx, (graph, names) in enumerate(loader):
            self.writer.set_step(batch_idx, "valid")
            metrics, composite = self._eval_step(self.state,
                                                 self._prep(graph))
            for k, v in host_metrics(metrics).items():
                self.valid_metrics.update(k, v)
            if fid_epoch:
                b = len(names)
                imgs = self._local_images(composite, b)
                self._fid.add_images("val_pred", imgs)
                if self._fid.num_samples("val_gt") < b * (batch_idx + 1):
                    self._fid.add_images("val_gt", self._gt_images(graph))
        self.writer.set_step(epoch - 1, "epoch_valid", quiet=True)
        log = self.valid_metrics.result(write=True)
        if fid_epoch and self._fid.num_samples("val_pred"):
            log[self._fid_tag] = self._fid.fid_between("val_gt", "val_pred")
            self.writer.add_scalar(self._fid_tag, log[self._fid_tag])
        if self.visualize_samples and self.writer.writer is not None:
            self._visualize_select_data(epoch)
        return log

    def _visualize_select_data(self, epoch):
        """Prediction grids of the fixed sample batches to TB (reference
        _visualize_select_data, inpainting2d_trainer.py:529-577)."""
        from stinet_tpu.utils.visualization_utils import visualize_tensor
        n_img = self.img_size * self.img_size
        for tag, loader in (("sample_train",
                             self.data_loader.sample_train_loader),
                            ("sample_val",
                             self.data_loader.sample_val_loader)):
            preds = []
            for graph, names in loader:
                _, composite = self._eval_step(self.state,
                                               self._prep(graph))
                preds.append(self._local_images(composite, len(names)))
            if preds:
                imgs = np.concatenate(preds)[:8] / 2.0 + 0.5
                visualize_tensor(self.writer, f"predictions_{tag}", imgs)

    def _eval(self, mode):
        log = self._valid_epoch(0)
        for key, value in log.items():
            self.logger.info("    %-15s: %s", str(key), value)

    # ------------------------------------------------------------------
    def _state_save(self, epoch, path):
        models = {self.branch: self.state.params}
        opts = {self.branch: self.state.opt_state}
        if self.disc_state is not None:
            models["discriminator"] = self.disc_state.params
            opts["discriminator"] = self.disc_state.opt_state
        save_checkpoint(path, models=models, opt_states=opts, epoch=epoch,
                        monitor_best=self.mnt_best,
                        config=self.config.config)

    def _save_checkpoint(self, epoch):
        self._state_save(
            epoch, str(self.checkpoint_dir / f"checkpoint-epoch{epoch}.ckpt"))

    def _save_best(self, epoch):
        self._state_save(epoch, str(self.checkpoint_dir / "model_best.ckpt"))

    def _resume_checkpoint(self, resume_path):
        models_t = {self.branch: self.state.params}
        opts_t = {self.branch: self.state.opt_state}
        if self.disc_state is not None:
            models_t["discriminator"] = self.disc_state.params
            opts_t["discriminator"] = self.disc_state.opt_state
        models, opts, _, meta = load_checkpoint(resume_path, models_t, opts_t)
        self.state = self.state.replace(params=models[self.branch],
                                        opt_state=opts[self.branch])
        if self.disc_state is not None and "discriminator" in models:
            self.disc_state = self.disc_state.replace(
                params=models["discriminator"],
                opt_state=opts["discriminator"])
        self.start_epoch = meta["epoch"] + 1
        self.mnt_best = meta["monitor_best"]
