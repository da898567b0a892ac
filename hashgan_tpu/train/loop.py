"""Experiment orchestration: the reference's ``main.py`` training driver
(SURVEY.md C14) rebuilt around device-resident jitted steps.

Stage I  (``train_gan``):     PC-WGAN cycles (5 critic + 1 gen per jit call)
Stage II (``train_encoder``): hash encoder on real ∪ synthetic images
Eval     (``evaluate``):      encode -> pack -> Pallas Hamming scan -> MAP@R,
                              P@H<=2, PR curves (device-side, oracle-tested)
Index    (``build_index``):   persistable packed gallery artifact

Periodic work mirrors the reference loop: metric flushes (C17), sample image
grids (C18), orbax checkpoints with step-seeded data replay (C21/§5).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hashgan_tpu.configs import Config
from hashgan_tpu.data import make_splits
from hashgan_tpu.data.device_data import make_batch_feed
from hashgan_tpu.index import PackedGallery, build_gallery
from hashgan_tpu.models import Discriminator, Generator, build_encoder
from hashgan_tpu.ops.pack import pack_codes
from hashgan_tpu.parallel import make_mesh, replicate, shard_batch
from hashgan_tpu.train.gan_step import make_gan_cycle, make_sample_fn
from hashgan_tpu.train.hash_step import (
    encode_dataset,
    make_encode_fn,
    make_encoder_train_step,
)
from hashgan_tpu.train.state import (
    create_encoder_state,
    create_gan_state,
)
from hashgan_tpu.utils import CheckpointManager, MetricsLogger, save_image_grid


class Experiment:
    def __init__(self, cfg: Config, workdir: Optional[str] = None,
                 use_mesh: bool = True):
        self.cfg = cfg
        self.workdir = workdir or cfg.train.workdir
        os.makedirs(self.workdir, exist_ok=True)
        self.logger = MetricsLogger(self.workdir)
        self.splits = make_splits(cfg.data)
        d = cfg.data
        self.image_shape = (d.image_size, d.image_size, d.channels)
        dtype = jnp.bfloat16 if cfg.encoder.compute_dtype == "bfloat16" else jnp.float32
        gdtype = jnp.bfloat16 if cfg.gan.compute_dtype == "bfloat16" else jnp.float32

        self.mesh = make_mesh(cfg.mesh.n_devices) if use_mesh else None
        self.encoder = build_encoder(
            cfg.encoder.arch, cfg.encoder.bits, dtype=dtype,
            input_resize=cfg.encoder.input_resize,
        )
        # Encoder params must be initialized at the post-geometry input size
        # (fc6's flatten dim depends on it — the bvlc 227 protocol).
        enc_size = cfg.encoder.input_resize or d.image_size
        self.encoder_input_shape = (enc_size, enc_size, d.channels)
        self.generator = Generator(
            image_size=d.image_size, n_labels=d.n_classes, dim=cfg.gan.dim,
            out_channels=d.channels, dtype=gdtype,
            width_mults=cfg.gan.g_width_mults,
            cond_label_norm=cfg.gan.cond_label_norm,
        )
        self.discriminator = Discriminator(
            image_size=d.image_size, n_labels=d.n_classes, dim=cfg.gan.dim,
            dtype=gdtype, use_layernorm=cfg.gan.d_layernorm,
            width_mults=cfg.gan.d_width_mults,
            projection=cfg.gan.d_projection,
        )

        rng = jax.random.key(cfg.train.seed)
        r_enc, r_gan, self._rng_seed = jax.random.split(rng, 3)
        self.encoder_state = create_encoder_state(
            r_enc, self.encoder, cfg.encoder, self.encoder_input_shape
        )
        self.gan_state = (
            create_gan_state(
                r_gan, self.generator, self.discriminator, cfg.gan,
                self.image_shape, d.n_classes,
            )
            if cfg.use_gan
            else None
        )
        if self.mesh is not None:
            self.encoder_state = replicate(self.mesh, self.encoder_state)
            if self.gan_state is not None:
                self.gan_state = replicate(self.mesh, self.gan_state)

        self._gan_cycle = (
            make_gan_cycle(self.generator, self.discriminator, cfg)
            if cfg.use_gan
            else None
        )
        self._sample = (
            make_sample_fn(self.generator, cfg) if cfg.use_gan else None
        )
        self._enc_uses_gan = cfg.use_gan and cfg.train.use_gan_samples
        self._enc_step = make_encoder_train_step(
            self.encoder, cfg,
            generator=self.generator if self._enc_uses_gan else None,
        )
        self._enc_step_nogan = None  # built lazily by the stage-II guard
        self._encode = make_encode_fn(self.encoder, cfg)
        self._resident_encoders = {}  # split -> ResidentEncoder (device_data)
        self.ckpt = CheckpointManager(self.workdir)

    # ------------------------------------------------------------------
    # Stage I: PC-WGAN
    # ------------------------------------------------------------------
    def train_gan(self, iters: Optional[int] = None) -> Dict[str, float]:
        assert self.cfg.use_gan and self.gan_state is not None
        cfg = self.cfg
        iters = iters if iters is not None else cfg.gan.iters
        n_batches = cfg.gan.n_critic + 1
        rng = self._rng_seed
        means: Dict[str, float] = {}

        # Feed: device-resident in-jit gather (cfg.train.device_data — no
        # per-step wire traffic or host gather) or double-buffered
        # host->device prefetch (the rebuild's answer to the reference's
        # per-step feed_dict stall; data/pipeline.py, data/device_data.py).
        sharding = None
        if self.mesh is not None:
            # batch dim 1 is the per-device batch: shard it.
            sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(None, "data")
            )
        # Host-side step mirror: device_get forces a host<->device round
        # trip, which on a remote-tunnel platform costs ~100ms — syncing
        # every step would reintroduce the reference's feed_dict boundary.
        # Steps are enqueued asynchronously; sync only at log points.
        host_step = int(jax.device_get(self.gan_state.step))

        def boundaries(metrics):
            nonlocal means
            if host_step % self.cfg.train.log_every == 0:
                self.logger.log(host_step, jax.device_get(metrics))
                means = self.logger.flush(host_step)
            if host_step % self.cfg.train.sample_every == 0:
                self.dump_samples(host_step)
                self.logger.log(host_step, self.sample_quality())
            if host_step % self.cfg.train.checkpoint_every == 0:
                self.save_checkpoint()

        if cfg.train.device_data:
            # Fused multi-cycle windows (see train_encoder): fetch + fused
            # critic/gen cycle under one lax.scan dispatch per log window.
            import math

            from hashgan_tpu.data.device_data import DeviceBatchSource

            src = DeviceBatchSource(
                self.splits["train"], cfg.train.batch_size,
                seed=cfg.train.seed, epoch_shuffle=cfg.train.epoch_shuffle,
                n_batches=n_batches, sharding=sharding, mesh=self.mesh,
            )
            window = max(1, math.gcd(
                math.gcd(cfg.train.log_every, cfg.train.sample_every),
                cfg.train.checkpoint_every,
            ))
            fetch = src._fetch
            gan_cycle = self._gan_cycle

            def multi(state, images, labels, step0, rng_):
                def body(st, i):
                    imgs, labs = fetch(images, labels, step0 + i)
                    return gan_cycle(st, imgs, labs, rng_)

                state, ms = jax.lax.scan(
                    body, state, jnp.arange(window, dtype=jnp.int32)
                )
                return state, jax.tree_util.tree_map(
                    lambda x: jnp.mean(x, axis=0), ms
                )

            fused = jax.jit(multi, donate_argnums=(0,))
            done = 0
            while done < iters:
                w = min(window - host_step % window, iters - done)
                if w == window:
                    self.gan_state, metrics = fused(
                        self.gan_state, src.images, src.labels,
                        np.int32(host_step), rng,
                    )
                    host_step += w
                    done += w
                else:  # ragged prefix/suffix: per-cycle through the feed
                    for _ in range(w):
                        imgs, labs = src.batch(host_step)
                        self.gan_state, metrics = gan_cycle(
                            self.gan_state, imgs, labs, rng
                        )
                        host_step += 1
                        done += 1
                boundaries(metrics)
            return means

        batches = make_batch_feed(
            self.splits["train"], cfg,
            start_step=host_step,
            seed=cfg.train.seed, n_batches=n_batches, mesh=self.mesh,
            batch_sharding=sharding,
        )
        for _ in range(iters):
            batch = next(batches)
            self.gan_state, metrics = self._gan_cycle(
                self.gan_state, batch[0], batch[1], rng
            )
            host_step += 1
            boundaries(metrics)
        return means

    def sample_quality(self) -> Dict[str, float]:
        """IS-style GAN health metrics (C19): via the critic's aux head
        (``*_aux``) and — on synthetic data, where class templates are
        known — via a FROZEN nearest-template classifier (``*_tmpl``) that
        is independent of anything being trained."""
        from hashgan_tpu.eval.sample_quality import (
            make_template_classifier,
            sample_quality_report,
        )

        gen = lambda z, l: self._sample(  # noqa: E731
            self.gan_state.g_params, self.gan_state.g_stats, z, l
        )
        common = dict(
            rng=jax.random.key(7),
            n_labels=self.cfg.data.n_classes,
            z_dim=self.cfg.gan.z_dim,
            n_samples=min(512, 8 * self.cfg.data.n_classes * 8),
            multi_label=self.cfg.data.multi_label,
        )
        report = sample_quality_report(
            gen,
            lambda x: self.discriminator.apply(
                {"params": self.gan_state.d_params}, x
            )[1],
            key_suffix="_aux",
            **common,
        )
        templates = getattr(self.splits["train"], "templates", None)
        if templates is not None:
            report.update(sample_quality_report(
                gen, make_template_classifier(templates),
                key_suffix="_tmpl", **common,
            ))
        return report

    def dump_samples(self, step: int) -> None:
        if self._sample is None:
            return
        k = self.cfg.data.n_classes
        n_per = max(1, 64 // k)
        labels = np.repeat(np.eye(k, dtype=np.float32), n_per, axis=0)[:64]
        z = jax.random.normal(jax.random.key(0), (labels.shape[0], self.cfg.gan.z_dim))
        if self.gan_state.g_ema is not None:
            # EMA weights pair with EMA-tracked BN stats: normalizing EMA
            # weights by the live net's statistics skews early-training grids.
            g_params = self.gan_state.g_ema
            g_stats = self.gan_state.g_ema_stats
        else:
            g_params = self.gan_state.g_params
            g_stats = self.gan_state.g_stats
        imgs = self._sample(g_params, g_stats, z, jnp.asarray(labels))
        save_image_grid(
            np.asarray(imgs), os.path.join(self.workdir, f"samples_{step}.png")
        )

    # ------------------------------------------------------------------
    # Stage II: hash encoder
    # ------------------------------------------------------------------
    def _stage2_guard(self):
        """Refuse to co-train F against an untrained generator.

        The reference's two-step workflow always loads the stage-1 checkpoint
        before step 2; running stage 2 fresh would mix fake_ratio noise
        images into every batch and quietly destroy MAP. If the GAN has never
        stepped: try restoring a checkpoint, else warn loudly and train on
        real images only. Returns (use_gan, step_fn)."""
        import warnings

        use_gan = self._enc_uses_gan and self.gan_state is not None
        if not use_gan:
            return False, self._enc_step
        if int(jax.device_get(self.gan_state.step)) == 0:
            if self.restore_checkpoint():
                pass  # stage-1 state recovered from the workdir
            if int(jax.device_get(self.gan_state.step)) == 0:
                warnings.warn(
                    "stage-II requested GAN sample augmentation but the "
                    "generator has never been trained and no checkpoint "
                    "exists; training the encoder on real images only. "
                    "Run stage 1 first (or pass --resume).",
                    stacklevel=2,
                )
                if self._enc_step_nogan is None:
                    self._enc_step_nogan = make_encoder_train_step(
                        self.encoder, self.cfg, generator=None
                    )
                return False, self._enc_step_nogan
        # With d_projection the critic score includes <V y, phi(x)>, so the
        # raw Wasserstein is inflated by the conditioning term (measured: a
        # converged projection stage-I logs W ~ 11 with W_noproj ~ 2.0);
        # judge health on the projection-free readout when it exists.
        w = self._last_logged("wasserstein_noproj")
        if w is None:
            w = self._last_logged("wasserstein")
        if w is not None and abs(w) > 10.0:
            # Measured twice (docs/BENCHMARKS.md scarce multi-label rows):
            # an unconverged stage-I (healthy runs settle |W| ~ 2-3) makes
            # fake-mixing strictly worse than encoder-only training.
            warnings.warn(
                f"stage-I looks unconverged (last Wasserstein {w:.1f}; "
                "healthy runs settle around 2-3): co-training on its "
                "samples measurably hurts MAP. Consider more stage-1 "
                "iters, or lowering train.fake_ratio / setting "
                "train.use_gan_samples=false.",
                stacklevel=2,
            )
        return True, self._enc_step

    def _saturation_guard(self, step: int, metrics) -> None:
        """Warn (once) when the hash tanh has saturated to exact +-1.

        Measured on-chip (round 2, docs/BENCHMARKS.md): from random init the
        reference's 10x hash-lr multiplier drives AlexNet's code layer to
        exact tanh saturation within ~100 steps — |code|=1 bit-for-bit, zero
        gradient, unrecoverable; the loss then stays frozen while the run
        burns its full budget. quantization == 0 together with
        code_abs_mean ~= 1 is that state (a healthy run keeps a small
        nonzero quantization gap throughout)."""
        if getattr(self, "_saturation_warned", False):
            return
        q = metrics.get("quantization")
        a = metrics.get("code_abs_mean")
        if q is None or a is None:
            return
        if float(q) < 1e-7 and float(a) > 0.9999:
            import warnings

            self._saturation_warned = True
            warnings.warn(
                f"hash codes are exactly saturated at step {step} "
                "(quantization ~ 0, |code| ~ 1): tanh gradients are zero and "
                "training cannot recover. From-scratch runs must use "
                "encoder.hash_lr_multiplier=1.0 (10x is the pretrained-"
                "protocol setting); restart stage II from init.",
                stacklevel=2,
            )

    def _last_logged(self, key: str):
        """Last value of ``key`` in this workdir's metrics.jsonl (None if
        absent) — lets stage II sanity-check stage-I health without
        widening the checkpointed state."""
        import json as _json

        path = os.path.join(self.workdir, "metrics.jsonl")
        try:
            val = None
            with open(path) as f:
                for line in f:
                    try:
                        rec = _json.loads(line)
                    except ValueError:
                        continue
                    if key in rec:
                        val = rec[key]
            return val
        except OSError:
            return None

    def train_encoder(
        self, iters: Optional[int] = None, eval_during: bool = True
    ) -> Dict[str, float]:
        cfg = self.cfg
        iters = iters if iters is not None else cfg.encoder.iters
        if (
            cfg.encoder.arch == "alexnet"
            and not cfg.encoder.pretrained_npy
            and cfg.encoder.hash_lr_multiplier != 1.0
            and int(jax.device_get(self.encoder_state.step)) == 0
        ):
            import warnings

            # Measured on-chip twice (rounds 2 and 3, docs/BENCHMARKS.md):
            # this combination saturates the hash tanh within ~100 steps.
            warnings.warn(
                "training AlexNet from random init with "
                f"hash_lr_multiplier={cfg.encoder.hash_lr_multiplier:g}: "
                "the 10x multiplier is the bvlc-pretrained protocol and "
                "drives from-scratch runs to exact tanh saturation (zero "
                "gradient) within ~100 steps. Set "
                "encoder.hash_lr_multiplier=1.0 or provide "
                "encoder.pretrained_npy.",
                stacklevel=2,
            )
        use_gan, step_fn = self._stage2_guard()
        rng = self._rng_seed
        means: Dict[str, float] = {}
        sharding = (
            jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("data")
            )
            if self.mesh is not None
            else None
        )
        host_step = int(jax.device_get(self.encoder_state.step))  # see train_gan

        def boundaries(metrics):
            nonlocal means
            if host_step % cfg.train.log_every == 0:
                host_metrics = jax.device_get(metrics)
                self._saturation_guard(host_step, host_metrics)
                self.logger.log(host_step, host_metrics)
                means = self.logger.flush(host_step)
            if eval_during and host_step % cfg.train.eval_every == 0:
                self.logger.log(host_step, self.evaluate())
                means = self.logger.flush(host_step)
            if host_step % cfg.train.checkpoint_every == 0:
                self.save_checkpoint()

        fused_src = None
        if cfg.train.device_data:
            from hashgan_tpu.data.device_data import DeviceBatchSource

            fused_src = DeviceBatchSource(
                self.splits["train"], cfg.train.batch_size,
                seed=cfg.train.seed + 1,
                epoch_shuffle=cfg.train.epoch_shuffle,
                pair_balanced=(cfg.train.pair_sampling == "balanced"),
                sharding=sharding, mesh=self.mesh,
            )
        if fused_src is not None:
            # Fused multi-step windows: device-resident batches compose with
            # the train step under ONE lax.scan dispatch per log window, so
            # per-step host cost (python dispatch + tunnel chatter on this
            # throttled single-vCPU host) amortizes away. Window = gcd of
            # the loop boundaries so every log/eval/checkpoint step count
            # stays reachable; metrics are window means.
            import math

            window = max(1, math.gcd(
                math.gcd(cfg.train.log_every, cfg.train.eval_every),
                cfg.train.checkpoint_every,
            ))
            fetch = fused_src._fetch
            gan_args = (
                (self.gan_state.g_params, self.gan_state.g_stats)
                if use_gan else ()
            )

            def multi(state, images, labels, step0, rng_, *g_args):
                def body(st, i):
                    imgs, labs = fetch(images, labels, step0 + i)
                    return step_fn(st, imgs, labs, rng_, *g_args)

                state, ms = jax.lax.scan(
                    body, state, jnp.arange(window, dtype=jnp.int32)
                )
                return state, jax.tree_util.tree_map(
                    lambda x: jnp.mean(x, axis=0), ms
                )

            fused = jax.jit(multi, donate_argnums=(0,))
            done = 0
            while done < iters:
                # realign to window boundaries, honor the iters budget
                w = min(window - host_step % window, iters - done)
                if w == window:
                    self.encoder_state, metrics = fused(
                        self.encoder_state, fused_src.images,
                        fused_src.labels, np.int32(host_step), rng, *gan_args,
                    )
                    host_step += w
                    done += w
                else:  # ragged prefix/suffix: per-step through the same feed
                    for _ in range(w):
                        imgs, labs = fused_src.batch(host_step)
                        self.encoder_state, metrics = step_fn(
                            self.encoder_state, imgs, labs, rng, *gan_args
                        )
                        host_step += 1
                        done += 1
                boundaries(metrics)
            return means

        batches = make_batch_feed(
            self.splits["train"], cfg,
            start_step=host_step,
            seed=cfg.train.seed + 1, mesh=self.mesh, batch_sharding=sharding,
            pair_balanced=(cfg.train.pair_sampling == "balanced"),
        )
        for _ in range(iters):
            batch = next(batches)
            if use_gan:
                self.encoder_state, metrics = step_fn(
                    self.encoder_state, batch[0], batch[1], rng,
                    self.gan_state.g_params, self.gan_state.g_stats,
                )
            else:
                self.encoder_state, metrics = step_fn(
                    self.encoder_state, batch[0], batch[1], rng
                )
            host_step += 1
            boundaries(metrics)
        return means

    # ------------------------------------------------------------------
    # Eval / index / query
    # ------------------------------------------------------------------
    def encode_split(self, split: str) -> np.ndarray:
        n = len(self.splits[split])
        shard = self.mesh is not None and n >= self.cfg.eval.encode_shard_min
        if self.cfg.train.device_data and not (shard and self.mesh.size > 1):
            # Device-resident encode (data/device_data.py::ResidentEncoder):
            # no per-batch wire traffic; cached per split so the jit (and
            # the HBM copy) is built once and reused across evals.
            enc = self._resident_encoders.get(split)
            if enc is None:
                from hashgan_tpu.data.device_data import ResidentEncoder

                enc = ResidentEncoder(
                    self._encode, self.splits[split],
                    batch_size=min(256, max(32, n)),
                )
                self._resident_encoders[split] = enc
            return enc(self.encoder_state.params)
        return encode_dataset(
            self._encode, self.encoder_state.params, self.splits[split],
            batch_size=min(256, max(32, n)),
            # shard the forward only where it pays: partitioned matmuls sum
            # in a different order (f32-rounding-level code differences), so
            # small splits stay single-device for strict determinism
            mesh=self.mesh if shard else None,
        )

    def build_index(self, save_path: Optional[str] = None) -> PackedGallery:
        codes = self.encode_split("database")
        gal = build_gallery(
            jnp.asarray(codes), self.splits["database"].labels,
            self.cfg.encoder.bits, mesh=self.mesh,
        )
        if save_path:
            gal.save(save_path)
        return gal

    def evaluate(
        self, streaming_threshold: int | None = None
    ) -> Dict[str, float]:
        """Hamming-ranking eval: exact MAP@R for small/medium galleries,
        tie-aware streaming MAP (eval/streaming.py) beyond
        ``streaming_threshold`` items (default cfg.eval.streaming_threshold);
        P@H<=r always exact; PR curve dumped to the workdir when
        cfg.eval.pr_curve.

        Under a multi-device mesh the gallery is sharded over the ``data``
        axis and both paths run the sharded engines (eval/sharded.py). The
        ranking/metric stage is bit-equal to single-device GIVEN identical
        codes; encoding itself shards for splits >=
        cfg.eval.encode_shard_min (encode_split),
        where partitioned matmuls change the f32 summation order — so
        end-to-end metrics on large splits are rounding-equal, not
        bit-equal."""
        import numpy as _np

        cfg = self.cfg
        if streaming_threshold is None:
            streaming_threshold = cfg.eval.streaming_threshold
        codes_q = self.encode_split("query")
        codes_db = self.encode_split("database")
        pq = pack_codes(jnp.asarray(codes_q))
        pg = pack_codes(jnp.asarray(codes_db))
        qlab = jnp.asarray(self.splits["query"].labels)
        dlab = jnp.asarray(self.splits["database"].labels)
        n_db = pg.shape[0]
        sharded = self.mesh is not None and self.mesh.size > 1
        if sharded:
            from hashgan_tpu.eval import shard_gallery_for_eval

            pg_t, dlab_pad, valid_n = shard_gallery_for_eval(
                self.mesh, _np.asarray(pg), _np.asarray(dlab)
            )
        if n_db <= streaming_threshold:
            if sharded:
                from hashgan_tpu.eval import (
                    sharded_map_at_r,
                    sharded_precision_at_radius,
                )

                m = float(sharded_map_at_r(
                    self.mesh, pq, pg_t, qlab, dlab_pad,
                    R=cfg.eval.R, valid_n=valid_n,
                ))
                p = float(sharded_precision_at_radius(
                    self.mesh, pq, pg_t, qlab, dlab_pad,
                    radius=cfg.eval.precision_radius, valid_n=valid_n,
                ))
            else:
                from hashgan_tpu.eval import (
                    device_map_at_r,
                    device_precision_at_radius,
                )

                m = float(device_map_at_r(pq, pg, qlab, dlab, R=cfg.eval.R))
                p = float(device_precision_at_radius(
                    pq, pg, qlab, dlab, radius=cfg.eval.precision_radius
                ))
            metrics = {f"map_at_{cfg.eval.R}": m,
                       f"precision_at_h{cfg.eval.precision_radius}": p}
            if cfg.eval.pr_curve:
                self._dump_pr_curve(pq, pg, qlab, dlab)
        else:
            from hashgan_tpu.eval import (
                device_distance_histograms,
                precision_at_radius_from_hist,
                pr_curve_from_hist,
                tie_aware_map,
            )

            if sharded:
                from hashgan_tpu.eval import sharded_distance_histograms

                n_hist, r_hist = sharded_distance_histograms(
                    self.mesh, pq, pg_t, qlab, dlab_pad, valid_n=valid_n
                )
            else:
                n_hist, r_hist = device_distance_histograms(
                    pq, pg.T, qlab, dlab
                )
            m = float(tie_aware_map(n_hist, r_hist, cfg.eval.R))
            p = float(precision_at_radius_from_hist(
                n_hist, r_hist, cfg.eval.precision_radius
            ))
            metrics = {f"map_at_{cfg.eval.R}_tie_aware": m,
                       f"precision_at_h{cfg.eval.precision_radius}": p}
            if cfg.eval.pr_curve:
                self._dump_curves(_np.asarray(n_hist), _np.asarray(r_hist))
        return metrics

    def _dump_pr_curve(self, pq, pg, qlab, dlab) -> None:
        from hashgan_tpu.eval import device_distance_histograms
        import numpy as _np

        n_hist, r_hist = device_distance_histograms(pq, pg.T, qlab, dlab)
        self._dump_curves(_np.asarray(n_hist), _np.asarray(r_hist))

    def _dump_curves(self, n_hist, r_hist) -> None:
        """Ranking-curve artifacts from distance histograms: the PR curve
        over Hamming radii (pr_curve.*) and the precision@top-N curve
        (precision_at_topn.* — the reference evaluator family's
        precision-vs-returned-count plot, SURVEY.md C16)."""
        from hashgan_tpu.eval.streaming import (
            pr_curve_from_hist,
            precision_at_topn_from_hist,
        )
        import numpy as _np

        prec, rec = pr_curve_from_hist(n_hist, r_hist)
        _np.savez(os.path.join(self.workdir, "pr_curve.npz"),
                  precision=prec, recall=rec)
        # log-spaced cutoffs 1..R (dense enough to plot, cheap to store)
        R = max(2, self.cfg.eval.R)
        topns = _np.unique(_np.round(
            _np.logspace(0.0, _np.log10(R), 64)).astype(_np.int64))
        p_topn = precision_at_topn_from_hist(n_hist, r_hist, topns)
        _np.savez(os.path.join(self.workdir, "precision_at_topn.npz"),
                  topn=topns, precision=p_topn)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for fname, xs, ys, xlabel, title, logx in (
                ("pr_curve.jpg", rec, prec, "recall",
                 f"{self.cfg.name} PR over Hamming radii", False),
                ("precision_at_topn.jpg", topns, p_topn, "top-N returned",
                 f"{self.cfg.name} precision@top-N", True),
            ):
                fig, ax = plt.subplots(figsize=(5, 4))
                ax.plot(xs, ys)
                if logx:
                    ax.set_xscale("log")
                ax.set_xlabel(xlabel)
                ax.set_ylabel("precision")
                ax.set_title(title)
                fig.tight_layout()
                fig.savefig(os.path.join(self.workdir, fname))
                plt.close(fig)
        except Exception:
            pass

    # ------------------------------------------------------------------
    # Checkpoint / resume
    # ------------------------------------------------------------------
    def _ckpt_state(self):
        state = {"encoder": self.encoder_state}
        if self.gan_state is not None:
            state["gan"] = self.gan_state
        return state

    def _data_provenance(self) -> str:
        """Identifier of the exact data bits this run trains on.

        Synthetic runs: the keyed generation id INCLUDING which generator
        ran (numpy vs device ``_dev1`` — distribution-equal, bit-different;
        data/synthetic.synth_generation_key). List-file/cifar runs: a
        CONTENT fingerprint (sha256 of the list file / sorted name+size of
        the cifar dir), so moving an identical dataset to a new mount still
        resumes, while editing the list in place at the same path is
        caught. Recorded beside checkpoints so a resume that would silently
        feed different data fails loudly instead."""
        import hashlib

        d = self.cfg.data
        if d.cifar10_dir:
            h = hashlib.sha256()
            for name in sorted(os.listdir(d.cifar10_dir)):
                sz = os.path.getsize(os.path.join(d.cifar10_dir, name))
                h.update(f"{name}:{sz};".encode())
            return f"cifar10:{h.hexdigest()[:16]}"
        if d.train_list:
            with open(d.train_list, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
            return f"lists:{digest}"
        from hashgan_tpu.data.synthetic import synth_generation_key

        return "synth:" + synth_generation_key(d)

    _PROVENANCE_FILE = "data_provenance.json"

    def _write_provenance(self) -> None:
        import json as _json

        path = os.path.join(self.workdir, self._PROVENANCE_FILE)
        with open(path, "w") as f:
            _json.dump({"provenance": self._data_provenance()}, f)

    def _check_provenance(self) -> None:
        import json as _json

        path = os.path.join(self.workdir, self._PROVENANCE_FILE)
        try:
            with open(path) as f:
                saved = _json.load(f)["provenance"]
        except (OSError, ValueError, KeyError):
            # Legacy checkpoint without the record: adopt the current path.
            self._write_provenance()
            return
        current = self._data_provenance()
        if saved != current:
            raise RuntimeError(
                "checkpoint data-provenance mismatch: this run was trained "
                f"on {saved!r} but the current config/environment would "
                f"feed {current!r} (different bits — e.g. a synth-cache "
                "wipe flipped the numpy/device generation auto-routing). "
                "Resuming would silently change the training data mid-run. "
                "Pin HASHGAN_SYNTH_DEVICE=on/off to match the recorded "
                "path (synthetic), restore the original list/cifar files "
                "(list-file ids are content fingerprints, not paths), or "
                "start a fresh workdir."
            )

    def save_checkpoint(self) -> None:
        step = int(jax.device_get(self.encoder_state.step)) + (
            int(jax.device_get(self.gan_state.step)) if self.gan_state else 0
        )
        self.ckpt.save(step, jax.device_get(self._ckpt_state()))
        self._write_provenance()

    def restore_checkpoint(self) -> bool:
        """Restore the latest checkpoint, migrating across known
        state-template changes:

        - ``g_ema_stats``: checkpoints written before GanState gained the
          subtree restore without it; the EMA stats are then seeded from
          the restored live stats (the closest available estimate).
        - encoder ``hash_lr_multiplier`` 1 <-> !=1: the optax chain
          STRUCTURE differs (plain adam vs chain(adam, masked(scale)),
          train/state.py::make_encoder_tx), so StandardRestore rejects the
          cross template. The extra chain states are empty, so the Adam
          moments map across bit-exactly: restore with the alternate
          structure, then re-wrap/unwrap the adam state.
        """
        template = jax.device_get(self._ckpt_state())

        def _drop_ema(t):
            if t is None or "gan" not in t or t["gan"].g_ema_stats is None:
                return None
            t = dict(t)
            t["gan"] = t["gan"].replace(g_ema_stats=None)
            return t

        def _alt_enc_opt(t):
            import dataclasses as _dc

            from hashgan_tpu.train.state import make_encoder_tx

            cur = self.cfg.encoder.hash_lr_multiplier
            alt_cfg = _dc.replace(
                self.cfg.encoder,
                hash_lr_multiplier=(10.0 if cur == 1.0 else 1.0),
            )
            alt_opt = jax.device_get(
                make_encoder_tx(alt_cfg).init(t["encoder"].params)
            )
            t = dict(t)
            t["encoder"] = t["encoder"].replace(opt_state=alt_opt)
            return t

        variants = [(template, False, False)]
        ema_t = _drop_ema(template)
        if ema_t is not None:
            variants.append((ema_t, True, False))
        opt_t = _alt_enc_opt(template)
        variants.append((opt_t, False, True))
        ema_opt_t = _drop_ema(opt_t)
        if ema_opt_t is not None:
            variants.append((ema_opt_t, True, True))

        restored = None
        err = None
        fixed_ema = fixed_opt = False
        for tmpl, fix_ema, fix_opt in variants:
            try:
                restored = self.ckpt.restore(tmpl)
                fixed_ema, fixed_opt = fix_ema, fix_opt
                err = None
                break
            except (KeyError, ValueError, TypeError) as e:
                err = e
        if err is not None:
            raise err
        if restored is None:
            return False
        self._check_provenance()
        if fixed_ema and restored["gan"].g_ema_stats is None:
            restored["gan"] = restored["gan"].replace(
                g_ema_stats=jax.tree_util.tree_map(
                    lambda x: x.copy(), restored["gan"].g_stats
                )
            )
        if fixed_opt:
            enc = restored["encoder"]
            if self.cfg.encoder.hash_lr_multiplier == 1.0:
                # saved chain(adam, masked(scale)) -> plain adam moments
                enc = enc.replace(opt_state=enc.opt_state[0])
            else:
                # saved plain adam -> wrap with the (empty) masked state
                fresh = template["encoder"].opt_state
                enc = enc.replace(
                    opt_state=(enc.opt_state,) + tuple(fresh[1:])
                )
            restored["encoder"] = enc
        self.encoder_state = restored["encoder"]
        if self.gan_state is not None and "gan" in restored:
            self.gan_state = restored["gan"]
        if self.mesh is not None:
            self.encoder_state = replicate(self.mesh, self.encoder_state)
            if self.gan_state is not None:
                self.gan_state = replicate(self.mesh, self.gan_state)
        return True

    # ------------------------------------------------------------------
    def run(self) -> Dict[str, float]:
        """Full pipeline for the config: (GAN ->) encoder -> eval."""
        if self.cfg.use_gan:
            self.train_gan()
        self.train_encoder()
        metrics = self.evaluate()
        self.logger.log(int(jax.device_get(self.encoder_state.step)), metrics)
        self.logger.flush()
        return metrics
