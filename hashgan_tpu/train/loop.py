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
from hashgan_tpu.data import BatchIterator, make_splits
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
        self.encoder = build_encoder(cfg.encoder.arch, cfg.encoder.bits, dtype=dtype)
        self.generator = Generator(
            image_size=d.image_size, n_labels=d.n_classes, dim=cfg.gan.dim,
            out_channels=d.channels, dtype=gdtype,
        )
        self.discriminator = Discriminator(
            image_size=d.image_size, n_labels=d.n_classes, dim=cfg.gan.dim,
            dtype=gdtype,
        )

        rng = jax.random.key(cfg.train.seed)
        r_enc, r_gan, self._rng_seed = jax.random.split(rng, 3)
        self.encoder_state = create_encoder_state(
            r_enc, self.encoder, cfg.encoder, self.image_shape
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
        self._enc_step = make_encoder_train_step(
            self.encoder, cfg, generator=self.generator if cfg.use_gan else None
        )
        self._encode = make_encode_fn(self.encoder)
        self.ckpt = CheckpointManager(self.workdir)

    # ------------------------------------------------------------------
    # Stage I: PC-WGAN
    # ------------------------------------------------------------------
    def train_gan(self, iters: Optional[int] = None) -> Dict[str, float]:
        assert self.cfg.use_gan and self.gan_state is not None
        cfg = self.cfg
        iters = iters if iters is not None else cfg.gan.iters
        n_batches = cfg.gan.n_critic + 1
        it = BatchIterator(
            self.splits["train"], cfg.train.batch_size * n_batches,
            seed=cfg.train.seed, start_step=int(jax.device_get(self.gan_state.step)),
        )
        rng = self._rng_seed
        b = cfg.train.batch_size
        means: Dict[str, float] = {}
        # Host-side step mirror: device_get forces a host<->device round
        # trip, which on a remote-tunnel platform costs ~100ms — syncing
        # every step would reintroduce the reference's feed_dict boundary.
        # Steps are enqueued asynchronously; sync only at log points.
        host_step = int(jax.device_get(self.gan_state.step))
        for _ in range(iters):
            imgs, labs = next(it)
            shape = (n_batches, b) + imgs.shape[1:]
            batch = (
                jnp.asarray(imgs.reshape(shape)),
                jnp.asarray(labs.reshape(n_batches, b, -1)),
            )
            if self.mesh is not None:
                # batch dim 1 is the per-device batch: shard it.
                batch = jax.tree_util.tree_map(
                    lambda x: jax.device_put(
                        x,
                        jax.sharding.NamedSharding(
                            self.mesh, jax.sharding.PartitionSpec(None, "data")
                        ),
                    ),
                    batch,
                )
            self.gan_state, metrics = self._gan_cycle(
                self.gan_state, batch[0], batch[1], rng
            )
            host_step += 1
            if host_step % self.cfg.train.log_every == 0:
                self.logger.log(host_step, jax.device_get(metrics))
                means = self.logger.flush(host_step)
            if host_step % self.cfg.train.sample_every == 0:
                self.dump_samples(host_step)
                self.logger.log(host_step, self.sample_quality())
            if host_step % self.cfg.train.checkpoint_every == 0:
                self.save_checkpoint()
        return means

    def sample_quality(self) -> Dict[str, float]:
        """IS-style GAN health metrics via the critic's aux head (C19)."""
        from hashgan_tpu.eval.sample_quality import sample_quality_report

        return sample_quality_report(
            lambda z, l: self._sample(
                self.gan_state.g_params, self.gan_state.g_stats, z, l
            ),
            lambda x: self.discriminator.apply(
                {"params": self.gan_state.d_params}, x
            )[1],
            jax.random.key(7),
            n_labels=self.cfg.data.n_classes,
            z_dim=self.cfg.gan.z_dim,
            n_samples=min(512, 8 * self.cfg.data.n_classes * 8),
            multi_label=self.cfg.data.multi_label,
        )

    def dump_samples(self, step: int) -> None:
        if self._sample is None:
            return
        k = self.cfg.data.n_classes
        n_per = max(1, 64 // k)
        labels = np.repeat(np.eye(k, dtype=np.float32), n_per, axis=0)[:64]
        z = jax.random.normal(jax.random.key(0), (labels.shape[0], self.cfg.gan.z_dim))
        g_params = (
            self.gan_state.g_ema
            if self.gan_state.g_ema is not None
            else self.gan_state.g_params
        )
        imgs = self._sample(
            g_params, self.gan_state.g_stats, z, jnp.asarray(labels)
        )
        save_image_grid(
            np.asarray(imgs), os.path.join(self.workdir, f"samples_{step}.png")
        )

    # ------------------------------------------------------------------
    # Stage II: hash encoder
    # ------------------------------------------------------------------
    def train_encoder(
        self, iters: Optional[int] = None, eval_during: bool = True
    ) -> Dict[str, float]:
        cfg = self.cfg
        iters = iters if iters is not None else cfg.encoder.iters
        it = BatchIterator(
            self.splits["train"], cfg.train.batch_size, seed=cfg.train.seed + 1,
            start_step=int(jax.device_get(self.encoder_state.step)),
        )
        rng = self._rng_seed
        means: Dict[str, float] = {}
        host_step = int(jax.device_get(self.encoder_state.step))  # see train_gan
        for _ in range(iters):
            imgs, labs = next(it)
            batch = (jnp.asarray(imgs), jnp.asarray(labs))
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch)
            if cfg.use_gan:
                self.encoder_state, metrics = self._enc_step(
                    self.encoder_state, batch[0], batch[1], rng,
                    self.gan_state.g_params, self.gan_state.g_stats,
                )
            else:
                self.encoder_state, metrics = self._enc_step(
                    self.encoder_state, batch[0], batch[1], rng
                )
            host_step += 1
            if host_step % cfg.train.log_every == 0:
                self.logger.log(host_step, jax.device_get(metrics))
                means = self.logger.flush(host_step)
            if eval_during and host_step % cfg.train.eval_every == 0:
                self.logger.log(host_step, self.evaluate())
                means = self.logger.flush(host_step)
            if host_step % cfg.train.checkpoint_every == 0:
                self.save_checkpoint()
        return means

    # ------------------------------------------------------------------
    # Eval / index / query
    # ------------------------------------------------------------------
    def encode_split(self, split: str) -> np.ndarray:
        return encode_dataset(
            self._encode, self.encoder_state.params, self.splits[split],
            batch_size=min(256, max(32, len(self.splits[split]))),
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

    def evaluate(self, streaming_threshold: int = 200_000) -> Dict[str, float]:
        """Hamming-ranking eval: exact MAP@R for small/medium galleries,
        tie-aware streaming MAP (eval/streaming.py) beyond
        ``streaming_threshold`` items; P@H<=r always exact; PR curve dumped
        to the workdir when cfg.eval.pr_curve."""
        import numpy as _np

        from hashgan_tpu.eval import (
            device_map_at_r,
            device_precision_at_radius,
        )

        cfg = self.cfg
        codes_q = self.encode_split("query")
        codes_db = self.encode_split("database")
        pq = pack_codes(jnp.asarray(codes_q))
        pg = pack_codes(jnp.asarray(codes_db))
        qlab = jnp.asarray(self.splits["query"].labels)
        dlab = jnp.asarray(self.splits["database"].labels)
        n_db = pg.shape[0]
        if n_db <= streaming_threshold:
            m = float(device_map_at_r(pq, pg, qlab, dlab, R=cfg.eval.R))
            p = float(
                device_precision_at_radius(
                    pq, pg, qlab, dlab, radius=cfg.eval.precision_radius
                )
            )
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

            n_hist, r_hist = device_distance_histograms(pq, pg.T, qlab, dlab)
            m = float(tie_aware_map(n_hist, r_hist, cfg.eval.R))
            p = float(precision_at_radius_from_hist(
                n_hist, r_hist, cfg.eval.precision_radius
            ))
            metrics = {f"map_at_{cfg.eval.R}_tie_aware": m,
                       f"precision_at_h{cfg.eval.precision_radius}": p}
            if cfg.eval.pr_curve:
                prec, rec = pr_curve_from_hist(
                    _np.asarray(n_hist), _np.asarray(r_hist)
                )
                _np.savez(os.path.join(self.workdir, "pr_curve.npz"),
                          precision=prec, recall=rec)
        return metrics

    def _dump_pr_curve(self, pq, pg, qlab, dlab) -> None:
        from hashgan_tpu.eval import device_distance_histograms
        from hashgan_tpu.eval.streaming import pr_curve_from_hist
        import numpy as _np

        n_hist, r_hist = device_distance_histograms(pq, pg.T, qlab, dlab)
        prec, rec = pr_curve_from_hist(_np.asarray(n_hist), _np.asarray(r_hist))
        _np.savez(os.path.join(self.workdir, "pr_curve.npz"),
                  precision=prec, recall=rec)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(5, 4))
            ax.plot(rec, prec)
            ax.set_xlabel("recall")
            ax.set_ylabel("precision")
            ax.set_title(f"{self.cfg.name} PR over Hamming radii")
            fig.tight_layout()
            fig.savefig(os.path.join(self.workdir, "pr_curve.jpg"))
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

    def save_checkpoint(self) -> None:
        step = int(jax.device_get(self.encoder_state.step)) + (
            int(jax.device_get(self.gan_state.step)) if self.gan_state else 0
        )
        self.ckpt.save(step, jax.device_get(self._ckpt_state()))

    def restore_checkpoint(self) -> bool:
        restored = self.ckpt.restore(jax.device_get(self._ckpt_state()))
        if restored is None:
            return False
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
