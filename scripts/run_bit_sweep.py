"""Bit-width sweep: the paper's 16/24/32/48-bit results-table shape.

The reference's headline result table (SURVEY.md §0/§3.3; CVPR18 paper
table 1, expected ref README results) reports CIFAR-10 MAP across code
lengths 16/24/32/48.  This runner produces the same-shaped table on the
synthetic surrogate: encoder-only hash training (config-1 protocol) at
the CIFAR retrieval geometry 5000 train / 1000 query / 54000 database.

CALIBRATION (measured, docs/BENCHMARKS.md): at 10 classes the synthetic
task saturates EVERY width — 16-bit codes hit MAP 1.0000 — so a 10-class
table carries no information about code capacity. The default therefore
runs N_CLASSES=100 (50 train images/class, chance MAP 0.01) at R=1000,
where capacity binds and the table is monotone in code length. Real
CIFAR-10 recovers the paper's exact protocol via ``DataConfig.cifar10_dir``
(data/cifar10.py) + ``N_CLASSES=10 R=5000``.

One child process per bit width (the parent imports no jax — one
axon-attached process at a time, CLAUDE.md), each with the
device-resident feed (data/device_data.py), so a full 4-point sweep is
~25 min on one v5e at the default 20k steps/point.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/run_bit_sweep.py
Env: BITS="16,24,32,48", ITERS=20000, N_CLASSES=100, R=1000, SEED=0
(data draw + init seed — the round-4 re-measurement showed single-seed
width comparisons are noise-dominated at this geometry; sweep seeds and
report mean±range), SMOKE=1 (tiny tunnel-free CPU run).
Artifacts: runs/bit_sweep/{bits<b>/, sweep.json, sweep.md}.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

BITS = tuple(int(b) for b in os.environ.get("BITS", "16,24,32,48").split(","))
ITERS = int(os.environ.get("ITERS", 20_000))
N_CLASSES = int(os.environ.get("N_CLASSES", 100))
R = int(os.environ.get("R", 1000))
SEED = int(os.environ.get("SEED", 0))
SMOKE = os.environ.get("SMOKE", "") == "1"
# SWEEP_TAG=<tag>: separate artifact root (runs/bit_sweep_<tag>). Use for
# budget-extension points (e.g. BITS=48 ITERS=100000 SWEEP_TAG=100k) so the
# linear lr-decay horizon matches the budget from step 0 — resuming a 50k
# checkpoint under a 100k schedule would jump the lr mid-run.
TAG = os.environ.get("SWEEP_TAG", "")
ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "runs",
                 "bit_sweep" + (f"_{TAG}" if TAG else "")
                 + ("_smoke" if SMOKE else ""))
)


def build_config(bits: int):
    from hashgan_tpu.configs import get_config

    cfg = get_config("config1")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, n_classes=N_CLASSES, seed=SEED),
        encoder=dataclasses.replace(
            cfg.encoder, bits=bits, iters=ITERS, decay_lr=True),
        index=dataclasses.replace(cfg.index, bits=bits),
        eval=dataclasses.replace(cfg.eval, R=R),
        train=dataclasses.replace(
            cfg.train, batch_size=128, epoch_shuffle=True, device_data=True,
            eval_every=5000, checkpoint_every=10_000, log_every=500,
            sample_every=1 << 30,
            workdir=os.path.join(ROOT, f"bits{bits}"),
        ),
    )
    if SMOKE:
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, n_train=64, n_query=32, n_database=256),
            eval=dataclasses.replace(cfg.eval, R=50),
            train=dataclasses.replace(
                cfg.train, batch_size=16, eval_every=4, log_every=2,
                checkpoint_every=4),
        )
    return cfg


def best_over_horizon(workdir: str):
    """Peak eval MAP across the run's eval curve (metrics.jsonl) + the step
    it occurred at. A single fixed-budget slice mixes overfit-past-peak and
    under-converged widths (measured round 3: 24-bit peaked at 20k and
    DECLINED to 50k while 48-bit was still climbing — docs/BENCHMARKS.md),
    so the published table is peak-over-horizon with the budget noted."""
    best, best_step = None, None
    try:
        with open(os.path.join(workdir, "metrics.jsonl")) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                for k, v in rec.items():
                    if k.startswith("map_at_") and (
                            best is None or float(v) > best):
                        best = float(v)
                        best_step = rec.get("step")
    except OSError:
        pass
    return best, best_step


def run_point(bits: int) -> int:
    import jax

    from hashgan_tpu.train.loop import Experiment

    t0 = time.time()
    cfg = build_config(bits)
    exp = Experiment(cfg)
    exp.restore_checkpoint()
    step = int(jax.device_get(exp.encoder_state.step))
    target = cfg.encoder.iters
    if step < target:
        print(f"[bits{bits}] steps {step} -> {target}", flush=True)
        exp.train_encoder(target - step)
        exp.save_checkpoint()
    final = exp.evaluate()
    exp.logger.log(target, final)
    exp.logger.flush(target)
    best, best_step = best_over_horizon(cfg.train.workdir)
    rec = {"bits": bits, "iters": target, "wall_s": time.time() - t0,
           **{k: float(v) for k, v in final.items()}}
    if best is not None:
        rec["best_map_over_horizon"] = best
        rec["best_map_step"] = best_step
    with open(os.path.join(ROOT, f"point_bits{bits}.json"), "w") as f:
        json.dump(rec, f, indent=2)
    print(f"[bits{bits}] {json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in rec.items()})}",
          flush=True)
    return 0


def orchestrate() -> int:
    t0 = time.time()
    os.makedirs(ROOT, exist_ok=True)
    # Settle between per-width children (serial-dial wedge — see
    # run_config3_ref_horizon.py PHASE_SETTLE_S).
    settle = float(os.environ.get("PHASE_SETTLE_S", "0" if SMOKE else "45"))
    for i, bits in enumerate(BITS):
        if i and settle:
            time.sleep(settle)
        print(f"=== bits {bits} ===", flush=True)
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(bits)],
        ).returncode
        if rc != 0:
            print(f"bits {bits} failed with rc={rc}", flush=True)
            return rc
    points = []
    for bits in BITS:
        with open(os.path.join(ROOT, f"point_bits{bits}.json")) as f:
            points.append(json.load(f))
    out = {"run": "bit_sweep", "iters_per_point": ITERS,
           "wall_s": time.time() - t0, "points": points}
    with open(os.path.join(ROOT, "sweep.json"), "w") as f:
        json.dump(out, f, indent=2)
    map_key = next(k for k in points[0] if k.startswith("map_at_"))
    lines = [
        "| bits | " + " | ".join(str(p["bits"]) for p in points) + " |",
        "|---|" + "---|" * len(points),
        f"| {map_key} (final) | "
        + " | ".join(f"{p[map_key]:.4f}" for p in points) + " |",
        "| best over horizon | "
        + " | ".join(
            f"{p.get('best_map_over_horizon', float('nan')):.4f}"
            f"@{p.get('best_map_step', '?')}" for p in points) + " |",
        "| precision@H<=2 | "
        + " | ".join(f"{p.get('precision_at_h2', float('nan')):.4f}"
                     for p in points) + " |",
    ]
    table = "\n".join(lines)
    with open(os.path.join(ROOT, "sweep.md"), "w") as f:
        f.write(table + "\n")
    print(table, flush=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1:
        sys.exit(run_point(int(sys.argv[1])))
    sys.exit(orchestrate())
