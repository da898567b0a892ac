"""Stage-I convergence health table (VERDICT r4 #4): condense a stage-I
run's metrics.jsonl into per-checkpoint snapshots of the GAN-health
quantities — Wasserstein (projection-inclusive and the projection-free
readout), conditional accuracy (aux + frozen-template classifiers),
inception scores, marginal label entropy — so "does the projection recipe
converge at full length" is a table, not a scroll through curves.

Usage: python scripts/stage1_health_table.py <run_dir> [<run_dir> ...]
Writes docs/artifacts/stage1_health_r5.json and prints a markdown table.
Pure host-side file munging — no jax import, safe next to a chip job.
"""

import json
import os
import sys

SNAP_EVERY = 4000  # snapshot grid (cycles); metrics land every log_every

HEALTH_KEYS = [
    "wasserstein", "wasserstein_noproj", "grad_penalty",
    "d_aux_ce", "g_aux_ce",
    "conditional_accuracy_aux", "conditional_accuracy_tmpl",
    "inception_score_aux", "inception_score_tmpl",
    "marginal_label_entropy_bits_aux", "marginal_label_entropy_bits_tmpl",
]


def load_rows(run_dir: str):
    rows = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def snapshot(rows):
    """Nearest row at/below each SNAP_EVERY multiple plus the final row;
    sample-quality keys (logged sparser than losses) are carried forward
    from the latest row that has them. Checkpoint-resumed runs re-append
    rows for replayed steps (bit-exact), so snapshots key on step with
    last-occurrence-wins."""
    # Keep stage-I rows only: in a cotrain workdir the same metrics.jsonl
    # later gains encoder rows whose step numbering restarts at 0 — they
    # carry no GAN-health keys, and last-occurrence-wins would overwrite
    # the real cycle snapshots with stale carried values.
    rows = [r for r in rows if "wasserstein" in r]
    carried = {}
    by_step = {}
    targets = set()
    if rows:
        last = max(r["step"] for r in rows)
        targets = {t for t in range(SNAP_EVERY, last + 1, SNAP_EVERY)}
        targets.add(last)
    for row in rows:
        carried.update({k: row[k] for k in HEALTH_KEYS if k in row})
        if row["step"] in targets:
            by_step[row["step"]] = {"step": row["step"],
                                    **{k: carried[k] for k in HEALTH_KEYS
                                       if k in carried}}
    return [by_step[s] for s in sorted(by_step)]


def write_health(run_dirs, path: str, runs_root: str) -> dict:
    # Merge with the existing artifact: runs/ does not survive host
    # re-images, so entries whose run dir is gone must not be erased by a
    # fresh extract (same carry-forward rule as collect_round5_scarce).
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    for run_dir in run_dirs:
        name = os.path.relpath(run_dir, runs_root)
        out[name] = snapshot(load_rows(run_dir))
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    return out


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.environ.get(
        "HEALTH_OUT",
        os.path.join(root, "docs", "artifacts", "stage1_health_r5.json"))
    out = write_health(sys.argv[1:], path, os.path.join(root, "runs"))
    for name, snaps in out.items():
        print(f"\n## {name}")
        cols = ["step", "wasserstein", "wasserstein_noproj",
                "conditional_accuracy_tmpl", "inception_score_tmpl",
                "marginal_label_entropy_bits_tmpl", "g_aux_ce"]
        print("| " + " | ".join(cols) + " |")
        print("|" + "---|" * len(cols))
        for s in snaps:
            print("| " + " | ".join(
                f"{s.get(c, float('nan')):.3f}"
                if isinstance(s.get(c), float) else str(s.get(c, "-"))
                for c in cols) + " |")
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
