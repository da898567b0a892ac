"""Collect the round-5 calibrated scarce-supervision experiments into one
committed artifact: the GAN-augmentation delta curve (cotrain vs real-only
MAP) across scarcity points, with the projection-critic stage-I recipe
(VERDICT r4 #1/#7) and the fake_pair_weight=0.5 sub-arm.

Reads runs/config3_ref_horizon_cal_scarce*/summary.json (+ the config2_cal
run) and writes docs/artifacts/scarce_curve_r5.json. Pure host-side file
munging — no jax import, safe to run next to a chip job.

Rows already in the committed artifact whose run directory no longer
exists are CARRIED FORWARD (tagged "carried_forward": true): the host is
re-imaged between sessions and runs/ does not survive, so a fresh collect
must not erase measurements whose only remaining home is the artifact
(measured this round: the first re-image collect dropped the scarce2000
rows before this guard existed).
"""

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(ROOT, "runs")
OUT = os.path.join(ROOT, "docs", "artifacts", "scarce_curve_r5.json")

KEEP_PREFIXES = ("cotrain_", "real_only_", "gan_")


def main() -> None:
    rows = []
    pats = [
        os.path.join(RUNS, "config3_ref_horizon_cal_scarce*"),
        os.path.join(RUNS, "config3_ref_horizon_config2_cal_scarce*"),
        os.path.join(RUNS, "config3_ref_horizon_cal_projconv"),
    ]
    roots = sorted(set(sum((glob.glob(p) for p in pats), [])))
    for root in roots:
        path = os.path.join(root, "summary.json")
        if not os.path.exists(path):
            # partial run: keep whatever phase files exist so an aborted
            # arm still leaves measured evidence
            rec = {}
            for ph in ("stage1", "cotrain", "realonly"):
                pp = os.path.join(root, f"phase_{ph}.json")
                if os.path.exists(pp):
                    with open(pp) as f:
                        d = json.load(f)
                    pre = {"stage1": "", "cotrain": "cotrain_",
                           "realonly": "real_only_"}[ph]
                    rec.update({
                        (k if k.startswith("gan_") else pre + k): v
                        for k, v in d.items()
                    })
            if not rec:
                continue
            rec["partial"] = True
        else:
            with open(path) as f:
                rec = json.load(f)
        name = os.path.basename(root)
        row = {"run": name}
        for k, v in rec.items():
            if k.startswith(KEEP_PREFIXES) or k in (
                "gan_cycles", "enc_iters", "encoder_arch", "wall_s",
                "partial",
            ):
                row[k] = v
        map_keys = sorted(
            k[len("cotrain_"):] for k in row
            if k.startswith("cotrain_map_at_")
        )
        for mk in map_keys:
            cm, rm = row.get(f"cotrain_{mk}"), row.get(f"real_only_{mk}")
            if cm is not None and rm is not None:
                row[f"gan_delta_{mk}"] = cm - rm
        rows.append(row)
    fresh = {r["run"] for r in rows}
    if os.path.exists(OUT):
        with open(OUT) as f:
            for old in json.load(f).get("rows", []):
                if old["run"] not in fresh:
                    old["carried_forward"] = True
                    rows.append(old)
    rows.sort(key=lambda r: r["run"])
    out = {"experiment": "round5 calibrated scarce curve, projection recipe",
           "rows": rows}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
