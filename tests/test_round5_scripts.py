"""Round-5 host-side analysis scripts: the scarce-curve collector and the
stage-I health-table extractor (no jax, pure file munging — but a silent
key mismatch here would publish empty artifacts after hours of chip time,
so the plumbing is pinned)."""

import importlib
import json
import sys


def _fresh(module: str):
    sys.modules.pop(module, None)
    return importlib.import_module(module)


def test_collector_picks_up_summary_and_partial(tmp_path, monkeypatch):
    m = _fresh("scripts.collect_round5_scarce")
    runs = tmp_path / "runs"
    # complete run with summary.json
    full = runs / "config3_ref_horizon_cal_scarce2000_proj"
    full.mkdir(parents=True)
    (full / "summary.json").write_text(json.dumps({
        "gan_cycles": 24000, "enc_iters": 20000, "encoder_arch": "resnet",
        "wall_s": 1.0,
        "cotrain_map_at_5000": 0.8, "real_only_map_at_5000": 0.7,
        "gan_wasserstein": 2.5,
    }))
    # partial run: only phase files
    part = runs / "config3_ref_horizon_cal_scarce4000_proj"
    part.mkdir(parents=True)
    (part / "phase_stage1.json").write_text(json.dumps({
        "gan_cycles_done": 24000, "gan_wasserstein": 3.0, "wall_s": 2.0,
    }))
    (part / "phase_cotrain.json").write_text(json.dumps({
        "enc_iters_done": 20000, "map_at_5000": 0.75, "wall_s": 2.0,
    }))
    out = tmp_path / "artifact.json"
    monkeypatch.setattr(m, "RUNS", str(runs))
    monkeypatch.setattr(m, "OUT", str(out))
    m.main()
    rows = {r["run"]: r for r in json.loads(out.read_text())["rows"]}
    assert rows["config3_ref_horizon_cal_scarce2000_proj"][
        "gan_delta_map_at_5000"] == 0.8 - 0.7
    p = rows["config3_ref_horizon_cal_scarce4000_proj"]
    assert p["partial"] and p["cotrain_map_at_5000"] == 0.75
    assert "gan_delta_map_at_5000" not in p  # realonly arm missing


def test_collector_carries_forward_rows_after_reimage(tmp_path, monkeypatch):
    """runs/ does not survive host re-images: rows already in the artifact
    whose run dir is gone must be preserved, tagged carried_forward."""
    m = _fresh("scripts.collect_round5_scarce")
    runs = tmp_path / "runs"
    live = runs / "config3_ref_horizon_cal_scarce1000_proj"
    live.mkdir(parents=True)
    (live / "summary.json").write_text(json.dumps({
        "gan_cycles": 24000, "enc_iters": 20000, "encoder_arch": "resnet",
        "wall_s": 1.0, "cotrain_map_at_5000": 0.85,
        "real_only_map_at_5000": 0.8,
    }))
    out = tmp_path / "artifact.json"
    out.write_text(json.dumps({"rows": [
        # measured pre-re-image; its run dir no longer exists
        {"run": "config3_ref_horizon_cal_scarce2000_proj",
         "cotrain_map_at_5000": 0.8163, "real_only_map_at_5000": 0.8045,
         "gan_delta_map_at_5000": 0.0118},
        # stale version of a run that was re-measured: fresh row wins
        {"run": "config3_ref_horizon_cal_scarce1000_proj",
         "cotrain_map_at_5000": 0.1},
    ]}))
    monkeypatch.setattr(m, "RUNS", str(runs))
    monkeypatch.setattr(m, "OUT", str(out))
    m.main()
    rows = {r["run"]: r for r in json.loads(out.read_text())["rows"]}
    assert len(rows) == 2
    kept = rows["config3_ref_horizon_cal_scarce2000_proj"]
    assert kept["carried_forward"] and kept["gan_delta_map_at_5000"] == 0.0118
    fresh = rows["config3_ref_horizon_cal_scarce1000_proj"]
    assert "carried_forward" not in fresh
    assert fresh["gan_delta_map_at_5000"] == 0.85 - 0.8


def test_health_table_snapshots_and_carry_forward(tmp_path):
    m = _fresh("scripts.stage1_health_table")
    run = tmp_path / "runs" / "r1" / "cotrain"
    run.mkdir(parents=True)
    rows = []
    for step in range(500, 9001, 500):
        rec = {"step": step, "wasserstein": float(step),
               "wasserstein_noproj": step / 10.0, "g_aux_ce": 0.5}
        if step % 3000 == 0:  # sample-quality logged sparser
            rec["conditional_accuracy_tmpl"] = 1.0
            rec["inception_score_tmpl"] = 80.0
            rec["marginal_label_entropy_bits_tmpl"] = 6.64
        rows.append(json.dumps(rec))
    (run / "metrics.jsonl").write_text("\n".join(rows) + "\n")
    snaps = m.snapshot(m.load_rows(str(run)))
    steps = [s["step"] for s in snaps]
    assert steps == [4000, 8000, 9000]  # grid multiples + final row
    # carry-forward: step 4000 inherits the step-3000 sample-quality row
    assert snaps[0]["conditional_accuracy_tmpl"] == 1.0
    assert snaps[0]["wasserstein"] == 4000.0  # losses stay row-local
    # artifact writing end-to-end
    art = tmp_path / "stage1_health.json"
    m.write_health([str(run)], str(art), str(tmp_path / "runs"))
    written = json.loads(art.read_text())
    assert written["r1/cotrain"][0]["step"] == 4000


def test_health_table_ignores_encoder_rows_and_merges_artifact(tmp_path):
    """A cotrain workdir's metrics.jsonl gains encoder rows (step restarts
    at 0, no GAN keys) after stage-I — they must not displace the cycle
    snapshots; and re-extracting must not erase artifact entries whose
    run dirs were re-imaged away."""
    m = _fresh("scripts.stage1_health_table")
    run = tmp_path / "runs" / "r2" / "cotrain"
    run.mkdir(parents=True)
    rows = [json.dumps({"step": s, "wasserstein": float(s),
                        "wasserstein_noproj": s / 10.0})
            for s in range(500, 8001, 500)]
    # encoder phase appends rows at overlapping steps without GAN keys
    rows += [json.dumps({"step": s, "hash_loss": 1.0, "map_at_1000": 0.5})
             for s in range(500, 4001, 500)]
    (run / "metrics.jsonl").write_text("\n".join(rows) + "\n")
    art = tmp_path / "stage1_health.json"
    art.write_text(json.dumps({"gone/cotrain": [{"step": 24000,
                                                 "wasserstein": 2.7}]}))
    out = m.write_health([str(run)], str(art), str(tmp_path / "runs"))
    snaps = out["r2/cotrain"]
    assert [s["step"] for s in snaps] == [4000, 8000]
    assert snaps[0]["wasserstein"] == 4000.0  # GAN row, not encoder replay
    assert out["gone/cotrain"][0]["wasserstein"] == 2.7  # survived merge
