"""Command-line interface.

Reference parity (SURVEY.md L4/C14): the reference is driven as
``python main.py --cfg config/<dataset>_step{1,2}.yaml``. Equivalents:

  python -m hashgan_tpu.cli train --config config2 [--stage 1|2|all]
  python -m hashgan_tpu.cli eval --config config1 [--workdir ...]
  python -m hashgan_tpu.cli build-index --config config1 --out gallery.npz
  python -m hashgan_tpu.cli query --gallery gallery.npz --k 10
  python -m hashgan_tpu.cli bench-scan [--bits 128 --n 1000000]

``--config`` takes a preset name (config1..config5 / full names) or a path
to a yaml override file (reference-style).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_config(spec: str):
    from hashgan_tpu.configs import get_config, load_yaml

    if os.path.exists(spec):
        return load_yaml(spec)
    return get_config(spec)


def cmd_train(args) -> None:
    from hashgan_tpu.train.loop import Experiment

    cfg = _load_config(args.config)
    exp = Experiment(cfg, workdir=args.workdir)
    if args.resume:
        exp.restore_checkpoint()
    elif args.stage == "2" and cfg.use_gan:
        # The reference's two-step workflow always loads the stage-1
        # checkpoint before step 2; auto-restore it (Experiment.train_encoder
        # additionally warns and disables fakes when nothing is restorable).
        if exp.restore_checkpoint():
            print("restored stage-1 checkpoint from workdir", file=sys.stderr)
    if args.stage in ("1", "all") and cfg.use_gan:
        exp.train_gan(args.iters)
    if args.stage in ("2", "all"):
        exp.train_encoder(args.iters)
        print(json.dumps(exp.evaluate()))


def cmd_eval(args) -> None:
    from hashgan_tpu.train.loop import Experiment

    cfg = _load_config(args.config)
    exp = Experiment(cfg, workdir=args.workdir)
    if not exp.restore_checkpoint():
        print("warning: no checkpoint found; evaluating random init",
              file=sys.stderr)
    print(json.dumps(exp.evaluate()))


def cmd_encode(args) -> None:
    """Encode a split to continuous + packed codes (.npz) — the reference's
    .npy code dumps (SURVEY.md C21)."""
    import numpy as np

    from hashgan_tpu.ops.pack import pack_codes
    import jax.numpy as jnp

    from hashgan_tpu.train.loop import Experiment

    cfg = _load_config(args.config)
    exp = Experiment(cfg, workdir=args.workdir)
    exp.restore_checkpoint()
    codes = exp.encode_split(args.split)
    packed = np.asarray(pack_codes(jnp.asarray(codes)))
    np.savez(
        args.out, codes=codes, packed=packed,
        labels=exp.splits[args.split].labels, bits=cfg.encoder.bits,
    )
    print(json.dumps({"split": args.split, "n": len(codes), "path": args.out}))


def cmd_build_index(args) -> None:
    from hashgan_tpu.train.loop import Experiment

    cfg = _load_config(args.config)
    exp = Experiment(cfg, workdir=args.workdir)
    exp.restore_checkpoint()
    gal = exp.build_index(save_path=args.out)
    print(json.dumps({"items": gal.n, "bits": gal.bits, "path": args.out}))


def cmd_query(args) -> None:
    import jax.numpy as jnp
    import numpy as np

    from hashgan_tpu.index import PackedGallery
    from hashgan_tpu.ops.pack import pack_codes

    gal = PackedGallery.load(args.gallery)
    if args.codes:
        codes = np.load(args.codes)
    else:  # demo: random probes
        codes = np.random.default_rng(0).standard_normal((args.n_queries, gal.bits))
    pq = pack_codes(jnp.asarray(codes, dtype=jnp.float32))
    d, i = gal.topk(pq, k=args.k)
    for qi in range(min(len(codes), 8)):
        print(json.dumps({
            "query": qi,
            "neighbors": np.asarray(i[qi]).tolist(),
            "distances": np.asarray(d[qi]).tolist(),
        }))


def cmd_serve(args) -> None:
    """HTTP retrieval service over a saved gallery (index/server.py).

    With --config/--workdir the encoder checkpoint is restored and image
    queries work; gallery-only serving answers code queries."""
    from hashgan_tpu.index import PackedGallery, QueryEngine
    from hashgan_tpu.index.server import serve_forever

    if args.config:
        cfg = _load_config(args.config)
        engine = QueryEngine.from_artifacts(
            cfg, args.workdir or cfg.train.workdir, args.gallery
        )
    else:
        engine = QueryEngine(None, None, PackedGallery.load(args.gallery))
    serve_forever(engine, host=args.host, port=args.port, default_k=args.k)


def cmd_bench_scan(args) -> None:
    from hashgan_tpu.bench_scan import run_bench

    print(json.dumps(run_bench(bits=args.bits, n=args.n, q=args.q)))


def cmd_bench_serve(args) -> None:
    from hashgan_tpu.bench_serve import run_serving_bench

    print(json.dumps(run_serving_bench(
        bits=args.bits, n=args.n, batch=args.batch, k=args.k
    )))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="hashgan_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train (GAN stage 1 / encoder stage 2)")
    t.add_argument("--config", required=True)
    t.add_argument("--workdir", default=None)
    t.add_argument("--stage", choices=("1", "2", "all"), default="all")
    t.add_argument("--iters", type=int, default=None)
    t.add_argument("--resume", action="store_true")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval", help="Hamming-ranking evaluation")
    e.add_argument("--config", required=True)
    e.add_argument("--workdir", default=None)
    e.set_defaults(fn=cmd_eval)

    n = sub.add_parser("encode", help="dump a split's codes to .npz")
    n.add_argument("--config", required=True)
    n.add_argument("--workdir", default=None)
    n.add_argument("--split", choices=("train", "query", "database"),
                   default="query")
    n.add_argument("--out", required=True)
    n.set_defaults(fn=cmd_encode)

    b = sub.add_parser("build-index", help="encode database -> packed gallery")
    b.add_argument("--config", required=True)
    b.add_argument("--workdir", default=None)
    b.add_argument("--out", required=True)
    b.set_defaults(fn=cmd_build_index)

    q = sub.add_parser("query", help="top-k scan against a saved gallery")
    q.add_argument("--gallery", required=True)
    q.add_argument("--codes", default=None, help=".npy of query codes")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--n-queries", type=int, default=4)
    q.set_defaults(fn=cmd_query)

    w = sub.add_parser("serve", help="HTTP retrieval service over a gallery")
    w.add_argument("--gallery", required=True)
    w.add_argument("--config", default=None,
                   help="preset/yaml: restore the encoder for image queries")
    w.add_argument("--workdir", default=None)
    w.add_argument("--host", default="127.0.0.1")
    w.add_argument("--port", type=int, default=8080)
    w.add_argument("--k", type=int, default=100)
    w.set_defaults(fn=cmd_serve)

    s = sub.add_parser("bench-scan", help="Hamming scan throughput benchmark")
    s.add_argument("--bits", type=int, default=128)
    s.add_argument("--n", type=int, default=1_000_000)
    s.add_argument("--q", type=int, default=1024)
    s.set_defaults(fn=cmd_bench_scan)

    v = sub.add_parser("bench-serve",
                       help="end-to-end serving benchmark (images -> neighbors)")
    v.add_argument("--bits", type=int, default=48)
    v.add_argument("--n", type=int, default=1_000_000)
    v.add_argument("--batch", type=int, default=256)
    v.add_argument("--k", type=int, default=100)
    v.set_defaults(fn=cmd_bench_serve)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
