"""Render training curves from a run's metrics.jsonl to a PNG grid.

The headless replacement for the reference's visdom scalar line plots
(utils/visualizer.py:27-119 `plot_current_errors` — one line per loss
key, updated every print_freq): the trainers here append one JSON object
per logged step to `<checkpoint_dir>/<name>/metrics.jsonl`
(train/metrics_logger.py); this tool turns that file into a small-
multiples grid, one panel per scalar key, so a run can be inspected
without any server.

Usage:
  python tools/plot_metrics.py cachedir/snapshots/horse_net/metrics.jsonl \
      [--out curves.png] [--keys total_loss,mask_loss] [--smooth 9]
"""
import argparse
import json
import math
import os.path as osp

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue  # torn tail write of a live run
    return rows


def smooth(y, k):
    if k <= 1 or len(y) < k:
        return y
    kern = np.ones(k) / k
    pad = k // 2
    yp = np.pad(y, (pad, k - 1 - pad), mode="edge")
    return np.convolve(yp, kern, mode="valid")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl", help="path to a run's metrics.jsonl")
    ap.add_argument("--out", default="", help="output PNG (default: next to the jsonl)")
    ap.add_argument("--keys", default="", help="comma-separated subset of scalar keys")
    ap.add_argument("--smooth", type=int, default=1, help="moving-average window")
    args = ap.parse_args()

    rows = load(args.jsonl)
    if not rows:
        raise SystemExit(f"no records in {args.jsonl}")
    steps = np.asarray([r.get("step", i) for i, r in enumerate(rows)], np.float64)

    keys = [k for k in args.keys.split(",") if k] or sorted(
        {
            k
            for r in rows
            for k, v in r.items()
            if k not in ("step", "epoch", "phase") and isinstance(v, (int, float))
        }
    )
    if not keys:
        raise SystemExit("no scalar keys found")

    ncol = min(4, len(keys))
    nrow = math.ceil(len(keys) / ncol)
    fig, axes = plt.subplots(
        nrow, ncol, figsize=(3.6 * ncol, 2.6 * nrow), squeeze=False
    )
    for i, key in enumerate(keys):
        ax = axes[i // ncol][i % ncol]
        xs, ys = zip(
            *[
                (s, r[key])
                for s, r in zip(steps, rows)
                if isinstance(r.get(key), (int, float)) and math.isfinite(r[key])
            ]
        ) if any(isinstance(r.get(key), (int, float)) for r in rows) else ((), ())
        if xs:
            ys = smooth(np.asarray(ys, np.float64), args.smooth)
            ax.plot(xs, ys, lw=1.0)
        ax.set_title(key, fontsize=9)
        ax.tick_params(labelsize=7)
        ax.grid(True, alpha=0.3)
    for j in range(len(keys), nrow * ncol):
        axes[j // ncol][j % ncol].axis("off")
    fig.tight_layout()

    out = args.out or osp.join(osp.dirname(osp.abspath(args.jsonl)), "curves.png")
    fig.savefig(out, dpi=110)
    print(f"wrote {out} ({len(rows)} records, {len(keys)} keys)")


if __name__ == "__main__":
    main()
