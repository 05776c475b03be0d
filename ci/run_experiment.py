"""CI experiment runner: train a config, scrape metrics, emit a report.

Behavioral reference: ci/run_experiment.py (PR-label-triggered SageMaker
jobs whose metric regexes scrape `key=value;` console lines,
config/ci_sagemaker_template.json). TPU equivalent: experiments run as
plain subprocesses on the TPU host (one per config, sequentially or via
--parallel on multi-chip hosts), metrics are scraped from the same
`key=value;` console protocol the trainer prints, and the result lands in
a JSON report (plus an optional GitHub PR comment body on stdout).

Usage:
  python ci/run_experiment.py --configs config/boots_super_sparse_config.yaml \
      [--output report.json] [--markdown]
"""
from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time

METRIC_RE = re.compile(r"^([A-Za-z0-9_]+)=([-+0-9.eE]+);")

# the metric names the reference's SageMaker template scrapes
TRACKED = ("train_loss", "train_psnr", "train_ssim", "val_loss", "val_psnr",
           "val_ssim")


def run_one(config_path: str) -> dict:
    cmd = [sys.executable, "-m",
           "taichi_3d_gaussian_splatting_tpu.apps.train",
           "--train_config", config_path]
    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    latest: dict = {}
    history: dict = {k: [] for k in TRACKED}
    assert proc.stdout is not None
    for line in proc.stdout:
        sys.stdout.write(line)
        m = METRIC_RE.match(line.strip())
        if m:
            key, value = m.group(1), float(m.group(2))
            latest[key] = value
            if key in history:
                history[key].append(value)
    code = proc.wait()
    return {
        "config": config_path,
        "status": "Completed" if code == 0 else f"Failed({code})",
        "wall_time_s": round(time.time() - t0, 1),
        "final": {k: latest.get(k) for k in TRACKED},
        "best_val_psnr": max(history["val_psnr"], default=None),
        "best_val_ssim": max(history["val_ssim"], default=None),
    }


def to_markdown(results: list) -> str:
    lines = ["| config | status | best val PSNR | best val SSIM | wall (s) |",
             "|---|---|---|---|---|"]
    for r in results:
        lines.append(
            f"| {r['config']} | {r['status']} | {r['best_val_psnr']} | "
            f"{r['best_val_ssim']} | {r['wall_time_s']} |")
    return "\n".join(lines)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", nargs="+", required=True)
    parser.add_argument("--output", type=str, default="ci_report.json")
    parser.add_argument("--markdown", action="store_true")
    args = parser.parse_args()

    results = [run_one(c) for c in args.configs]
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    if args.markdown:
        print(to_markdown(results))
    if any(r["status"] != "Completed" for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
