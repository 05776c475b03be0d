"""CI experiment runner: train a config, scrape metrics, emit a report.

Behavioral reference: ci/run_experiment.py (PR-label-triggered SageMaker
jobs whose metric regexes scrape `key=value;` console lines,
config/ci_sagemaker_template.json). TPU equivalent: experiments run as
plain subprocesses on the TPU host, one per config, sequentially (one TPU
process at a time); metrics are scraped from the same `key=value;`
console protocol, which the runner force-enables on a temp copy of each
config. Child logs stream to STDERR so `--markdown > comment.md` captures
only the report table; each run has a wall-clock timeout.

Usage:
  python ci/run_experiment.py --configs config/boots_super_sparse_config.yaml \
      [--output report.json] [--markdown]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import threading
import time

METRIC_RE = re.compile(
    r"^([A-Za-z0-9_]+)=([-+0-9.eE]+|[-+]?(?:nan|inf));")

# the metric names the reference's SageMaker template scrapes
TRACKED = ("train_loss", "train_psnr", "train_ssim", "val_loss", "val_psnr",
           "val_ssim")


def _metrics_enabled_copy(config_path: str) -> str:
    """Temp copy of the config with print_metrics_to_console forced on —
    without it the trainer prints no key=value; lines and the report would
    pass with every metric None."""
    import yaml

    with open(config_path) as f:
        cfg = yaml.safe_load(f) or {}
    cfg["print_metrics_to_console"] = True
    fd, path = tempfile.mkstemp(suffix=".yaml", prefix="ci_cfg_")
    with os.fdopen(fd, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def run_one(config_path: str, timeout_s: float = 6 * 3600) -> dict:
    cmd = [sys.executable, "-m",
           "taichi_3d_gaussian_splatting_tpu.apps.train",
           "--train_config", _metrics_enabled_copy(config_path)]
    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    timed_out = threading.Event()

    def _kill():
        timed_out.set()
        proc.kill()

    watchdog = threading.Timer(timeout_s, _kill)
    watchdog.daemon = True
    watchdog.start()
    latest: dict = {}
    history: dict = {k: [] for k in TRACKED}
    finite = {}
    assert proc.stdout is not None
    for line in proc.stdout:
        sys.stderr.write(line)  # keep stdout clean for --markdown
        m = METRIC_RE.match(line.strip())
        if m:
            try:
                value = float(m.group(2))
            except ValueError:
                continue
            key = m.group(1)
            latest[key] = value
            finite[key] = finite.get(key, True) and value == value \
                and abs(value) != float("inf")
            if key in history:
                history[key].append(value)
    code = proc.wait()
    watchdog.cancel()
    if timed_out.is_set():
        status = f"TimedOut({timeout_s:.0f}s)"
    elif any(not ok for ok in finite.values()):
        # a diverged run (nan/inf metrics) must not read as healthy
        status = "Diverged"
    elif code == 0:
        status = "Completed"
    else:
        status = f"Failed({code})"
    return {
        "config": config_path,
        "status": status,
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
    parser.add_argument("--timeout", type=float, default=6 * 3600,
                        help="per-run wall-clock cap in seconds")
    args = parser.parse_args()

    results = [run_one(c, timeout_s=args.timeout) for c in args.configs]
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    if args.markdown:
        print(to_markdown(results))
    if any(r["status"] != "Completed" for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
