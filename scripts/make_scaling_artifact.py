"""Produce SCALING_r{N}.json: data-parallel scaling efficiency artifact.

BASELINE.json asks for >= 80% scaling efficiency at 1 chip / 1 host /
>= 2 hosts. This rig has ONE real TPU chip (hardware-blocked for real
multi-chip), so the artifact records:
  - the real-chip 1-device training throughput (the scaling baseline any
    future pod run is measured against), and
  - virtual-mesh (CPU, xla_force_host_platform_device_count) efficiencies
    at 1/2/4/8 devices, which exercise the exact collective pattern
    (psum'd point grads + pmean'd metrics per scan window) of
    parallel/data_parallel.py — methodology, not silicon, numbers.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/make_scaling_artifact.py [out.json]
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINE = re.compile(
    r"devices=\s*(\d+)\s+([\d.]+) ms/step\s+([\d.]+) img/s\s+"
    r"efficiency=\s*([\d.]+)%\s+retention=\s*([\d.]+)%")


def run_mode(env_extra, label):
    env = dict(os.environ)
    env.update(env_extra)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    rows = []
    for m in LINE.finditer(p.stdout):
        rows.append({
            "devices": int(m.group(1)),
            "ms_per_step": float(m.group(2)),
            "images_per_s": float(m.group(3)),
            "efficiency_pct": float(m.group(4)),
            "throughput_retention_pct": float(m.group(5)),
        })
    head = p.stdout.splitlines()[0] if p.stdout else p.stderr[-500:]
    return {"label": label, "header": head, "rows": rows,
            "ok": p.returncode == 0 and bool(rows)}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "SCALING_r03.json")
    result = {
        "note": (
            "One real v5e chip on this rig: real multi-chip scaling is "
            "hardware-blocked. 'tpu' rows = real-chip 1-device training "
            "throughput (428k pts, 512x512, 20-step scan windows); "
            "'cpu_virtual' rows = 1/2/4/8-device virtual mesh running the "
            "identical data-parallel step (tiny shapes) on a ONE-CORE host "
            "— the devices time-slice the core, so per-device efficiency "
            "is physically capped at 1/n; throughput_retention >= 100% is "
            "the meaningful signal there (collectives/sharding add no "
            "overhead). Validates the collective pattern, not silicon."),
        "tpu": run_mode({}, "real TPU, 1 chip"),
        "cpu_virtual": run_mode(
            {"SCALING_FORCE_CPU": "1",
             "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()},
            "virtual 8-device CPU mesh"),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
