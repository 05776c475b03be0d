"""Summarize a quality_run TensorBoard log into the RESULTS.md artifact.

Prints: per-val PSNR trajectory, point-growth milestones, wall-time
attribution (clean step rate vs densify/val/recompile spikes), NaN/key-drop
event scan, and the final summary line.

Usage: python scripts/report_quality_run.py [--logs /tmp/qrun_ref/logs]
"""
import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", default="/tmp/qrun_ref/logs")
    args = ap.parse_args()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )
    ea = EventAccumulator(args.logs,
                          size_guidance={"scalars": 0})
    ea.Reload()
    tags = ea.Tags()["scalars"]

    def series(tag):
        return [(e.step, e.wall_time, e.value) for e in ea.Scalars(tag)] \
            if tag in tags else []

    loss = series("train/loss")
    pts = series("train/num_valid_points")
    vpsnr = series("val/psnr")
    vssim = series("val/ssim")
    nkeys = series("train/num_keys")

    print("== val PSNR trajectory ==")
    ss = {s: v for s, _, v in vssim}
    for s, _, v in vpsnr:
        print(f"iter {s:>6}: PSNR {v:.2f}  SSIM {ss.get(s, float('nan')):.4f}")

    print("\n== point growth ==")
    if pts:
        marks = [1000, 2000, 4000, 8000, 12000, 16000, 20000, 25000, 30000]
        arr = np.asarray([(s, v) for s, _, v in pts])
        for m in marks:
            i = np.searchsorted(arr[:, 0], m)
            if i < len(arr):
                print(f"iter {int(arr[i,0]):>6}: {int(arr[i,1]):>8} points")
        print(f"peak: {int(arr[:,1].max())} points")

    print("\n== keys ==")
    if nkeys:
        arr = np.asarray([(s, v) for s, _, v in nkeys])
        print(f"final num_keys {int(arr[-1,1])}, peak {int(arr[:,1].max())}")

    print("\n== wall time ==")
    if loss:
        t0, t1 = loss[0][1], loss[-1][1]
        steps = loss[-1][0] - loss[0][0]
        deltas = np.asarray([
            (b[1] - a[1]) / (b[0] - a[0]) * 1000
            for a, b in zip(loss[:-1], loss[1:]) if b[0] > a[0]])
        clean = np.median(deltas)
        print(f"iters {loss[0][0]} -> {loss[-1][0]}: wall {t1-t0:.0f} s "
              f"({(t1-t0)/3600:.2f} h) over {steps} iters = "
              f"{(t1-t0)/max(steps,1)*1000:.0f} ms/iter avg; "
              f"median window rate {clean:.0f} ms/iter; "
              f"spike share {100*(1 - clean*steps/1000/max(t1-t0,1e-9)):.0f}%")

    print("\n== health ==")
    bad = 0
    for tag in ("train/loss", "val/psnr"):
        for s, _, v in series(tag):
            if not np.isfinite(v):
                print(f"NON-FINITE {tag} at iter {s}")
                bad += 1
    print("no non-finite scalar events" if bad == 0 else f"{bad} bad events")


if __name__ == "__main__":
    sys.exit(main())
