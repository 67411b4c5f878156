"""Side-by-side identical-data A/B: reference torch trainer vs kvae_tpu.

Consumes the reference run's scalars.jsonl (written by
tools/run_reference_train.py's logger stub) and train.log (imputation
lines), and our run's metrics.jsonl + train.log, and prints a
PARITY-ready markdown table of val loss / KF ELBO / imputation MSE at
matching epochs.

Run: python tools/compare_ab.py --ref /tmp/ref_runs/<ts> --ours /tmp/ab_ours_runs/<ts>
"""
import argparse
import json
import re
from pathlib import Path


def load_ref(run_dir: Path):
    by_epoch = {}
    scal = run_dir / "scalars.jsonl"
    if scal.exists():
        with open(scal) as f:
            for line in f:
                rec = json.loads(line)
                e = rec.get("step")
                if e is None:
                    continue
                # the reference logs epochs 0-indexed (step 0 = its
                # "Epoch 001" log line); align to our 1-indexed epochs
                row = by_epoch.setdefault(e + 1, {})
                for k in ("val/loss", "val/elbo_kf", "val/elbo_vae_total"):
                    if k in rec:
                        row[k.split("/")[1]] = rec[k]
    # imputation lines only land in train.log
    imp_re = re.compile(
        r"Imputation planning .*smooth: ([0-9.e+-]+), filt: ([0-9.e+-]+)"
    )
    epoch_re = re.compile(r"Epoch (\d+)")
    cur_epoch = None
    with open(run_dir / "train.log") as f:
        for line in f:
            m = epoch_re.search(line)
            if m:
                cur_epoch = int(m.group(1))
            m = imp_re.search(line)
            if m and cur_epoch is not None:
                # the reference prints epoch N's imputation BEFORE its
                # "Epoch N" summary header, so the last seen header is N-1
                row = by_epoch.setdefault(cur_epoch + 1, {})
                row["mse_smooth"] = float(m.group(1))
                row["mse_filt"] = float(m.group(2))
    return by_epoch


def load_ours(run_dir: Path):
    by_epoch = {}
    with open(run_dir / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            e = rec.get("epoch")
            if e is None:
                continue
            row = by_epoch.setdefault(e, {})
            if rec.get("split") == "val" and "loss" in rec:
                row["loss"] = rec["loss"]
                row["elbo_kf"] = rec.get("elbo_kf")
            if rec.get("split") == "val_imputation":
                row["mse_smooth"] = rec.get("mse_smooth")
                row["mse_filt"] = rec.get("mse_filt")
    return by_epoch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True)
    ap.add_argument("--ours", required=True)
    ap.add_argument("--epochs", type=int, nargs="+",
                    default=[5, 10, 20, 30, 40, 50, 60, 70, 80])
    args = ap.parse_args()
    ref = load_ref(Path(args.ref))
    ours = load_ours(Path(args.ours))

    def fmt(v, spec=".3f"):
        return format(v, spec) if isinstance(v, (int, float)) else "-"

    print("| epoch | ref val loss | ours val loss | gap % | ref KF | ours KF "
          "| ref mse_smooth | ours mse_smooth |")
    print("|---|---|---|---|---|---|---|---|")
    for e in args.epochs:
        r = ref.get(e, {})
        o = ours.get(e, {})
        gap = ""
        if isinstance(r.get("loss"), float) and isinstance(o.get("loss"), float):
            gap = f"{100.0 * (o['loss'] - r['loss']) / abs(r['loss']):+.1f}"
        print(f"| {e} | {fmt(r.get('loss'))} | {fmt(o.get('loss'))} | {gap} "
              f"| {fmt(r.get('elbo_kf'))} | {fmt(o.get('elbo_kf'))} "
              f"| {fmt(r.get('mse_smooth'), '.4e')} "
              f"| {fmt(o.get('mse_smooth'), '.4e')} |")


if __name__ == "__main__":
    main()
