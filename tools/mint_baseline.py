#!/usr/bin/env python
"""Turnkey real-data parity kit: mint the AP anchor on a data-capable
machine and emit a ready-to-commit ``TEST.EXPECTED_RESULTS`` block.

This build environment has no network/COCO/released-weights access, so
the real-data AP anchor (reference README.md:104-109 pretrained
Teacher/Student; coco_eval.py:378-436 per-split AP50) must be minted
elsewhere.  This script is the one-command procedure:

  1. imports the released ``.pth`` (teacher or student) through the
     checkpoint key-surgery loader and runs OUR eval
     (``tools/test_net.py``) on real val2017;
  2. optionally runs the REFERENCE eval in the same process tree
     (``--reference-repo``; needs the reference's torch env) and diffs
     bbox/segm AP, AP50, AP50_split_seen, AP50_split_unseen;
  3. writes ``expected_results.yaml`` — a ``TEST.EXPECTED_RESULTS``
     block pinning our measured numbers with the requested tolerance —
     plus ``mint_report.json`` with the full diff.

Typical use on a machine with COCO + the released teacher weights:

  CMPL_TPU_DATA_DIR=/data python tools/mint_baseline.py \\
      --weights pretrained_model/teacher.pth \\
      --config configs/coco_cap_det/zeroshot_mask.yaml \\
      --reference-repo /path/to/cvpr22_cross_modal_pseudo_labeling \\
      --out /tmp/mint

Dry-run on the synthetic verify tree (tests the kit itself; the AP is
meaningless but the plumbing — weight import, eval drive, metrics
artifact, diff, YAML emission — is the real path):

  python tools/mint_baseline.py --dry-run
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the four anchor metrics per iou_type, in reference naming
# (coco_eval.py:396-404; ours matches, data/evaluation/coco_eval.py)
ANCHORS = ["AP", "AP50", "AP50_split_seen", "AP50_split_unseen"]


def run_our_eval(args, extra_opts):
    env = dict(os.environ)
    if args.data:
        env["CMPL_TPU_DATA_DIR"] = args.data
    if args.cpu:
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
    out_dir = os.path.join(args.out, "ours")
    cmd = [
        sys.executable, os.path.join(REPO, "tools/test_net.py"),
        "--config-file", args.config,
        "OUTPUT_DIR", out_dir,
    ]
    if args.weights:
        cmd += ["MODEL.WEIGHT", args.weights]
    cmd += extra_opts
    print("[mint] ours:", " ".join(cmd), flush=True)
    subprocess.run(cmd, cwd=REPO, env=env, check=True)
    metrics = {}
    for fn in sorted(os.listdir(out_dir)):
        m = re.match(r"metrics_(.+)\.json$", fn)
        if m:
            with open(os.path.join(out_dir, fn)) as f:
                metrics[m.group(1)] = json.load(f)
    if not metrics:
        raise RuntimeError(f"no metrics_*.json produced in {out_dir}")
    return metrics


def run_reference_eval(args):
    """Runs the reference's tools/test_net.py and parses COCOResults.

    The reference prints (coco_eval.py:405-414):
        Task: bbox
        AP, AP50, ..., AP50_split_seen, AP50_split_unseen
        0.1234, 0.5678, ...
    """
    out_dir = os.path.join(args.out, "reference")
    os.makedirs(out_dir, exist_ok=True)
    cmd = [
        args.reference_python, "tools/test_net.py",
        "--config-file", args.reference_config or args.config,
        "MODEL.WEIGHT", args.weights,
        "OUTPUT_DIR", out_dir,
    ]
    print("[mint] reference:", " ".join(cmd), flush=True)
    proc = subprocess.run(
        cmd, cwd=args.reference_repo, capture_output=True, text=True
    )
    text = proc.stdout + proc.stderr
    with open(os.path.join(out_dir, "stdout.log"), "w") as f:
        f.write(text)
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference eval failed (rc={proc.returncode}); "
            f"see {out_dir}/stdout.log"
        )
    metrics = {}
    task = None
    names = None
    for line in text.splitlines():
        line = line.strip()
        m = re.match(r"Task: (\w+)$", line)
        if m:
            task, names = m.group(1), None
            continue
        if task and names is None and re.match(r"^AP[,\s]", line):
            names = [n.strip() for n in line.split(",")]
            continue
        if task and names:
            vals = line.split(",")
            if len(vals) == len(names):
                try:
                    metrics.update(
                        {
                            f"{task}/{n}": float(v)
                            for n, v in zip(names, vals)
                        }
                    )
                except ValueError:
                    pass
            task, names = None, None
    if not metrics:
        raise RuntimeError(
            "could not parse COCOResults from reference output; "
            f"see {out_dir}/stdout.log"
        )
    return metrics


def expected_results_block(metrics, sigma):
    """[(iou_type, metric, (mean, std))] rows, reference
    check_expected_results format (coco_eval.py:417-436)."""
    rows = []
    for key, val in sorted(metrics.items()):
        if "/" not in key or "AP50_class" in key:
            continue
        task, metric = key.split("/", 1)
        if metric in ANCHORS and val >= 0:
            rows.append([task, metric, [round(val, 4), sigma]])
    return rows


def main():
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--weights", default="",
                   help="released .pth (teacher/student) or orbax dir")
    p.add_argument("--config",
                   default="configs/coco_cap_det/zeroshot_mask.yaml")
    p.add_argument("--data", default="",
                   help="CMPL_TPU_DATA_DIR override (real COCO root)")
    p.add_argument("--out", default="/tmp/mint_baseline")
    p.add_argument("--sigma", type=float, default=0.005,
                   help="std for the EXPECTED_RESULTS window")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU for our eval")
    p.add_argument("--reference-repo", default="",
                   help="path to the reference checkout; runs its eval "
                        "and diffs (needs its torch/CUDA env)")
    p.add_argument("--reference-python", default="python")
    p.add_argument("--reference-config", default="",
                   help="reference config if its path differs")
    p.add_argument("--dry-run", action="store_true",
                   help="drive the kit on the synthetic verify tree")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None,
                   help="extra KEY VALUE overrides for our eval")
    args = p.parse_args()

    extra_opts = list(args.opts or [])
    if args.dry_run:
        data = "/tmp/verify_st/data"
        if not os.path.isdir(os.path.join(data, "coco")):
            subprocess.run(
                [sys.executable,
                 os.path.join(REPO, ".claude/skills/verify/assets/gen_coco.py")],
                check=True,
            )
        args.data = data
        args.cpu = True
        args.config = os.path.join(
            REPO, ".claude/skills/verify/assets/tiny_zs.yaml"
        )

    os.makedirs(args.out, exist_ok=True)
    ours = run_our_eval(args, extra_opts)

    report = {"ours": ours, "weights": args.weights, "config": args.config}

    if args.reference_repo:
        ref = run_reference_eval(args)
        report["reference"] = ref
        diffs = {}
        for ds_name, m in ours.items():
            for key, val in m.items():
                if key in ref and "AP50_class" not in key:
                    diffs[key] = {
                        "ours": val,
                        "reference": ref[key],
                        "delta": round(val - ref[key], 4),
                    }
        report["diff"] = diffs
        print("[mint] parity diff (ours - reference):")
        for key, d in sorted(diffs.items()):
            print(f"  {key:32s} {d['ours']:.4f} vs {d['reference']:.4f} "
                  f"(delta {d['delta']:+.4f})")

    # EXPECTED_RESULTS from OUR numbers (the regression anchor going
    # forward); one block per test dataset
    yaml_lines = ["TEST:"]
    for ds_name, m in ours.items():
        rows = expected_results_block(m, args.sigma)
        yaml_lines.append(f"  # dataset: {ds_name}")
        yaml_lines.append(
            "  EXPECTED_RESULTS: " + json.dumps(rows)
        )
    yaml_text = "\n".join(yaml_lines) + "\n"
    yaml_path = os.path.join(args.out, "expected_results.yaml")
    with open(yaml_path, "w") as f:
        f.write(yaml_text)
    with open(os.path.join(args.out, "mint_report.json"), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)

    print(f"[mint] wrote {yaml_path}:")
    print(yaml_text)
    print(f"[mint] full report: {args.out}/mint_report.json")


if __name__ == "__main__":
    main()
