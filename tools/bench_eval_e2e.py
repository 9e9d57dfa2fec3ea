#!/usr/bin/env python
"""End-to-end eval wall-clock: drives the real ``tools/test_net.py``
over a production-size synthetic COCO val set and reports e2e imgs/s
vs the device-only forward rate.

The round-3 eval bench (tools/bench_eval.py) measured the device
forward alone (57 imgs/s, 50.7% MFU); the reference logs the full
split — total time vs model time — in engine/inference.py:136-156.
This closes that gap: JPEG decode -> resize -> collate -> device
forward -> threaded Masker paste + RLE conversion -> COCO accumulate,
measured as the user sees it.

Random-init weights score every box below SCORE_THRESH, which would
zero out the host paste work; the drive therefore forces
``MODEL.ROI_HEADS.SCORE_THRESH 0.0`` so every image carries the full
DETECTIONS_PER_IMG=100 masks through conversion — an upper bound on
the host-side load (real checkpoints emit fewer detections).

  python tools/bench_eval_e2e.py --images 200          # on the chip
  python tools/bench_eval_e2e.py --images 4 --cpu      # smoke
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INFER_RE = re.compile(
    r"inference: (\d+) images, ([\d.]+) s/img device "
    r"\(steady ([\d.]+) excl. first-batch ([\d.]+) s\), "
    r"([\d.]+) s/img e2e "
    r"\(([\d.]+) imgs/s e2e; steady ([\d.]+) imgs/s; "
    r"device busy (\d+)%\)"
)
EVAL_RE = re.compile(r"'total_eval_seconds': ([\d.]+)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=200)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--data", default="/tmp/synth_coco")
    p.add_argument("--out", default="/tmp/bench_eval_e2e")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--config",
                   default="configs/coco_cap_det/zeroshot_mask.yaml")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    if not os.path.isdir(os.path.join(args.data, "coco")):
        subprocess.check_call(
            [sys.executable, os.path.join(REPO, "tools/synth_coco.py"),
             "--out", args.data, "--train", "8", "--val",
             str(args.images)]
        )

    env = dict(os.environ, CMPL_TPU_DATA_DIR=args.data)
    overrides = [
        "TEST.IMS_PER_BATCH", str(args.batch),
        "MODEL.ROI_HEADS.SCORE_THRESH", "0.0",
        # one dataset is enough for the timing split; the all-split is
        # the largest (seen+unseen vocab)
        "DATASETS.TEST", "('coco_generalized_zeroshot_val',)",
        "OUTPUT_DIR", args.out,
    ]
    if args.cpu:
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        overrides += [
            "INPUT.MIN_SIZE_TEST", "64",
            "INPUT.MAX_SIZE_TEST", "64",
            "TPU.IMAGE_BUCKETS", "((64, 64),)",
            "TPU.COMPUTE_DTYPE", "float32",
            "TPU.NMS_TILE", "64",
            "MODEL.RPN.PRE_NMS_TOP_N_TEST", "128",
            "MODEL.RPN.POST_NMS_TOP_N_TEST", "32",
        ]

    cmd = [
        sys.executable, os.path.join(REPO, "tools/test_net.py"),
        "--config-file", os.path.join(REPO, args.config),
    ] + overrides + (args.opts or [])
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    m = None
    ev = None
    for line in proc.stdout.splitlines():
        mm = INFER_RE.search(line)
        if mm:
            m = mm
        me = EVAL_RE.search(line)
        if me:
            ev = float(me.group(1))
    if proc.returncode != 0 or m is None:
        sys.stderr.write("\n".join(proc.stdout.splitlines()[-40:]) + "\n")
        raise SystemExit(f"test_net failed rc={proc.returncode}")

    result = {
        "metric": "eval_e2e_imgs_per_sec",
        "value": float(m.group(7)),
        "unit": "imgs/sec (test_net e2e: decode+forward+paste+RLE)",
        "images": int(m.group(1)),
        "s_per_img_device": float(m.group(2)),
        "s_per_img_device_steady": float(m.group(3)),
        "first_batch_compile_s": float(m.group(4)),
        "s_per_img_e2e": float(m.group(5)),
        "imgs_per_sec_incl_compile": float(m.group(6)),
        "device_busy_pct": float(m.group(8)),
        "coco_eval_seconds": ev,
        "wall_s_total": round(time.time() - t0, 1),
        "batch": args.batch,
        "backend": "cpu" if args.cpu else "tpu",
        "score_thresh": 0.0,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
