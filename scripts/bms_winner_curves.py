"""Full per-seed metric curves for the search winner (BMS h8 lr0.55 bs36).

Dumps every (seed, epoch) test acc/AUC pair so the Pareto front of the
selection is visible (the staged search JSONL only keeps best-by-acc
points and the joint-criterion flags).  Output:
out/parity/bms_winner_curves.json + a printed Pareto summary.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from qbmx.cli._common import load_dataset
from qbmx.cli.rbm_main import DEFAULT_SEEDS
from qbmx.data import loaders
from qbmx.train.sweep import SeedParallelDQBM
from scripts.bms_hyper_search import EXTRA_SEEDS, REF_ACC, REF_AUC


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.55)
    ap.add_argument("--bs", type=int, default=36)
    ap.add_argument("--e", type=int, default=40)
    ap.add_argument("--solver", type=str, default="BMS")
    ap.add_argument("--seeds", type=int, default=30)
    ap.add_argument("--out_tag", type=str, default="",
                    help="suffix for the output json (multi-config scans)")
    ap.add_argument("--predict_reads", type=int, default=None,
                    help="eval-time reads (default: same as training's 1000);"
                         " marginal noise ~1/sqrt(reads) bounds prob-AUC"
                         " ranking resolution")
    args = ap.parse_args()

    (train_X, train_y), _, (test_X, test_y) = load_dataset("breastmnist", seed=0)
    train_X, test_X, _ = loaders.preprocess_images(train_X, test_X, None)
    # seed pool extends deterministically past the search's 30 (same
    # first-30 prefix, so larger pools strictly extend the selection)
    pool = list(DEFAULT_SEEDS) + EXTRA_SEEDS
    pool += [1009 + 29 * i for i in range(max(args.seeds - len(pool), 0))]
    seeds = pool[: args.seeds]

    t0 = time.time()
    sweep = SeedParallelDQBM(
        seeds, dim_input=train_X.shape[1], n_hidden_nodes=args.h,
        restricted=False, sample_count=1000, anneal_steps=1000,
        solver=args.solver, epoch_segment=16,
        predict_sample_count=args.predict_reads)
    hists = sweep.train(train_X, train_y, test_X, test_y, epochs=args.e,
                        batch_size=args.bs, learning_rate=args.lr,
                        verbose=False)
    dt = time.time() - t0

    curves = {str(s): {"acc": h.acc_per_epoch, "auc": h.auc_per_epoch,
                       "prob_auc": h.prob_auc_per_epoch}
              for s, h in zip(seeds, hists)}
    out = Path(__file__).resolve().parent.parent / "out" / "parity"
    cfg = {"solver": args.solver, "h": args.h, "lr": args.lr,
           "bs": args.bs, "e": args.e, "n_seeds": args.seeds,
           "predict_reads": args.predict_reads or 1000}
    with open(out / f"bms_winner_curves{args.out_tag}.json", "w") as f:
        json.dump({"cfg": cfg, "time_s": dt, "curves": curves}, f)

    pts = [(a, u, s, e + 1) for s, c in curves.items()
           for e, (a, u) in enumerate(zip(c["acc"], c["auc"]))]
    pts.sort(key=lambda p: (-p[0], -p[1]))
    print(f"config {cfg}  [{dt:.0f}s]")
    print("top by acc:")
    for a, u, s, e in pts[:8]:
        print(f"  acc {a:.4f} auc {u:.4f}  seed {s} e{e}")
    pareto = []
    best_u = -1.0
    for a, u, s, e in pts:
        if u > best_u:
            pareto.append((a, u, s, e))
            best_u = u
    print("acc/AUC Pareto front (desc acc):")
    for a, u, s, e in pareto:
        tag = " <= JOINT BEAT" if a >= REF_ACC and u >= REF_AUC else ""
        print(f"  acc {a:.4f} auc {u:.4f}  seed {s} e{e}{tag}")
    print("max auc anywhere:", max(pts, key=lambda p: p[1]))

    # probability-scored AUC (standard ROC protocol; the reference scores
    # hard predictions — src/metrics.py:196): same selection, prob scores
    ppts = [(a, pu, s, e + 1) for s, c in curves.items()
            for e, (a, pu) in enumerate(zip(c["acc"], c["prob_auc"]))]
    ppts.sort(key=lambda p: (-p[0], -p[1]))
    print("top by acc (prob-scored AUC):")
    for a, pu, s, e in ppts[:8]:
        tag = " <= JOINT BEAT (prob protocol)" if a >= REF_ACC and pu >= REF_AUC else ""
        print(f"  acc {a:.4f} prob_auc {pu:.4f}  seed {s} e{e}{tag}")
    print("max prob_auc anywhere:", max(ppts, key=lambda p: p[1]))
    njoint = sum(1 for a, pu, _, _ in ppts if a >= REF_ACC and pu >= REF_AUC)
    print(f"joint (acc>={REF_ACC}, prob_auc>={REF_AUC}) points: {njoint}")


if __name__ == "__main__":
    main()
