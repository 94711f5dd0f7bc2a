"""Bayesian active learning: grow the training set by posterior variance.

Reference analog: `examples/library/bayesian_active_learning/` — fit an ANL
(analytic Bayesian) model on a labeled pool, score every structure in an
unlabeled pool by the predictive variance of its rows under the coefficient
posterior, move the highest-variance structures into the training pool, and
repeat. In production the selected structures would be sent to DFT; here the
unlabeled pool already carries labels, so each round also reports true test
error to show the acquisition actually helps.

The per-structure score is  mean(diag(A_u Sigma A_u^T))  over the rows of the
structure (energy/forces/stress may be re-weighted), with Sigma the ANL
posterior covariance — the same objective as the reference script's default
"sum of EFS variances".

Run:  python bayesian_active_learning.py [--iterations 3 --batch 2]
"""

import argparse
import os

import numpy as np

from fitsnap_tpu.fitsnap import FitSnap

EXAMPLES = os.environ.get("FITSNAP_EXAMPLES", "/root/reference/examples")
AL_DIR = f"{EXAMPLES}/library/bayesian_active_learning"

parser = argparse.ArgumentParser()
parser.add_argument("--training", default=f"{AL_DIR}/training_JSON")
parser.add_argument("--unlabeled", default=f"{AL_DIR}/unlabeled_JSON")
parser.add_argument("--iterations", type=int, default=3)
parser.add_argument("--batch", type=int, default=2,
                    help="structures acquired per iteration")
parser.add_argument("--e-weight", type=float, default=1.0)
parser.add_argument("--f-weight", type=float, default=1.0)
parser.add_argument("--s-weight", type=float, default=1.0)
parser.add_argument("--max-unlabeled", type=int, default=0,
                    help="subsample the unlabeled pool (0 = all)")
parser.add_argument("--max-training", type=int, default=0,
                    help="subsample the initial training pool (0 = all)")
parser.add_argument("--seed", type=int, default=3)
parser.add_argument("--twojmax", type=int, default=6)
cli = parser.parse_args()


def make_fs(data_path):
    groups = sorted(d.name for d in os.scandir(data_path) if d.is_dir())
    settings = {
        "BISPECTRUM": {
            "numTypes": 1, "twojmax": cli.twojmax, "rcutfac": 4.67637,
            "rfac0": 0.99363, "rmin0": 0.0, "wj": 1.0, "radelem": 0.5,
            "type": "Ta", "bzeroflag": 0,
        },
        "CALCULATOR": {"calculator": "LAMMPSSNAP",
                       "energy": 1, "force": 1, "stress": 1},
        "SOLVER": {"solver": "ANL", "cov_nugget": 1e-10},
        "SCRAPER": {"scraper": "JSON"},
        "PATH": {"dataPath": str(data_path)},
        "OUTFILE": {"metrics": "AL_metrics.md", "potential": "AL_pot"},
        "REFERENCE": {
            "units": "metal", "atom_style": "atomic",
            "pair_style": "hybrid/overlay zero 10.0 zbl 4.0 4.8",
            "pair_coeff1": "* * zero", "pair_coeff2": "* * zbl 73 73",
        },
        "GROUPS": {
            "group_sections": "name training_size testing_size "
                              "eweight fweight vweight",
            "group_types": "str float float float float float",
            **{g: "1.0 0.0 100 1 1e-8" for g in groups},
        },
    }
    return FitSnap(settings, arglist=["--overwrite"])


fs = make_fs(cli.training)
training = fs.scrape_configs()
unlabeled = make_fs(cli.unlabeled).scrape_configs()
rng = np.random.default_rng(cli.seed)
if cli.max_unlabeled and len(unlabeled) > cli.max_unlabeled:
    keep = rng.choice(len(unlabeled), cli.max_unlabeled, replace=False)
    unlabeled = [unlabeled[i] for i in keep]
if cli.max_training and len(training) > cli.max_training:
    keep = rng.choice(len(training), cli.max_training, replace=False)
    training = [training[i] for i in keep]

for it in range(cli.iterations):
    # ---- fit the Bayesian model on the current training pool ----
    fs.data = training
    fs.process_configs()
    fs.perform_fit()
    cov = fs.solver.cov                       # coefficient posterior

    # ---- score each unlabeled structure by predictive variance,
    #      and (labels being available here) record its true error ----
    scores, errs = [], []
    for d in unlabeled:
        a, b, w = fs.calculator.process_single(d)
        var = np.einsum("ij,jk,ik->i", a, cov, a)   # diag(A Sigma A^T)
        na = d["NumAtoms"]
        rw = np.concatenate([[cli.e_weight],
                             np.full(3 * na, cli.f_weight),
                             np.full(6, cli.s_weight)])
        scores.append(float(np.mean(rw * var)))
        errs.append(np.abs(a @ fs.solver.fit - b).mean())
    picks = np.argsort(scores)[::-1][:cli.batch]
    print(f"iter {it}: train={len(training)}, unlabeled={len(unlabeled)}, "
          f"pool MAE={np.mean(errs):.5f}, acquiring "
          f"{[unlabeled[i]['File'] for i in picks]}")

    # ---- acquire: move the chosen structures into the training pool ----
    # (with no labels, this is the point where DFT would run)
    for i in sorted(picks)[::-1]:
        training.append(unlabeled.pop(i))
    if not unlabeled:
        break

# final refit so the written potential includes the last acquisition
fs.data = training
fs.process_configs()
fs.perform_fit()
fs.write_output()
print(f"final model (trained on {len(training)} structures) written: "
      "AL_pot.snapcoeff / AL_pot.snapparam")
