"""Genetic-algorithm optimization of per-group fitting weights.

Reference analog: `examples/library/genetic_algorithm/libmod_optimize.py` —
a GA over (eweight, fweight) per group, where each candidate's fitness is
the error of a linear fit performed with those weights. The reference
recomputes nothing per candidate except the weight vector; neither do we:
descriptors are processed ONCE, and each GA evaluation just rescales the
per-row weight vector (built from fs_dict's Groups/Row_Type bookkeeping) and
re-solves the least-squares problem — a dense solve per candidate, so a
whole population evaluates in seconds.

Fitness = etot_weight * (energy RMSE) + ftot_weight * (force RMSE), measured
unweighted over the training set (the reference's fit_and_cost).

Run:  python genetic_algorithm.py [--generations 8 --population 12]
"""

import argparse
import os

import numpy as np

from fitsnap_tpu.fitsnap import FitSnap

EXAMPLES = os.environ.get("FITSNAP_EXAMPLES", "/root/reference/examples")

parser = argparse.ArgumentParser()
parser.add_argument("--data", default=f"{EXAMPLES}/Ta_Linear_JCP2014/JSON")
parser.add_argument("--groups", nargs="*",
                    default=["Displaced_A15", "Displaced_BCC", "Volume_BCC"])
parser.add_argument("--population", type=int, default=12)
parser.add_argument("--generations", type=int, default=8)
parser.add_argument("--etot-weight", type=float, default=1.0)
parser.add_argument("--ftot-weight", type=float, default=1.0)
parser.add_argument("--r-cross", type=float, default=0.9)
parser.add_argument("--r-mut", type=float, default=0.15)
parser.add_argument("--seed", type=int, default=11)
cli = parser.parse_args()

W_CHOICES = np.array([1e-4, 1e-3, 1e-2, 1e-1, 1, 1e1, 1e2, 1e3, 1e4])

settings = {
    "BISPECTRUM": {
        "numTypes": 1, "twojmax": 6, "rcutfac": 4.67637, "rfac0": 0.99363,
        "rmin0": 0.0, "wj": 1.0, "radelem": 0.5, "type": "Ta",
        "bzeroflag": 0,
    },
    "CALCULATOR": {"calculator": "LAMMPSSNAP",
                   "energy": 1, "force": 1, "stress": 1},
    "SOLVER": {"solver": "SVD"},
    "SCRAPER": {"scraper": "JSON"},
    "PATH": {"dataPath": cli.data},
    "OUTFILE": {"metrics": "GA_metrics.md", "potential": "GA_pot"},
    "REFERENCE": {
        "units": "metal", "atom_style": "atomic",
        "pair_style": "hybrid/overlay zero 10.0 zbl 4.0 4.8",
        "pair_coeff1": "* * zero", "pair_coeff2": "* * zbl 73 73",
    },
    "GROUPS": {
        "group_sections": "name training_size testing_size "
                          "eweight fweight vweight",
        "group_types": "str float float float float float",
        **{g: "1.0 0.0 1 1 1e-8" for g in cli.groups},
    },
}

fs = FitSnap(settings, arglist=["--overwrite"])
fs.scrape_configs()
fs.process_configs()          # descriptors computed exactly once

groups = np.asarray(fs.fs_dict["Groups"])
rowtype = np.asarray(fs.fs_dict["Row_Type"])
gnames = sorted(set(groups))
ng = len(gnames)
is_e = rowtype == "Energy"
is_f = rowtype == "Force"
a, b = fs.a, fs.b
base_w = np.where(rowtype == "Stress", 1e-8, 1.0)   # keep stress rows tiny


def fitness(genome):
    """genome: (ng, 2) indices into W_CHOICES for (eweight, fweight)."""
    w = base_w.copy()
    for gi, name in enumerate(gnames):
        sel = groups == name
        w[sel & is_e] = W_CHOICES[genome[gi, 0]]
        w[sel & is_f] = W_CHOICES[genome[gi, 1]]
    aw, bw = w[:, None] * a, w * b
    coeffs = np.linalg.lstsq(aw, bw, rcond=1e-13)[0]
    res = a @ coeffs - b
    e_rmse = np.sqrt(np.mean(res[is_e] ** 2))
    f_rmse = np.sqrt(np.mean(res[is_f] ** 2))
    return cli.etot_weight * e_rmse + cli.ftot_weight * f_rmse, coeffs


rng = np.random.default_rng(cli.seed)
pop = rng.integers(0, len(W_CHOICES), size=(cli.population, ng, 2))
best, best_cost, best_fit = None, np.inf, None

for gen in range(cli.generations):
    costs = []
    for genome in pop:
        cost, coeffs = fitness(genome)
        costs.append(cost)
        if cost < best_cost:
            best, best_cost, best_fit = genome.copy(), cost, coeffs
    costs = np.asarray(costs)
    print(f"gen {gen}: best={best_cost:.6f} "
          f"(mean {costs.mean():.6f})")

    # tournament selection (k=3) + one-point crossover + mutation
    nxt = [best.copy()]                       # elitism
    while len(nxt) < cli.population:
        def pick():
            c = rng.integers(0, cli.population, 3)
            return pop[c[np.argmin(costs[c])]]
        p1, p2 = pick().copy(), pick().copy()
        if rng.random() < cli.r_cross:
            cut = rng.integers(1, ng * 2)
            flat1, flat2 = p1.reshape(-1), p2.reshape(-1)
            flat1[cut:], flat2[cut:] = flat2[cut:].copy(), flat1[cut:].copy()
        for child in (p1, p2):
            m = rng.random(child.shape) < cli.r_mut
            child[m] = rng.integers(0, len(W_CHOICES), m.sum())
            nxt.append(child)
    pop = np.stack(nxt[:cli.population])

print("\nbest per-group (eweight, fweight):")
for gi, name in enumerate(gnames):
    print(f"  {name}: ({W_CHOICES[best[gi, 0]]:g}, "
          f"{W_CHOICES[best[gi, 1]]:g})")

# write the winning potential + its metrics
fs.solver.fit = best_fit
fs.solver.error_analysis(fs.a, fs.b, fs.w, fs.fs_dict)
fs.write_output()
print("written: GA_pot.snapcoeff / GA_pot.snapparam / GA_metrics.md")
