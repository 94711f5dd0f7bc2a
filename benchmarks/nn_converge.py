"""Ta_PyTorch_NN convergence proof: train to convergence, locate the epoch.

The reference publishes one NN convergence anchor for this example: it
"might take ~200 epochs to fully converge (see loss_vs_epochs.dat)" at
~0.2 s/epoch on CPU (docs/source/Pytorch.rst:248-256; no MAE value is
published).  This benchmark trains the shipped example to `--epochs`
(default 400) with the working ReduceLROnPlateau opted in, reports

  - the val loss at the reference's ~200-epoch anchor and the first epoch
    within 1.5x of the run's best val loss,
  - final testing-set energy / force MAE (solver error analysis),

and FAILS (nonzero exit / "converged": false) if the final testing
energy/force MAEs are worse than the linear SNAP fit of the same data
(0.1128 eV/atom / 0.0758 eV/A, 20May21_Standard Ta_metrics.md — the
natural "published run" bound for this dataset: the NN must not lose to
the linear model it generalizes).  Measured r05: the val loss at the
reference's ~200-epoch anchor is ~2.2x the 400-epoch best (the curve is
still improving at 400 — "fully converged at ~200" is optimistic even for
the reference's own trajectory), and the 400-epoch NN beats the linear
fit on both testing MAEs.

Run: python benchmarks/nn_converge.py [--epochs N]
"""

import time


def run(epochs=400):
    import jax
    import numpy as np
    jax.config.update("jax_enable_x64", True)

    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.utils.jaxsetup import setup_cache, warm_transfers

    setup_cache()
    warm_transfers()
    t_all = time.time()
    fs = FitSnap("/root/reference/examples/Ta_PyTorch_NN/Ta-example.in",
                 arglist=[
                     "--overwrite",
                     "--keyword", "PYTORCH", "num_epochs", str(epochs),
                     "--keyword", "PYTORCH", "manual_seed_flag", "1",
                     "--keyword", "PYTORCH", "lr_plateau_flag", "1",
                     "--keyword", "PYTORCH", "save_state_output", "None",
                     "--keyword", "EXTRAS", "dump_peratom", "0",
                     "--keyword", "EXTRAS", "dump_perconfig", "0",
                     "--keyword", "EXTRAS", "dump_configs", "0",
                 ])
    fs.scrape_configs()
    fs.process_configs(delete_data=False)
    t0 = time.time()
    fs.perform_fit()
    t_fit = time.time() - t0
    fs.solver.error_analysis()
    err = fs.solver.errors
    vls = np.array([v for _, _, v in fs.solver.history])
    best = float(vls.min())
    at_anchor = float(vls[min(199, len(vls) - 1)])
    # first epoch within 1.5x of the run's best val loss (the curve keeps
    # improving through 400 epochs; there is no sharp "converged" point)
    within = np.nonzero(vls <= 1.5 * best)[0]
    near_epoch = int(within[0]) if within.size else epochs
    row = err.loc[("*ALL", "Testing")]
    emae, fmae = float(row["mae_E"]), float(row["mae_F"])
    # linear SNAP on the same data (20May21_Standard Ta_metrics.md):
    # E-MAE 0.1128 eV/atom, F-MAE 0.0758 eV/A — the NN must beat both
    converged = fmae < 0.0758 and emae < 0.1128
    print(f"{epochs} epochs in {t_fit:.1f}s; best val loss {best:.6f} "
          f"(at the reference's ~200-epoch anchor: {at_anchor:.6f}); "
          f"within 1.5x of best at epoch {near_epoch}; "
          f"final LR {fs.solver.final_lr:.2e}; "
          f"testing E-MAE {emae:.6f} eV/atom (linear 0.1128), "
          f"F-MAE {fmae:.6f} eV/A (linear 0.0758); "
          f"TOTAL {time.time()-t_all:.1f}s", flush=True)
    if not converged:
        print("CONVERGENCE GATE FAILED (NN loses to the linear fit)",
              flush=True)
    return {
        "epochs": epochs,
        "near_epoch": near_epoch,
        "best_val_loss": best,
        "val_loss_at_200": at_anchor,
        "test_energy_mae": emae,
        "test_force_mae": fmae,
        "converged": bool(converged),
        "fit_seconds": t_fit,
    }


def main():
    import argparse
    import sys
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    a = ap.parse_args()
    out = run(epochs=a.epochs)
    sys.exit(0 if out["converged"] else 1)


if __name__ == "__main__":
    main()
