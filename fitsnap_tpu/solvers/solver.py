"""Solver base: weight application, error analysis, coefficient reshaping.

Parity with reference `fitsnap3lib/solvers/solver.py`: the grouped
(ncount/mae/rmse/rsq, unweighted+weighted) error table has the same index
structure so metric files diff cleanly against the reference's.
"""

import numpy as np
from pandas import DataFrame, Series, concat


class Solver:
    def __init__(self, name, config, linear=True):
        self.config = config
        self.name = name
        self.fit = None
        self.fit_sam = None
        self.cov = None
        self.errors = []
        self.df = None
        self.linear = linear

    def perform_fit(self, a, b, w, fs_dict):
        raise NotImplementedError

    @staticmethod
    def prepare_data(a, b, w, fs_dict):
        """Apply weights and the training mask."""
        if fs_dict is not None:
            training = np.array([not t for t in fs_dict["Testing"]])
        else:
            training = np.ones(a.shape[0], bool)
        wt = w[training]
        return wt[:, None] * a[training], wt * b[training]

    def _offset(self):
        """Insert the zero constant-offset coefficient per type when
        bzeroflag=1 (reference `solver.py:78`)."""
        num_types = self.config.sections["BISPECTRUM"].numtypes
        ncoeff = self.config.sections["BISPECTRUM"].ncoeff
        fit = self.fit.reshape(num_types, ncoeff)
        fit = np.concatenate([np.zeros((num_types, 1)), fit], axis=1)
        self.fit = fit.reshape(-1)
        if self.fit_sam is not None:
            nsam = self.fit_sam.shape[0]
            fs = self.fit_sam.reshape(nsam, num_types, ncoeff)
            fs = np.concatenate([np.zeros((nsam, num_types, 1)), fs], axis=2)
            self.fit_sam = fs.reshape(nsam, -1)

    @staticmethod
    def _group_errors(g):
        res = g["truths"] - g["preds"]
        mae = np.mean(abs(res))
        ssr = np.square(res).sum()
        n = len(g["truths"])
        rmse = np.sqrt(ssr / n)
        rsq = 1 - ssr / np.sum(np.square(g["truths"] - (g["truths"] / n).sum()))
        w_res = g["weights"] * res
        w_mae = np.mean(abs(w_res))
        w_ssr = np.square(w_res).sum()
        w_n = np.count_nonzero(g["weights"])
        w_rmse = np.sqrt(w_ssr / w_n) if w_n else 0.0
        wt = g["weights"] * g["truths"]
        w_rsq = 1 - w_ssr / np.sum(np.square(wt - (wt / w_n).sum())) if w_n else 0.0
        return Series({"ncount": n, "mae": mae, "rmse": rmse, "rsq": rsq,
                       "w_ncount": w_n, "w_mae": w_mae, "w_rmse": w_rmse,
                       "w_rsq": w_rsq})

    def error_analysis(self, a, b, w, fs_dict):
        self.errors = []
        self.df = DataFrame(a)
        self.df["truths"] = b.tolist()
        if self.fit is not None:
            self.df["preds"] = a @ self.fit
        self.df["weights"] = w.tolist()
        for key, val in fs_dict.items():
            if isinstance(val, list) and len(val) == len(self.df.index):
                self.df[key] = val
        if self.config.sections["EXTRAS"].dump_dataframe:
            self.df.to_pickle(self.config.sections["OUTFILE"].dataframe_file)

        if self.fit is not None:
            cols = ["truths", "preds", "weights"]
            grouped = self.df.groupby(["Groups", "Testing", "Row_Type"])[cols] \
                .apply(self._group_errors)
            grouped = concat(
                {"Unweighted": grouped[["ncount", "mae", "rmse", "rsq"]],
                 "weighted": grouped[["w_ncount", "w_mae", "w_rmse", "w_rsq"]]
                 .rename(columns={"w_ncount": "ncount", "w_mae": "mae",
                                  "w_rmse": "rmse", "w_rsq": "rsq"})},
                names=["Weighting"]).reorder_levels(
                ["Groups", "Weighting", "Testing", "Row_Type"]).sort_index()
            allg = self.df.groupby(["Testing", "Row_Type"])[cols] \
                .apply(self._group_errors)
            allg = concat(
                {"Unweighted": allg[["ncount", "mae", "rmse", "rsq"]],
                 "weighted": allg[["w_ncount", "w_mae", "w_rmse", "w_rsq"]]
                 .rename(columns={"w_ncount": "ncount", "w_mae": "mae",
                                  "w_rmse": "rmse", "w_rsq": "rsq"})},
                names=["Weighting"]).reorder_levels(
                ["Weighting", "Testing", "Row_Type"]).sort_index()
            self.errors = concat([concat({"*ALL": allg}, names=["Groups"]),
                                  grouped])
            self.errors.ncount = self.errors.ncount.astype(int)
            self.errors.index.rename(
                ["Group", "Weighting", "Testing", "Subsystem"], inplace=True)
            self.errors.index = self.errors.index.set_levels(
                ["Testing" if e else "Training"
                 for e in self.errors.index.levels[2]], level=2)

        if self.fit is not None:
            if (self.config.sections["CALCULATOR"].calculator == "LAMMPSSNAP"
                    and self.config.sections["BISPECTRUM"].bzeroflag):
                self._offset()
