"""Post-fit error/plot utilities on the dumped dataframe (reference
`fitsnap3lib/tools/dataframe_tools.py`).

Operates on the pickled `FitSNAP.df` produced by EXTRAS dump_dataframe (or
a live DataFrame): columns `preds`, `truths`, `weights`, `Row_Type`,
`Groups`, `Testing` (plus the raw descriptor columns).
"""

import numpy as np
import pandas as pd


class DataframeTools:
    def __init__(self, dataframe):
        if isinstance(dataframe, str):
            self.dataframe = dataframe
            self.df = None
        elif isinstance(dataframe, pd.DataFrame):
            self.df = dataframe
        else:
            raise ValueError("dataframe must be a pickle filename or a "
                             "pandas DataFrame")

    def read_dataframe(self):
        self.df = pd.read_pickle(self.dataframe)
        return self.df

    def _frame(self):
        if self.df is None:
            self.read_dataframe()
        return self.df

    def _select(self, quantity, fitting_set, group_set):
        df = self._frame()
        test_bool = {"Training": False, "Testing": True}.get(fitting_set)
        if test_bool is None:
            raise ValueError("fitting_set must be Training or Testing")
        m = (df["Row_Type"] == quantity) & (df["Testing"] == test_bool)
        if group_set is not None:
            if isinstance(group_set, str):
                group_set = [group_set]
            m &= df["Groups"].isin(group_set)
        return df.loc[m]

    def natoms_per_config(self):
        """Atom counts recovered from the Energy/Force row pattern
        (reference dataframe_tools.py:90-105)."""
        row_type = self._frame()["Row_Type"].tolist()
        counts = []
        for rt in row_type:
            if rt == "Energy":
                counts.append(0)
            elif rt == "Force" and counts:
                counts[-1] += 1
        return (np.asarray(counts) // 3).astype(int)

    def calc_error(self, quantity, fitting_set="Testing", group_set=None,
                   metric="mae"):
        """MAE (or RMSE with metric='rmse') of `preds` vs `truths` for
        Energy (already per-atom rows) or Force rows."""
        sel = self._select(quantity, fitting_set, group_set)
        res = np.asarray(sel["preds"]) - np.asarray(sel["truths"])
        if res.size == 0:
            return float("nan")
        if metric == "rmse":
            return float(np.sqrt(np.mean(res ** 2)))
        return float(np.mean(np.abs(res)))

    def plot_agreement(self, quantity, fitting_set="Testing",
                       mode="Distribution", group_set=None, legend=True,
                       peratom=True, fname=None):
        """Truth-vs-prediction scatter (mode='Linear') or residual
        histogram (mode='Distribution'); saves to `fname` when given."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        sel = self._select(quantity, fitting_set, group_set)
        truths = np.asarray(sel["truths"])
        preds = np.asarray(sel["preds"])
        fig, ax = plt.subplots(figsize=(5, 4))
        if mode == "Linear":
            for g in sorted(set(sel["Groups"])):
                gm = sel["Groups"] == g
                ax.scatter(truths[np.asarray(gm)], preds[np.asarray(gm)],
                           s=4, label=g)
            lo = min(truths.min(), preds.min())
            hi = max(truths.max(), preds.max())
            ax.plot([lo, hi], [lo, hi], "k--", lw=0.8)
            ax.set_xlabel(f"target {quantity}")
            ax.set_ylabel(f"model {quantity}")
        else:
            ax.hist(preds - truths, bins=60)
            ax.set_xlabel(f"{quantity} residual")
            ax.set_ylabel("count")
        if legend and mode == "Linear":
            ax.legend(fontsize=6)
        fig.tight_layout()
        if fname:
            fig.savefig(fname, dpi=150)
        plt.close(fig)
        return fig
