"""Shared test helpers."""

import json
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference")
TA_EXAMPLE = REFERENCE / "examples/Ta_Linear_JCP2014"


def load_config_normalized(path):
    """Load one FitSNAP JSON config and apply the reference's cell
    normalization (QR rotation + PBC wrap, scrape.py:244-312)."""
    with open(path) as f:
        if f.readline()[0] == "{":
            f.seek(0)
        d = json.loads(f.read())["Dataset"]
    dd = d["Data"][0]
    pos = np.array(dd["Positions"], float)
    lat = np.array(dd["Lattice"], float)
    in_cell = lat.T
    q, rr = np.linalg.qr(in_cell)
    rot = np.diagflat(np.sign(np.diag(rr))) @ q.T
    cell = rot @ in_cell
    pos = pos @ rot.T
    invcell = np.linalg.inv(cell.T).T
    frac = pos @ invcell.T
    frac[np.isclose(frac, 0, atol=1e-15)] = 0.0
    _, cfrac = np.divmod(frac, 1)
    pos = cfrac @ cell.T
    out = dict(dd)
    out["Positions"] = pos
    out["CellCols"] = cell
    return out


def read_snapcoeff(path):
    vals = []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if ln and not ln.startswith("#") and "#" in ln:
                vals.append(float(ln.split()[0]))
    return np.array(vals)
