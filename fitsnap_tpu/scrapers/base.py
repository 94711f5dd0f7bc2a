"""Scraper base: group file-walk, train/test split, coordinate normalization.

Behavioral parity with reference `fitsnap3lib/scrapers/scrape.py`:
  - group table sizes interpreted as fractions or counts (`scrape_groups`)
  - QR rotation of cells into LAMMPS-normal upper-triangular form with
    lattice vectors as columns (`_rotate_coords`, scrape.py:244)
  - PBC wrap of positions into the cell (`_translate_coords`, scrape.py:286)
  - group / Boltzmann / smart weighting (`_weighting`, scrape.py:323)

File lists are sorted for determinism (the reference uses raw listdir order,
which is filesystem-dependent; fitted coefficients are invariant to order).
"""

import random
from os import listdir, path, stat

import numpy as np

from fitsnap_tpu.units import convert


class Scraper:
    def __init__(self, name, config):
        self.config = config
        self.name = name
        self.group_table = {}
        self.files = {}
        self.tests = None
        self.configs = {}
        self.test_bool = None
        self.data = {}
        self.default_conversions = {
            key: convert(spec)
            for key, spec in config.sections["SCRAPER"].properties.items()}
        self.conversions = dict(self.default_conversions)
        units = config.sections["REFERENCE"].units
        self.kb = {"real": 0.00198198665029335,
                   "metal": 0.00008617333262145}.get(units, 0.00008617333262145)

    def scrape_groups(self):
        self.files = {}
        self.tests = {}
        groups = self.config.sections["GROUPS"]
        self.group_table = groups.group_table
        group_dict = {k: groups.group_types[i]
                      for i, k in enumerate(groups.group_sections)}
        if groups.random_sampling:
            seed = groups.random_seed or random.random()
            random.seed(seed)

        for key, row in self.group_table.items():
            training_size = None
            size_type = None
            bc_bool = False
            if "size" in row:
                training_size = row["size"]
                bc_bool = True
                size_type = group_dict.get("size")
            if "training_size" in row:
                if training_size is not None:
                    raise ValueError("Do not set both size and training size")
                training_size = row["training_size"]
                size_type = group_dict.get("training_size")
            testing_size = row.get("testing_size", 0)
            testing_size_type = group_dict.get("testing_size")
            if training_size is None:
                raise ValueError(f"Please set training size for {key}")

            folder = path.join(self.config.sections["PATH"].datapath, key)
            folder_files = sorted(
                f for f in listdir(folder) if path.isfile(path.join(folder, f)))
            self.files[folder] = [path.join(folder, f) for f in folder_files]
            if groups.random_sampling:
                random.shuffle(self.files[folder])
            nfiles = len(folder_files)

            if training_size < 1 or (training_size == 1 and size_type == float):
                if training_size == 1:
                    training_size = abs(training_size) * nfiles
                elif training_size == 0:
                    pass
                else:
                    training_size = max(1, int(abs(training_size) * nfiles + 0.5))
                if bc_bool and testing_size == 0:
                    testing_size = nfiles - training_size
            if testing_size != 0 and (
                    testing_size < 1
                    or (testing_size == 1 and testing_size_type == float)):
                testing_size = max(1, int(abs(testing_size) * nfiles + 0.5))
            training_size = self._float_to_int(training_size)
            testing_size = self._float_to_int(testing_size)
            if nfiles - testing_size - training_size < 0:
                testing_size = nfiles - training_size

            self.tests[folder] = []
            for _ in range(nfiles - training_size - testing_size):
                self.files[folder].pop()
            for _ in range(testing_size):
                self.tests[folder].append(self.files[folder].pop())
            row["training_size"] = training_size
            row["testing_size"] = testing_size

    def divvy_up_configs(self):
        """Flatten group dict into an ordered config list + test flags."""
        self.test_bool = []
        flat = []
        for folder in self.configs:
            for c in self.configs[folder]:
                flat.append(c if not isinstance(c, list) else c[0])
                self.test_bool.append(0)
        if self.tests is not None:
            for folder in self.tests:
                for c in self.tests[folder]:
                    flat.append(c if not isinstance(c, list) else c[0])
                    self.test_bool.append(1)
        self.configs = flat

    @staticmethod
    def _float_to_int(x):
        if x == 0:
            return int(x)
        if x / int(x) != 1:
            raise ValueError("Training and testing size must be integers")
        return int(x)

    def _rotate_coords(self):
        """QR-rotate the cell upper-triangular; rotate positions/forces/stress."""
        in_cell = np.asarray(self.data["QMLattice"])
        assert np.linalg.det(in_cell) > 0, "Input cell is not right-handed!"
        qmat, rmat = np.linalg.qr(in_cell)
        ss = np.diagflat(np.sign(np.diag(rmat)))
        rot = ss @ qmat.T
        assert np.allclose(rot @ rot.T, np.eye(3)), "Rotation not orthogonal"
        out_cell = rot @ in_cell
        lower = out_cell[np.tril_indices(3, k=-1)]
        assert np.allclose(lower, 0, atol=1e-13), "Cell not upper-triangular"
        self.data["Lattice"] = out_cell
        self.data["Positions"] = (
            self.data["Positions"] * self.conversions["Positions"]) @ rot.T
        if self.config.sections["CALCULATOR"].force:
            self.data["Forces"] = (
                self.data["Forces"] * self.conversions["Forces"]) @ rot.T
        if self.config.sections["CALCULATOR"].stress:
            self.data["Stress"] = rot @ (
                self.data["Stress"] * self.conversions["Stress"]) @ rot.T
        self.data["Rotation"] = rot

    def _translate_coords(self):
        """Wrap positions into the home cell (reference scrape.py:286)."""
        cell = self.data["Lattice"]
        pos = self.data["Positions"]
        invcell = np.linalg.inv(cell.T).T
        frac = pos @ invcell.T
        frac[np.isclose(frac, 0, atol=1e-15)] = 0.0
        trans, cfrac = np.divmod(frac, 1)
        assert ((cfrac >= 0) & (cfrac < 1)).all(), "fractional coords outside cell"
        if (trans == 0).all():
            self.data["Translation"] = np.zeros_like(pos, dtype=float)
            return
        self.data["Positions"] = cfrac @ cell.T
        self.data["Translation"] = trans @ cell.T

    def _weighting(self, natoms):
        groups = self.config.sections["GROUPS"]
        table_row = self.group_table[self.data["Group"]]
        if groups.boltz == 0:
            for key in table_row:
                if "weight" in key:
                    self.data[key] = table_row[key]
        else:
            self.data["eweight"] = np.exp(
                (table_row["eweight"] - self.data["Energy"] / float(natoms))
                / (self.kb * float(groups.boltz)))
            for key in table_row:
                if "weight" in key and key != "eweight":
                    self.data[key] = self.data["eweight"] * table_row[key]
        if groups.smartweights:
            for key in table_row:
                if "weight" in key:
                    denom = (table_row["testing_size"] if self.data["test_bool"]
                             else table_row["training_size"])
                    self.data[key] = self.data[key] / denom if denom else 0
            if self.config.sections["CALCULATOR"].force:
                self.data["fweight"] /= natoms * 3
            if self.config.sections["CALCULATOR"].stress:
                self.data["vweight"] /= 6
