"""VASP OUTCAR scraper (reference `fitsnap3lib/scrapers/vasp_scraper.py`).

Walks OUTCAR* files per group directory, parses every ionic step (lattice,
positions, forces, stress in kB, energy without entropy — or TOTEN with
`vasp_use_TOTEN`), and emits the standard data dicts.  Unconverged steps
(fewer electronic iterations than NELM allows is not checked here; steps
missing force/energy blocks are skipped).
"""

from os import listdir, path

import numpy as np

from fitsnap_tpu.scrapers.base import Scraper


def _parse_outcar(text, use_toten=False):
    """Yield per-ionic-step dicts from one OUTCAR's contents."""
    lines = text.splitlines()
    elements = []
    ions_per_type = []
    for ln in lines[:2000]:
        if "VRHFIN" in ln:
            elements.append(ln.split("=")[1].split(":")[0].strip())
        if "ions per type" in ln:
            ions_per_type = [int(x) for x in ln.split("=")[1].split()]
            break
    types = []
    for el, n in zip(elements, ions_per_type):
        types += [el] * n
    natoms = len(types)

    steps = []
    cur = {}
    i = 0
    nlines = len(lines)
    lattice = None
    stress = None
    while i < nlines:
        ln = lines[i]
        if "direct lattice vectors" in ln:
            lattice = np.array(
                [[float(x) for x in lines[i + 1 + k].split()[:3]]
                 for k in range(3)])
        elif "in kB" in ln and "Pressure" not in ln:
            vals = [float(x) for x in ln.split()[2:8]]
            # OUTCAR order: XX YY ZZ XY YZ ZX
            xx, yy, zz, xy, yz, zx = vals
            stress = np.array([[xx, xy, zx], [xy, yy, yz], [zx, yz, zz]])
        elif "TOTAL-FORCE (eV/Angst)" in ln:
            pos = np.zeros((natoms, 3))
            frc = np.zeros((natoms, 3))
            for k in range(natoms):
                v = [float(x) for x in lines[i + 2 + k].split()]
                pos[k] = v[:3]
                frc[k] = v[3:6]
            cur = {"Positions": pos, "Forces": frc,
                   "Lattice": lattice, "Stress": stress}
        elif "FREE ENERGIE OF THE ION-ELECTRON SYSTEM" in ln:
            toten = float(lines[i + 2].split()[-2])
            e_wo = None
            for k in range(3, 7):
                if i + k < nlines and "energy(sigma->" in lines[i + k]:
                    e_wo = float(lines[i + k].split()[-1])
                    break
            if cur.get("Positions") is not None:
                cur["Energy"] = toten if use_toten else (
                    e_wo if e_wo is not None else toten)
                cur["AtomTypes"] = list(types)
                cur["NumAtoms"] = natoms
                steps.append(cur)
                cur = {}
        i += 1
    return steps


class VaspScraper(Scraper):
    def scrape_groups(self):
        self.files = {}
        self.tests = {}
        self.configs = {}
        groups = self.config.sections["GROUPS"]
        self.group_table = groups.group_table
        datapath = self.config.sections["PATH"].datapath
        use_toten = getattr(groups, "vasp_use_TOTEN", False)

        for key, row in self.group_table.items():
            folder = path.join(datapath, key)
            outcars = sorted(f for f in listdir(folder)
                             if f.startswith("OUTCAR"))
            step_list = []
            for f in outcars:
                with open(path.join(folder, f), errors="ignore") as fp:
                    for step in _parse_outcar(fp.read(), use_toten):
                        step["File"] = f
                        step["Group"] = key
                        step_list.append(step)
            nconfigs = len(step_list)
            training_size = row.get("training_size", row.get("size", 1.0))
            testing_size = row.get("testing_size", 0)
            if training_size <= 1:
                training_size = max(1, int(training_size * nconfigs + 0.5)) \
                    if training_size not in (0, 1) else int(
                        training_size * nconfigs)
            if 0 < testing_size < 1:
                testing_size = max(1, int(testing_size * nconfigs + 0.5))
            training_size = int(training_size)
            testing_size = int(testing_size)
            self.configs[key] = step_list[:training_size]
            self.tests[key] = step_list[
                training_size:training_size + testing_size]
            row["training_size"] = training_size
            row["testing_size"] = testing_size

    def divvy_up_configs(self):
        flat = []
        self.test_bool = []
        for key in self.configs:
            for s in self.configs[key]:
                flat.append(s)
                self.test_bool.append(0)
        for key in self.tests:
            for s in self.tests[key]:
                flat.append(s)
                self.test_bool.append(1)
        self.configs = flat

    def scrape_configs(self):
        all_data = []
        for i, step in enumerate(self.configs):
            self.data = dict(step)
            natoms = self.data["NumAtoms"]
            self.data["QMLattice"] = (
                np.asarray(self.data["Lattice"], float)
                * self.conversions["Lattice"]).T
            # OUTCAR stress is in kB
            self.data["Stress"] = np.asarray(self.data["Stress"]) * 1000.0
            eshift = self.config.sections["ESHIFT"].eshift
            if eshift:
                for atom in self.data["AtomTypes"]:
                    self.data["Energy"] += eshift.get(atom, 0.0)
            self.data["test_bool"] = self.test_bool[i]
            self.data["Energy"] = float(self.data["Energy"]) \
                * self.conversions["Energy"]
            self.data["Positions"] = np.asarray(self.data["Positions"], float)
            self.data["Forces"] = np.asarray(self.data["Forces"], float)
            self._rotate_coords()
            self._translate_coords()
            self._weighting(natoms)
            all_data.append(self.data)
        return all_data
