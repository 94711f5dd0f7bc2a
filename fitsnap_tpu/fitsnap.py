"""FitSnap facade: scrape -> compute -> fit -> output.

API-compatible with the reference's library mode
(`fitsnap3lib/fitsnap.py:43`): `FitSnap(input, arglist).scrape_configs()`,
`.process_configs()`, `.perform_fit()`, `.write_output()`.

The MPI machinery of the reference (ParallelTools comm splits, shared-memory
windows, row slicing) has no equivalent here: descriptors are computed by
jitted batched kernels, optionally sharded across a TPU mesh
(`fitsnap_tpu.parallel`).
"""

import time

import numpy as np

from fitsnap_tpu.config import Config


def _scraper_factory(config):
    name = config.sections["SCRAPER"].scraper.upper()
    if name == "JSON":
        from fitsnap_tpu.scrapers.json_scraper import JsonScraper
        return JsonScraper(name, config)
    if name == "XYZ":
        from fitsnap_tpu.scrapers.xyz_scraper import XyzScraper
        return XyzScraper(name, config)
    if name == "VASP":
        from fitsnap_tpu.scrapers.vasp_scraper import VaspScraper
        return VaspScraper(name, config)
    raise NotImplementedError(f"scraper {name}")


def _calculator_factory(config):
    name = config.sections["CALCULATOR"].calculator.upper()
    if name == "LAMMPSSNAP":
        from fitsnap_tpu.calculators.snap import SnapCalculator
        return SnapCalculator(name, config)
    if name == "LAMMPSPACE":
        from fitsnap_tpu.calculators.ace import AceCalculator
        return AceCalculator(name, config)
    if name == "LAMMPSCUSTOM":
        from fitsnap_tpu.calculators.custom import CustomCalculator
        return CustomCalculator(name, config)
    raise NotImplementedError(f"calculator {name}")


def _solver_factory(config):
    name = config.sections["SOLVER"].solver.upper()
    linear = {
        "SVD": "fitsnap_tpu.solvers.svd:SVD",
        "TENSORFLOWSVD": "fitsnap_tpu.solvers.svd:TfSVD",
        "RIDGE": "fitsnap_tpu.solvers.linear:Ridge",
        "LASSO": "fitsnap_tpu.solvers.linear:Lasso",
        "ARD": "fitsnap_tpu.solvers.linear:ARD",
        "ANL": "fitsnap_tpu.solvers.linear:ANL",
        "BCS": "fitsnap_tpu.solvers.linear:BCS",
        "MCMC": "fitsnap_tpu.solvers.linear:MCMC",
        "OPT": "fitsnap_tpu.solvers.linear:OPT",
        "MERR": "fitsnap_tpu.solvers.merr:MERR",
        "TPUSVD": "fitsnap_tpu.solvers.tpu_svd:TpuSVD",
        "SCALAPACK": "fitsnap_tpu.solvers.tpu_svd:TpuSVD",  # distributed solve
        "PYTORCH": "fitsnap_tpu.solvers.network:NetworkSolver",
        "NETWORK": "fitsnap_tpu.solvers.network:NetworkSolver",
        "JAX": "fitsnap_tpu.solvers.network:NetworkSolver",
    }
    if name not in linear:
        raise NotImplementedError(f"solver {name}")
    mod_name, cls_name = linear[name].split(":")
    import importlib
    cls = getattr(importlib.import_module(mod_name), cls_name)
    return cls(name, config)


def _output_factory(config):
    style = config.sections["OUTFILE"].output_style.upper()
    if style == "SNAP":
        from fitsnap_tpu.io.outputs.snap_output import SnapOutput
        return SnapOutput(style, config)
    if style == "PACE":
        from fitsnap_tpu.io.outputs.pace_output import PaceOutput
        return PaceOutput(style, config)
    if style == "CUSTOM":
        from fitsnap_tpu.io.outputs.custom_output import CustomOutput
        return CustomOutput(style, config)
    raise NotImplementedError(f"output style {style}")


class FitSnap:
    def __init__(self, input=None, comm=None, arglist=None):
        from fitsnap_tpu.utils.jaxsetup import setup_cache, setup_precision
        setup_precision()
        setup_cache()
        self.comm = comm  # accepted for API compatibility; unused
        self.config = Config(input, arglist or [])
        from fitsnap_tpu.io.screen import init_output
        init_output(self.config.args)
        self.scraper = _scraper_factory(self.config)
        self.calculator = _calculator_factory(self.config)
        self.solver = _solver_factory(self.config)
        self.output = _output_factory(self.config)
        self.data = None
        self.a = self.b = self.w = None
        self.fs_dict = None
        self.fit = None
        self.timings = {}

    # ---------------- pipeline stages ----------------

    def scrape_configs(self, delete_scraper: bool = False):
        t0 = time.time()
        self.scraper.scrape_groups()
        self.scraper.divvy_up_configs()
        self.data = self.scraper.scrape_configs()
        self.timings["scrape"] = time.time() - t0
        if delete_scraper:
            self.scraper = None
        return self.data

    def process_configs(self, data=None, delete_data: bool = False):
        t0 = time.time()
        data = data if data is not None else self.data
        if self.config.sections["CALCULATOR"].nonlinear:
            # NN path: precompute per-atom descriptors + dgrad on device;
            # no materialized A matrix (reference nonlinear layout,
            # `calculators/calculator.py:87`)
            self.solver.prepare_dataset(self.calculator, data)
            self.timings["process"] = time.time() - t0
            if delete_data:
                self.data = None
            return
        self.a, self.b, self.w, self.fs_dict = \
            self.calculator.process_configs(data)
        self.timings["process"] = time.time() - t0
        extras = self.config.sections["EXTRAS"]
        outfile = self.config.sections["OUTFILE"]
        if extras.dump_a:
            np.save(outfile.descriptor_file, self.a)
        if extras.dump_b:
            np.save(outfile.truth_file, self.b)
        if extras.dump_w:
            np.save(outfile.weights_file, self.w)
        if delete_data:
            self.data = None

    def perform_fit(self):
        t0 = time.time()
        if not self.config.args.perform_fit:
            pass
        elif self.config.sections["EXTRAS"].only_test:
            self.fit = self.output.read_fit()
            self.solver.fit = self.fit
        elif self.config.sections["CALCULATOR"].nonlinear:
            self.solver.perform_fit(calculator=self.calculator,
                                    data=self.data)
        else:
            self.solver.perform_fit(self.a, self.b, self.w, self.fs_dict)
            self.fit = self.solver.fit
        self.solver.error_analysis(self.a, self.b, self.w, self.fs_dict)
        self.timings["fit"] = time.time() - t0

    def write_output(self):
        t0 = time.time()
        self.output.output(self.solver.fit, self.solver.errors)
        self.timings["output"] = time.time() - t0
