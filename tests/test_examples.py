"""The shipped library example scripts run end to end (examples/library/).

Each script is executed in-process (runpy) with shrunk arguments so the
whole module stays seconds-scale; the persistent XLA cache shares compiled
kernels across scripts. Mirrors the reference's stance that the library
examples double as integration tests (`examples/library/*/README`).
"""

import runpy
import sys
from pathlib import Path

import pytest

from tests.util import REFERENCE

EXAMPLES = Path(__file__).resolve().parents[1] / "examples" / "library"

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference examples not available")


def _run(script, argv, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [script] + argv)
    runpy.run_path(str(EXAMPLES / script), run_name="__main__")
    return capsys.readouterr().out


def test_basic(tmp_path, monkeypatch, capsys):
    out = _run("basic.py", ["--groups", "Displaced_A15"],
               tmp_path, monkeypatch, capsys)
    assert "Force" in out
    assert (tmp_path / "Ta_pot.snapcoeff").exists()
    assert (tmp_path / "Ta_metrics.md").exists()


def test_ase_scrape(tmp_path, monkeypatch, capsys):
    out = _run("ase_scrape.py", ["--frames", "2"],
               tmp_path, monkeypatch, capsys)
    assert "Found 2 configurations" in out
    assert "fit coefficients" in out


def test_custom_scrape(tmp_path, monkeypatch, capsys):
    out = _run("custom_scrape.py", ["--frames", "3"],
               tmp_path, monkeypatch, capsys)
    assert "Injecting 3 configurations" in out
    assert (tmp_path / "custom_pot.snapcoeff").exists()


def test_inject_configs(tmp_path, monkeypatch, capsys):
    out = _run("inject_configs.py", [], tmp_path, monkeypatch, capsys)
    assert "Force" in out
    assert (tmp_path / "inject_pot.snapcoeff").exists()


def test_loop_over_fits(tmp_path, monkeypatch, capsys):
    out = _run("loop_over_fits.py",
               ["--groups", "Displaced_A15", "--twojmax", "2", "4"],
               tmp_path, monkeypatch, capsys)
    assert "twojmax=2" in out and "twojmax=4" in out


@pytest.mark.heavy
def test_transpose_trick(tmp_path, monkeypatch, capsys):
    out = _run("transpose_trick.py",
               ["--groups", "Displaced_A15", "Volume_BCC",
                "--twojmax", "4"],
               tmp_path, monkeypatch, capsys)
    diff = float(out.rsplit("coefficient diff:", 1)[1].split()[0])
    assert diff < 1e-6
    assert (tmp_path / "Ta_pot.snapcoeff").exists()


@pytest.mark.heavy
def test_bayesian_active_learning(tmp_path, monkeypatch, capsys):
    out = _run("bayesian_active_learning.py",
               ["--iterations", "2", "--batch", "1", "--max-unlabeled", "5",
                "--max-training", "10", "--twojmax", "4"],
               tmp_path, monkeypatch, capsys)
    assert "iter 1:" in out and "acquiring" in out
    assert (tmp_path / "AL_pot.snapcoeff").exists()


def test_genetic_algorithm(tmp_path, monkeypatch, capsys):
    out = _run("genetic_algorithm.py",
               ["--groups", "Liquid", "Surface", "--population", "6",
                "--generations", "3"],
               tmp_path, monkeypatch, capsys)
    assert "best per-group" in out
    assert (tmp_path / "GA_pot.snapcoeff").exists()


@pytest.mark.heavy
def test_big_config(tmp_path, monkeypatch, capsys):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices (virtual CPU mesh)")
    out = _run("big_config.py", ["--natoms", "128"],
               tmp_path, monkeypatch, capsys)
    rmse = float(out.rsplit("force RMSE vs generating potential:",
                            1)[1].split()[0])
    assert rmse < 1e-3       # eV/A; row exactness lives in test_spatial_fit


@pytest.mark.heavy
def test_multichip(tmp_path, monkeypatch, capsys):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices (virtual CPU mesh)")
    out = _run("multichip.py", ["--groups", "Liquid", "Surface"],
               tmp_path, monkeypatch, capsys)
    diff = float(out.rsplit("coefficient diff:", 1)[1].split()[0])
    assert diff < 1e-6
