"""CLI observability flags: --tarball, --screen2file, --log, --lammpslog.

Reference: tarball packaging `fitsnap3lib/io/outputs/snap.py:44-56`,
logging/screen modes `io/outputs/outputs.py:20-60`.  None of these may be
accepted-and-ignored: tarball/log/screen2file produce files, --lammpslog
warns loudly (no embedded LAMMPS exists here).
"""

import tarfile

import numpy as np
import pytest

from tests.util import REFERENCE
from tests.test_library_mode import _settings

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference examples not available")


def test_tarball_screen2file_log(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.fitsnap import FitSnap

    fs = FitSnap(_settings(twojmax=4), arglist=[
        "--overwrite", "--tarball", "--screen2file", "screen.txt",
        "--log", "run.log"])
    fs.scrape_configs()
    fs.process_configs(delete_data=False)
    fs.perform_fit()
    fs.write_output()

    tarballs = list(tmp_path.glob("fit-*.tar.gz"))
    assert len(tarballs) == 1
    with tarfile.open(tarballs[0]) as tf:
        names = set(tf.getnames())
    assert {"pot.snapcoeff", "pot.snapparam", "pot.mod",
            "in.lammps"} <= names

    from fitsnap_tpu.io.screen import screen
    screen("hello-screen2file")
    assert "hello-screen2file" in (tmp_path / "screen.txt").read_text()
    assert capsys.readouterr().out == ""  # redirected, not printed

    import logging
    logging.getLogger("fitsnap_tpu").info("hello-log")
    assert (tmp_path / "run.log").exists()


def test_lammpslog_warns(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.io.screen import init_output
    from fitsnap_tpu.config import parse_cmdline

    args = parse_cmdline(["--lammpslog", "dummy.in"])
    init_output(args)
    assert "lammpslog" in capsys.readouterr().out


def test_jaxprof_writes_trace(tmp_path, monkeypatch):
    """--jaxprof DIR captures an XLA profiler trace of the CLI run."""
    import runpy
    import sys

    monkeypatch.chdir(tmp_path)
    inp = tmp_path / "prof.in"
    from fitsnap_tpu.tools.config_convert import settings_dict_to_input
    settings_dict_to_input(_settings(twojmax=4), str(inp))
    monkeypatch.setattr(sys, "argv", [
        "fitsnap_tpu", str(inp), "--overwrite",
        "--jaxprof", str(tmp_path / "trace")])
    runpy.run_module("fitsnap_tpu", run_name="__main__")
    traces = list((tmp_path / "trace").rglob("*.xplane.pb"))
    assert traces, "no xplane trace captured"
