"""Converter tools: vasprun.xml -> JSON / extended XYZ, ACE defaults.

The XYZ output must round-trip through the real XyzScraper (frame layout =
reference `tools/xml2xyz.py:35-57`; stress converted kB -> bar, which the
reference script omits).
"""

import numpy as np
import pytest

VASPRUN = """<?xml version="1.0" encoding="ISO-8859-1"?>
<modeling>
 <atominfo>
  <atoms>2</atoms>
  <array name="atoms"><dimension dim="1">ion</dimension>
   <set>
    <rc><c>In</c><c>1</c></rc>
    <rc><c>P </c><c>2</c></rc>
   </set>
  </array>
 </atominfo>
 <calculation>
  <structure>
   <crystal>
    <varray name="basis">
     <v> 5.0 0.0 0.0 </v><v> 0.0 5.0 0.0 </v><v> 0.0 0.0 5.0 </v>
    </varray>
   </crystal>
   <varray name="positions">
    <v> 0.0 0.0 0.0 </v><v> 0.25 0.25 0.25 </v>
   </varray>
  </structure>
  <varray name="forces">
   <v> 0.1 -0.2 0.3 </v><v> -0.1 0.2 -0.3 </v>
  </varray>
  <varray name="stress">
   <v> 10.0 1.0 0.0 </v><v> 1.0 12.0 0.0 </v><v> 0.0 0.0 9.0 </v>
  </varray>
  <energy><i name="e_0_energy"> -11.25 </i></energy>
 </calculation>
 <calculation>
  <structure>
   <crystal>
    <varray name="basis">
     <v> 5.1 0.0 0.0 </v><v> 0.0 5.1 0.0 </v><v> 0.0 0.0 5.1 </v>
    </varray>
   </crystal>
   <varray name="positions">
    <v> 0.01 0.0 0.0 </v><v> 0.26 0.25 0.25 </v>
   </varray>
  </structure>
  <varray name="forces">
   <v> 0.4 0.0 0.0 </v><v> -0.4 0.0 0.0 </v>
  </varray>
  <energy><i name="e_0_energy"> -11.50 </i></energy>
 </calculation>
</modeling>
"""


@pytest.fixture
def vasprun(tmp_path):
    p = tmp_path / "vasprun.xml"
    p.write_text(VASPRUN)
    return p


def test_vasprun_to_json(vasprun, tmp_path):
    from fitsnap_tpu.tools.vasp2json import vasprun_to_json

    docs = vasprun_to_json(str(vasprun), str(tmp_path / "out"), write=True)
    assert len(docs) == 2
    d = docs[0]["Dataset"]["Data"][0]
    assert d["AtomTypes"] == ["In", "P"]
    np.testing.assert_allclose(d["Positions"][1], [1.25, 1.25, 1.25])
    assert d["Energy"] == -11.25
    assert docs[0]["Dataset"]["StressStyle"] == "kB"
    assert (tmp_path / "out1.json").exists()
    assert (tmp_path / "out2.json").exists()
    assert "Stress" not in docs[1]["Dataset"]["Data"][0]


def test_vasprun_to_xyz_roundtrip(vasprun, tmp_path, monkeypatch):
    """The written XYZ parses under the real XyzScraper with identical
    geometry/truths (and stress in bar)."""
    monkeypatch.chdir(tmp_path)
    from fitsnap_tpu.config import Config
    from fitsnap_tpu.scrapers.xyz_scraper import XyzScraper
    from fitsnap_tpu.tools.vasp2json import vasprun_to_xyz

    xyzdir = tmp_path / "XYZ"
    xyzdir.mkdir()
    n = vasprun_to_xyz(str(vasprun), str(xyzdir / "Frames.xyz"))
    assert n == 2

    cfg = Config({
        "BISPECTRUM": {"numTypes": 2, "twojmax": "4 4", "rcutfac": 1.0,
                       "rfac0": 0.99, "wj": "1 1", "radelem": "2 2",
                       "type": "In P"},
        "CALCULATOR": {"calculator": "LAMMPSSNAP", "energy": 1,
                       "force": 1, "stress": 1},
        "SOLVER": {"solver": "SVD"},
        "SCRAPER": {"scraper": "XYZ"},
        "PATH": {"dataPath": str(xyzdir)},
        "OUTFILE": {"metrics": "m.md", "potential": "p"},
        "REFERENCE": {"units": "metal", "atom_style": "atomic",
                      "pair_style": "zero 6.0", "pair_coeff": "* *"},
        "GROUPS": {"group_sections": "name training_size testing_size "
                                     "eweight fweight vweight",
                   "group_types": "str float float float float float",
                   "Frames": "1.0 0.0 1 1 1"},
    }, arglist=["--overwrite"])
    sc = XyzScraper("XYZ", cfg)
    sc.scrape_groups()
    sc.divvy_up_configs()
    data = sc.scrape_configs()
    assert len(data) == 2
    d0 = data[0]
    assert d0["NumAtoms"] == 2
    assert d0["Energy"] == pytest.approx(-11.25)
    # frac (0.25,0.25,0.25) in a 5A cube
    np.testing.assert_allclose(np.sort(np.ravel(d0["Forces"]))[-1], 0.3)
    assert d0["Stress"][0, 0] == pytest.approx(10.0 * 1000.0)  # kB -> bar
    assert data[1]["Energy"] == pytest.approx(-11.50)


def test_ace_defaults():
    from fitsnap_tpu.tools.ace_defaults import (bond_lengths,
                                                default_ace_settings)

    d = default_ace_settings(["In", "P"], nshell=2.2)
    for key in ("rcutfac", "lambda", "rcinner", "drcinner"):
        assert len(d[key].split()) == 4          # product(types, types)
    rc = [float(x) for x in d["rcutfac"].split()]
    lm = [float(x) for x in d["lambda"].split()]
    ri = [float(x) for x in d["rcinner"].split()]
    assert all(r > 2.0 for r in rc)
    np.testing.assert_allclose(lm, [0.05 * r for r in rc], atol=5e-4)
    # symmetric bonds: In-P == P-In
    assert rc[1] == rc[2] and ri[1] == ri[2]
    # inner cutoffs sit inside the shortest bond
    for b, (mn, mx) in d["rc_range"].items():
        assert 0 < mn < mx
    assert "pair_style = hybrid/overlay zero" in d["reference"]
    assert "49 15" in d["reference"]             # In-P pair atomic numbers
    # metal-metal pair uses ionic radii only
    mn, mx = bond_lengths("Ta", "Ta")
    assert mn == pytest.approx(0.8 * 2.9, abs=1e-6)
    assert mx == pytest.approx(2.9, abs=1e-6)
    # reference's asymmetric metal+nonmetal branches after sorting
    # (default_ACE_settings.py:44-56): N-W (nonmetal first) falls through
    # to the unscaled ionic sum; Ta-C (metal first) gets ionic+vdW and 0.8
    mn, mx = bond_lengths("N", "W")
    assert mn == pytest.approx(0.65 + 1.35, abs=1e-6)
    assert mx == pytest.approx(0.65 + 1.35, abs=1e-6)
    mn, mx = bond_lengths("Ta", "C")   # sorted -> (C, Ta): nonmetal first
    assert (mn, mx) == bond_lengths("C", "Ta")
    assert mx == pytest.approx(0.7 + 1.45, abs=1e-6)
    with pytest.raises(ValueError):
        default_ace_settings(["P", "In"])
