"""Data-parallel NN training parity on the virtual CPU mesh.

The training step shards each minibatch over a "dp" mesh axis, psums loss
numerators/denominators inside `_loss` and gradients in the step
(`solvers/network.py`), so the update is the single-device Adam update at
any device count (SURVEY §7.7; the reference's NN training is limited to a
single process, `docs/source/Pytorch.rst:260-267`).  float64 on CPU makes
DP-vs-single-device parity near-bitwise.  When the training/validation
set is not divisible by the device count, index plans wrap (np.resize) —
that changes minibatch contents by design, so parity cases here use
exactly divisible plans.
"""

import numpy as np
import pytest

from tests.util import TA_EXAMPLE

pytestmark = pytest.mark.skipif(not TA_EXAMPLE.exists(),
                                reason="reference examples not available")


def _train(ndev, batch_size, all_train, data_cache={}):
    from fitsnap_tpu.fitsnap import FitSnap

    fs = FitSnap(str(TA_EXAMPLE.parent / "Ta_PyTorch_NN" / "Ta-example.in"),
                 arglist=["--overwrite", "--devices", str(ndev)])
    if "data" not in data_cache:
        fs.scrape_configs()
        data_cache["data"] = [d for d in fs.data
                              if d["Group"] == "Displaced_BCC"]
    data = data_cache["data"]
    sec = fs.config.sections["PYTORCH"]
    sec.num_epochs = 3
    sec.manual_seed_flag = 1
    sec.batch_size = batch_size
    sec.shuffle_flag = 0        # identical minibatch plans at any ndev
    fs.solver.prepare_dataset(fs.calculator, data)
    if all_train:
        for ds in fs.solver.buckets:
            ds["test"][:] = False
    fs.solver.perform_fit(calculator=fs.calculator, data=data)
    return fs.solver


def _assert_same(s1, s2):
    # psum reduces in tree order, the single device sums sequentially:
    # f64 rounding differs at ~1e-12/step and compounds through Adam, so
    # parity is ~1e-10 over a few epochs, not bitwise
    for a, b in zip(s1.history, s2.history):   # (epoch, train, val)
        assert abs(a[1] - b[1]) < 1e-6 * max(1.0, abs(a[1])), (a, b)
        assert abs(a[2] - b[2]) < 1e-6 * max(1.0, abs(a[2])), (a, b)
    # best-epoch selection can flip between runs when val losses tie at
    # the reduction-order noise level, so params compare loosely
    p1 = [np.asarray(x) for lyr in s1.params for x in lyr]
    p2 = [np.asarray(x) for lyr in s2.params for x in lyr]
    for a, b in zip(p1, p2):
        assert np.abs(a - b).max() < 1e-4


@pytest.mark.heavy
def test_dp8_training_matches_single_device():
    """8-way DP (1 example/device/step) == single device, no val split."""
    import jax
    assert len(jax.devices()) >= 8, "conftest provisions the 8-device mesh"
    s1 = _train(1, batch_size=8, all_train=True)
    s8 = _train(8, batch_size=8, all_train=True)
    _assert_same(s1, s8)


@pytest.mark.heavy
def test_dp3_training_with_validation_matches():
    """3-way DP with a live validation split (6 train / 3 val configs)."""
    s1 = _train(1, batch_size=3, all_train=False)
    s3 = _train(3, batch_size=3, all_train=False)
    _assert_same(s1, s3)


def test_batch_size_below_device_count_rejected():
    """batch_size < devices cannot give each device an example per step;
    it must fail loudly instead of silently inflating the minibatch."""
    import pytest

    with pytest.raises(ValueError, match="batch_size"):
        _train(4, batch_size=2, all_train=True)
