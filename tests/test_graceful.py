"""GracefulStop signal handling (reference GracefulKiller,
fitsnap3lib/parallel_tools.py:74-92): first signal requests a clean stop at
the next stage boundary, second signal aborts."""

import os
import signal

import pytest


def test_first_signal_requests_stop_second_aborts():
    from fitsnap_tpu.utils.graceful import GracefulStop

    msgs = []
    prev_term = signal.getsignal(signal.SIGTERM)
    with GracefulStop(screen=msgs.append) as stop:
        assert not stop
        os.kill(os.getpid(), signal.SIGTERM)
        assert stop.requested and bool(stop)
        with pytest.raises(SystemExit) as e:
            os.kill(os.getpid(), signal.SIGTERM)
        assert e.value.code == 128 + signal.SIGTERM
    assert any("finishing the current stage" in m for m in msgs)
    # handlers restored on exit
    assert signal.getsignal(signal.SIGTERM) is prev_term


def test_handlers_restored_after_clean_exit():
    from fitsnap_tpu.utils.graceful import GracefulStop

    prev_int = signal.getsignal(signal.SIGINT)
    with GracefulStop(screen=lambda *_: None):
        assert signal.getsignal(signal.SIGINT) != prev_int
    assert signal.getsignal(signal.SIGINT) is prev_int
