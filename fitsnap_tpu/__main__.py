"""Executable entry: `python -m fitsnap_tpu input.in [options]`.

Mirrors the reference CLI (`fitsnap3/__main__.py:44`): scrape -> process ->
fit -> output.
"""

import sys


def main():
    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.io.screen import screen

    from fitsnap_tpu.utils.graceful import GracefulStop

    fs = FitSnap(arglist=sys.argv[1:])
    # --jaxprof DIR: device-level tracing (the reference's profiling stops
    # at wall-clock stage timers, parallel_tools.py:290-306; here every
    # compute stage is an XLA program, so the profiler sees kernels/fusions)
    prof_dir = fs.config.args.jaxprof
    if prof_dir:
        import jax
        jax.profiler.start_trace(prof_dir)
    # SIGINT/SIGTERM stop the run at the next stage boundary (reference
    # GracefulKiller, parallel_tools.py:74-92); completed stages still
    # report their timings, and a finished fit is still written out.
    try:
        with GracefulStop(screen=screen) as stop:
            fs.scrape_configs(delete_scraper=True)
            if not stop:
                fs.process_configs(delete_data=False)
            skipped_fit = bool(stop)
            if not skipped_fit:
                # a signal arriving DURING the fit lets it finish, and a
                # finished fit is always written out
                fs.perform_fit()
                fs.write_output()
    finally:
        # flush the trace even when the run raises or a second signal
        # aborts it — failing runs are the ones worth profiling
        if prof_dir:
            import jax
            jax.profiler.stop_trace()
            screen(f"profiler trace written to {prof_dir}")
    if skipped_fit:
        screen("stopped on signal before fitting; no outputs were written")
    elif stop:
        screen("caught signal during fitting; the fit completed and "
               "outputs were written")
    for stage, dt in fs.timings.items():
        screen(f"{stage:>8}: {dt:8.3f} s")
    if stop:
        sys.exit(1)


if __name__ == "__main__":
    main()
