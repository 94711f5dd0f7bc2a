"""Executable entry: `python -m fitsnap_tpu input.in [options]`.

Mirrors the reference CLI (`fitsnap3/__main__.py:44`): scrape -> process ->
fit -> output.
"""

import sys


def main():
    from fitsnap_tpu.fitsnap import FitSnap
    from fitsnap_tpu.io.screen import screen

    fs = FitSnap(arglist=sys.argv[1:])
    fs.scrape_configs(delete_scraper=True)
    fs.process_configs(delete_data=False)
    fs.perform_fit()
    fs.write_output()
    for stage, dt in fs.timings.items():
        screen(f"{stage:>8}: {dt:8.3f} s")


if __name__ == "__main__":
    main()
