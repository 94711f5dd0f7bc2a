"""Post-processing tools (reference `fitsnap3lib/tools/`)."""
