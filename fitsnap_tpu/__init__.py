"""fitsnap_tpu: TPU-native framework for fitting machine-learned
interatomic potentials (SNAP / ACE / neural network forms).

A ground-up JAX/XLA re-design with the capabilities of FitSNAP
(https://github.com/FitSNAP/FitSNAP): descriptors are batched, jittable
array math instead of per-config embedded-LAMMPS calls; fits run on device;
multi-chip scaling uses `jax.sharding` meshes instead of MPI.
"""

__version__ = "0.1.0"
__all__ = ["FitSnap"]


def __getattr__(name):
    # lazy import so `fitsnap_tpu.ops.*` can be used without pulling pandas
    if name == "FitSnap":
        from fitsnap_tpu.fitsnap import FitSnap
        return FitSnap
    raise AttributeError(name)
