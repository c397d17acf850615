"""hyperion_tpu — a TPU-native 3-D Monte-Carlo dust radiative transfer framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of Hyperion
(hyperion-rt/hyperion): Python model assembly + HDF5 model files feeding a
vectorized photon-packet transport engine that runs Lucy temperature
iterations, peeloff/binned imaging, raytracing and monochromatic modes on TPU
device meshes.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports keep `import hyperion_tpu` light; the model layer pulls in
    # h5py/jax only when used.
    if name in ("Model", "ModelOutput"):
        from . import model
        return getattr(model, name)
    raise AttributeError(name)
