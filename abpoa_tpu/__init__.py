"""abpoa_tpu — TPU-native partial-order alignment (POA) consensus framework.

A from-scratch re-design of abPOA (Xinglab/abPOA v1.4.1) for TPU:
  * host layer: graph store, consensus, MSA/GFA emission, seeding — exact
    behavioral parity with the reference (byte-identical outputs),
  * compute layer: the adaptive-banded seq-to-DAG DP as JAX/Pallas kernels,
    batched over many POA instances per chip, sharded over device meshes.
"""
from .params import Params
from .api import ABPOA

__version__ = "0.1.0"
