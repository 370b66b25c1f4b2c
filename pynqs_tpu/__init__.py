"""pynqs_tpu — a TPU-native neural-network-quantum-states (NQS) framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of PyNQS
(Quantum-Chemistry-Group-BNU/PyNQS): variational Monte Carlo over
second-quantized molecular Hamiltonians with neural wavefunctions,
autoregressive / Metropolis sampling, Slater–Condon local energies,
SPMD data parallelism over TPU meshes, GFMC refinement and hybrid
CI-NQS wavefunctions.

Design notes (vs. the CUDA/C++ reference):
  * Occupation-number vectors (ONVs) live on device as unpacked 0/1
    int8 vectors [batch, sorb]; packed uint32 words are used only as
    compact keys for sorting / LUT lookup.  All bit kernels become
    vector ops (cumsum prefix parity, one-hot flips) instead of
    scalar popcount loops.
  * Slater–Condon singles are evaluated with one MXU matmul
    (occupancy @ J[k,(p,q)]) instead of per-sample gather loops; the
    diagonal is a quadratic form; doubles are a single flat gather
    from the compressed <pq||rs> triangle.
  * Everything is static-shape: excitation tables are precomputed on
    host per (sorb, noa, nob); sampling uses fixed-capacity buffers.
"""

__version__ = "0.1.0"

from pynqs_tpu import ops  # noqa: F401
