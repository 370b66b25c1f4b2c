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
    host per (sorb, noa, nob); sampling uses fixed-capacity buffers;
    dynamic dedup becomes sort + segment-sum at fixed capacity.
  * Autoregressive sampling is a fixed-capacity tree expansion with
    exact multinomial branch partitioning and top-k compaction; the
    same driver serves RNN / Transformer / MPS-RNN / Graph-MPS-RNN /
    AR-RBM models.
  * Data parallelism is SPMD: one jitted step over a
    `jax.sharding.Mesh`, batch axes sharded, parameters replicated —
    no hand-written collectives.
"""

__version__ = "0.2.0"

from pynqs_tpu import ops  # noqa: F401
from pynqs_tpu import models  # noqa: F401
from pynqs_tpu import sampler  # noqa: F401
from pynqs_tpu import energy  # noqa: F401
from pynqs_tpu import grad  # noqa: F401
from pynqs_tpu import optim  # noqa: F401
from pynqs_tpu import parallel  # noqa: F401
from pynqs_tpu import utils  # noqa: F401
from pynqs_tpu.utils.system import System  # noqa: F401
