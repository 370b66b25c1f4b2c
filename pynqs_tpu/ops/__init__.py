"""Core ONV / Slater–Condon / excitation operator library."""

from pynqs_tpu.ops import onv  # noqa: F401
from pynqs_tpu.ops import integrals  # noqa: F401
from pynqs_tpu.ops import excitation  # noqa: F401
from pynqs_tpu.ops import hamiltonian  # noqa: F401
