from pynqs_tpu.models.base import Ansatz  # noqa: F401
from pynqs_tpu.models.rbm import RBM  # noqa: F401
from pynqs_tpu.models.rnn import RNNWavefunction  # noqa: F401
from pynqs_tpu.models.transformer import DecoderWavefunction  # noqa: F401
from pynqs_tpu.models.graph_mps_rnn import (  # noqa: F401
    GraphMPSRNN,
    chain_graph,
    grid_snake_graph,
    graph_from_edges,
)
from pynqs_tpu.models.ar_rbm import ARRBM  # noqa: F401
from pynqs_tpu.models.ar_rbm2 import ARRBM2  # noqa: F401
from pynqs_tpu.models.mps_transformer import MPSDecoder  # noqa: F401
