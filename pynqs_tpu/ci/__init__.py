from pynqs_tpu.ci.wavefunction import CIWavefunction  # noqa: F401
from pynqs_tpu.ci.train import CITrain, CITrainConfig  # noqa: F401
