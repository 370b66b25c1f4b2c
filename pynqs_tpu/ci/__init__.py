from pynqs_tpu.ci.wavefunction import CIWavefunction  # noqa: F401
from pynqs_tpu.ci.train import CITrain, CITrainConfig  # noqa: F401
from pynqs_tpu.ci.selected import en_pt2, selected_ci  # noqa: F401
from pynqs_tpu.ci.solve import (  # noqa: F401
    cisd_space,
    davidson,
    load_ci,
    save_ci,
    solve_ci,
)
