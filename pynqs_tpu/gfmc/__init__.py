from pynqs_tpu.gfmc.walker import GFMC, GFMCConfig  # noqa: F401
