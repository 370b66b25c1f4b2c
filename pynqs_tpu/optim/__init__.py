from pynqs_tpu.optim.vmc import VMC, VMCConfig  # noqa: F401
