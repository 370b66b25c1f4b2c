from pynqs_tpu.grad.energy_grad import energy_and_grad  # noqa: F401
