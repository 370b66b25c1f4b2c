from pynqs_tpu.energy.eloc import local_energy_simple, make_local_energy  # noqa: F401
