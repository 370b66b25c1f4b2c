from pynqs_tpu.sampler.exact import ExactSampler  # noqa: F401
from pynqs_tpu.sampler.mcmc import MCMCSampler  # noqa: F401
from pynqs_tpu.sampler.ar_sampler import ARSampler  # noqa: F401
from pynqs_tpu.sampler.ar import ar_sampling  # noqa: F401
from pynqs_tpu.sampler.restricted import RestrictedSampler  # noqa: F401
