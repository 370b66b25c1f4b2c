from pynqs_tpu.utils.system import System  # noqa: F401
from pynqs_tpu.utils import fci  # noqa: F401
