from .compcache import enable_compilation_cache  # noqa: F401
from .config import Config  # noqa: F401
from .logging import ScalarWriter, StepTimer, create_logger  # noqa: F401
from .prng import set_seed  # noqa: F401
