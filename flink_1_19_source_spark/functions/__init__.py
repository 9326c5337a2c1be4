from .exact import dsum, davg, dstddev_samp, dvar_samp  # noqa: F401
from . import compat  # noqa: F401
