from . import distributed, exchange, mesh, sample_sort  # noqa: F401
from .distributed import build_distributed_sort, sort_distributed  # noqa: F401
from .mesh import key_mesh, host_chip_mesh  # noqa: F401
from .sample_sort import build_sample_sort, sort_distributed_sample  # noqa: F401
