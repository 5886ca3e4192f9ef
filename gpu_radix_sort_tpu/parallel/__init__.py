from . import distributed, exchange, mesh  # noqa: F401
from .distributed import build_distributed_sort, sort_distributed  # noqa: F401
from .mesh import key_mesh, host_chip_mesh  # noqa: F401
