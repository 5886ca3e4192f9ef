from . import bits, boundaries, radix_sort, pallas_sort  # noqa: F401
