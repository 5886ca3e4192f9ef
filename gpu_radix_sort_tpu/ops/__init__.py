from . import bits, boundaries, radix_sort, pallas_sort, pallas_radix  # noqa: F401
