from . import checks, keygen, native, timers  # noqa: F401
