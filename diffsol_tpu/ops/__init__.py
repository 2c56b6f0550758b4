from . import controller, linsol, newton, rootfind  # noqa: F401
