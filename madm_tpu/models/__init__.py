from . import sd  # noqa: F401
