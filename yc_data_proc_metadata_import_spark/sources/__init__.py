from . import io, sinks  # noqa: F401
