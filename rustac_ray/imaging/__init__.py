from . import codec, phash  # noqa: F401
