from . import affine, cells, pip, tiles, wkb  # noqa: F401
