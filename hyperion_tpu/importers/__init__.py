from .sph import construct_octree  # noqa: F401
