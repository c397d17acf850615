from .mesh import make_mesh, run_lucy_iteration_sharded  # noqa: F401
