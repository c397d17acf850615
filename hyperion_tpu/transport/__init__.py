from .dtable import DustTables, build_dust_tables  # noqa: F401
from .gtable import CartesianGeometry, build_cartesian_geometry, ESCAPED  # noqa: F401
from .stable import SourceTables, build_source_tables  # noqa: F401
from .lucy import run_lucy, LucyResult  # noqa: F401
