"""Sources & sinks: the reference's output manager re-expressed as
DataFrame writers (internal/output/manager.go:50-79 dispatch)."""

from .sinks import write_output  # noqa: F401
from .dbsinks import write_sqlite, write_jdbc  # noqa: F401
from .xmlsink import write_xml  # noqa: F401
from .excelsink import write_excel  # noqa: F401
