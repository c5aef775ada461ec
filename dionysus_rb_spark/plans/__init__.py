"""Query catalog backing __spark_entry__.py.

Importing this package registers every query module's entries into the
catalog; ``all_queries()`` is the single source of truth consumed by the
driver contract, the pytest oracle-parity suite, and bench.py.
"""

from .catalog import QueryDef, all_queries, query  # noqa: F401

# Register query modules (import side effect fills the catalog).
from . import queries_core  # noqa: E402,F401
from . import queries_coverage  # noqa: E402,F401
from . import queries_pipeline  # noqa: E402,F401
from . import queries_text  # noqa: E402,F401
from . import queries_similarity  # noqa: E402,F401
from . import queries_mm  # noqa: E402,F401
