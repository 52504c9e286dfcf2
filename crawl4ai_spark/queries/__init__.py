"""Named query surface (SURVEY.md §2 + training-data pipeline ops).

Import side effect: submodules register their queries in the shared
registry. ``queries()`` / ``oracle_sql()`` are the driver contract.
"""

from .registry import oracle_sql, queries, query  # noqa: F401
from . import crawlops  # noqa: F401,E402
from . import dataops  # noqa: F401,E402
from . import chunkops  # noqa: F401,E402
from . import spansops  # noqa: F401,E402
from . import streamops  # noqa: F401,E402
from . import mediaops  # noqa: F401,E402
from . import pipelineops  # noqa: F401,E402
from . import graphops  # noqa: F401,E402
from . import schedops  # noqa: F401,E402
from . import sketchops  # noqa: F401,E402
from . import indexops  # noqa: F401,E402
from . import feedops  # noqa: F401,E402
from . import focusedops  # noqa: F401,E402

from .crawlops import q_crawl_bfs_reachable  # noqa: F401,E402
