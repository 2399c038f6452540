"""Named-query registry.

Importing this package registers every query module. ``queries()`` /
``oracle_sql()`` in ``__spark_entry__.py`` read from here.
"""

from .registry import all_oracles, all_queries, get, query

# Import for registration side effects — each module registers its
# SURVEY.md §2 operator family.
#
# Import order IS registration order (ties within a priority). The
# driver's correctness harness checks a bounded prefix of the registry,
# so modules whose queries still need a hard oracle row this round come
# first (round 1 verified core → joins → window_stats → forecast → text;
# see CORRECTNESS_r01.json). COVERAGE.md documents the rotation.
from . import queries_extensions  # noqa: E402,F401
from . import queries_tpch  # noqa: E402,F401
from . import queries_similarity  # noqa: E402,F401
from . import queries_streaming  # noqa: E402,F401
from . import queries_multimodal  # noqa: E402,F401
from . import queries_quality  # noqa: E402,F401
from . import queries_mutation  # noqa: E402,F401
from . import queries_core  # noqa: E402,F401
from . import queries_joins  # noqa: E402,F401
from . import queries_window_stats  # noqa: E402,F401
from . import queries_forecast  # noqa: E402,F401
from . import queries_text  # noqa: E402,F401
from . import queries_sources  # noqa: E402,F401

__all__ = ["all_oracles", "all_queries", "get", "query"]
