"""Extension catalog aggregator: dedup, similarity search, text
analysis, multimodal plumbing, streaming-semantics windows, joins,
aggregates, scalars, analytics, and pipeline composites (north-star
operators from BASELINE.json — see the operator modules for scale
design notes).

Formerly one 4,700-line file; split in round 5 into domain modules
(``registry_dedup`` … ``registry_pipeline``) that each register their
entries into ``registry.CATALOG`` on import. This module imports them
in the historical definition order (so catalog iteration order is
stable) and re-exports the shared helpers that external code
(bench.py, tests, tools) imports from here.

Entries with an ``oracle`` are hash-checked against DuckDB; entries
without one are genuinely non-SQL-expressible (LSH internals,
mapInPandas stubs) and get the driver's rows-only check, with pytest
covering semantics.
"""

from __future__ import annotations

from .registry_common import (  # noqa: F401  (re-export for compat)
    _QUERY_VEC,
    _QUERY_VEC_SQL,
    _docs,
    _emb,
    _events,
    _reg,
    _reg_sql,
)

# Import order = catalog registration order for the 51+ tier (the
# scored window is fixed by registry.PRIORITY regardless).
from . import registry_dedup  # noqa: E402,F401
from . import registry_sim  # noqa: E402,F401
from . import registry_text  # noqa: E402,F401
from . import registry_stream  # noqa: E402,F401
from . import registry_joins  # noqa: E402,F401
from . import registry_agg  # noqa: E402,F401
from . import registry_scalars  # noqa: E402,F401
from . import registry_analytics  # noqa: E402,F401
from . import registry_pipeline  # noqa: E402,F401

from .registry_analytics import _pivot_dynamic  # noqa: E402,F401  (test compat)
from .registry_stream import _ewma_sql  # noqa: E402,F401  (tools compat)
