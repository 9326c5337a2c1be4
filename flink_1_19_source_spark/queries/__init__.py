"""Importing this package registers every coverage query (SURVEY.md §2).

IMPORT ORDER IS LOAD-BEARING: the driver certifies only the FIRST 50
registry entries (insertion order = import order here, then definition
order within each module).  Round 1-2 certified the relational/agg/join/
over/set/scalar block; round 3 rotates the window so the never-certified
set comes first: all W* (windows), all N* (llm + n4_tfidf), the s_*
streaming set, all src_*/sql_* (sources), and X5 (cep) — exactly 50.
See STATUS.md "driver certification window" for the per-round ledger.
"""

from . import windows  # noqa: F401  (w1..w6: 6 queries)
from . import llm  # noqa: F401  (n1..n5: 17 queries)
from . import streaming_queries  # noqa: F401  (s_*: 13 queries)
from . import sources  # noqa: F401  (src_* + sql_*: 11 queries)
from . import cep  # noqa: F401  (x5_*: 2 queries)
from . import relational2  # noqa: F401  (n4_tfidf first → window slot 50)
from . import tpch  # noqa: F401
from . import relational  # noqa: F401
from . import aggregates  # noqa: F401
from . import joins  # noqa: F401
from . import over_windows  # noqa: F401
from . import sort_set  # noqa: F401
from . import scalar_funcs  # noqa: F401
from . import udtf_queries  # noqa: F401
from . import pipeline  # noqa: F401  (N6 + end-to-end N2/N4 pipelines)
from . import feedback  # noqa: F401  (X8 iterate, W7 count windows)
from . import windows2  # noqa: F401  (window top-n/dedup, cascading agg)
from . import sources2  # noqa: F401  (S11 session-catalog surface)
from . import streaming2  # noqa: F401  (retract-stream chained aggregation)
