"""Importing this package registers every coverage query (SURVEY.md §2)."""

from . import relational  # noqa: F401
from . import aggregates  # noqa: F401
from . import joins  # noqa: F401
from . import over_windows  # noqa: F401
from . import sort_set  # noqa: F401
from . import scalar_funcs  # noqa: F401
from . import windows  # noqa: F401
from . import llm  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import sources  # noqa: F401
from . import cep  # noqa: F401
from . import relational2  # noqa: F401
from . import udtf_queries  # noqa: F401
from . import tpch  # noqa: F401
