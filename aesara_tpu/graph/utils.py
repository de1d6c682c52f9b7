"""Graph utils module (reference ``aesara/graph/utils.py``) — re-exports
the shared implementations living in ``aesara_tpu.utils`` plus the
reference's exception types."""

from aesara_tpu.utils import *  # noqa: F401,F403
from aesara_tpu.utils import Scratchpad, add_tag_trace  # noqa: F401


class MethodNotDefined(Exception):
    """An optional Op method isn't implemented (reference name — used by
    the C machinery; kept for except-clauses in ported code)."""


class TestValueError(Exception):
    """A test value is missing or inconsistent (reference name)."""


class InconsistencyError(Exception):
    """FunctionGraph state violated an invariant (reference name)."""


class MissingInputError(Exception):
    """(re-export point; the live class is graph.fg.MissingInputError)"""


from aesara_tpu.graph.fg import MissingInputError  # noqa: E402,F401,F811
