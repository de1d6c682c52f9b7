"""Graph utils module (reference ``aesara/graph/utils.py``) — re-exports
the shared implementations living in ``aesara_tpu.utils`` plus the
reference's exception types."""

from aesara_tpu.utils import *  # noqa: F401,F403
from aesara_tpu.utils import Scratchpad, add_tag_trace  # noqa: F401


# the classes BELOW must be the very objects the rest of the package
# raises — re-defining them here would make except-clauses silently
# miss (review finding)
from aesara_tpu.utils import MethodNotDefined, TestValueError  # noqa: F401,F811
from aesara_tpu.graph.destroyhandler import InconsistencyError  # noqa: F401
from aesara_tpu.graph.fg import MissingInputError  # noqa: F401
