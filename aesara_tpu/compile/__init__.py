from aesara_tpu.compile.function import Function, function, function_dump, orig_function, pfunc
from aesara_tpu.compile.io import In, Out, SymbolicInput, SymbolicOutput
from aesara_tpu.compile.mode import (
    FAST_COMPILE,
    FAST_RUN,
    JAX,
    PY,
    Mode,
    get_default_mode,
    get_mode,
    optdb,
    register_canonicalize,
    register_specialize,
    register_stabilize,
    register_uncanonicalize,
    register_useless,
)
from aesara_tpu.compile.ops import DeepCopyOp, FromFunctionOp, ViewOp, as_op, deep_copy_op, view_op
from aesara_tpu.compile.sharedvalue import SharedVariable, shared, shared_constructor
from aesara_tpu.compile.mode import (  # noqa: F401
    CVM,
    OPT_FAST_COMPILE,
    OPT_FAST_RUN,
    OPT_MERGE,
    OPT_NONE,
    OPT_O1,
    OPT_O2,
    OPT_O3,
    OPT_UNSAFE,
    predefined_linkers,
    predefined_modes,
    predefined_optimizers,
)
from aesara_tpu.graph.rewriting.db import RewriteDatabaseQuery as _RQ

OPT_STABILIZE = _RQ(include=["fast_run"], require=["stabilize"])
OPT_FAST_RUN_STABLE = OPT_FAST_RUN
from aesara_tpu.graph.destroyhandler import Supervisor  # noqa: F401
from aesara_tpu.compile.function import Function as FunctionMaker  # noqa: F401
from aesara_tpu.compile.profiling import ProfileStats  # noqa: F401
from aesara_tpu.compile.debugmode import DebugMode  # noqa: F401
from aesara_tpu.compile.nanguardmode import NanGuardMode  # noqa: F401
from aesara_tpu.compile.monitormode import MonitorMode  # noqa: F401

from aesara_tpu.compile.function import rebuild_collect_shared  # noqa: F401
from aesara_tpu.compile.mode import local_useless  # noqa: F401  (the 'useless' pass DB at position 0.6)
from aesara_tpu.compile.function import UnusedInputError  # noqa: F401  (the class orig_function actually raises)


#: internal-but-exported reference helpers, given real equivalents here

def fgraph_updated_vars(fgraph, expanded_inputs=None):
    """{update output -> updated input} mapping (reference
    ``function/types.py fgraph_updated_vars``): our Function stores the
    pairing on the fgraph at build time."""
    return dict(getattr(fgraph, "update_mapping_vars", {}))


def insert_deepcopy(fgraph, inputs=None, outputs=None):
    """Protect outputs that alias inputs/constants with DeepCopyOp
    (reference ``function/types.py:1172``) — our orig_function applies
    this automatically; exposed for parity with user pipelines."""
    from aesara_tpu.compile.ops import deep_copy_op
    from aesara_tpu.graph.ir import Constant

    for i, out in enumerate(list(fgraph.outputs)):
        if out in fgraph.inputs or isinstance(out, Constant):
            fgraph.outputs[i] = deep_copy_op(out)
    return fgraph


def std_fgraph(input_specs, output_specs, accept_inplace=False):
    """Build the standard rewrite-ready FunctionGraph from In/Out specs
    (reference ``function/types.py std_fgraph``)."""
    from aesara_tpu.graph.features import ReplaceValidate
    from aesara_tpu.graph.fg import FunctionGraph

    in_vars = [getattr(s, "variable", s) for s in input_specs]
    out_vars = [getattr(s, "variable", s) for s in output_specs]
    fg = FunctionGraph(in_vars, out_vars, clone=True)
    fg.attach_feature(ReplaceValidate())
    return fg, list(in_vars)


def register_linker(name, linker):
    """Add a user linker to the predefined registry (reference
    ``mode.py register_linker``)."""
    predefined_linkers[name] = linker


def register_mode(name, mode):
    predefined_modes[name] = mode


def register_optimizer(name, opt):
    predefined_optimizers[name] = opt


def register_deep_copy_op_c_code(typ, code, version=()):
    """No-op: c_code is replaced by XLA lowerings (register with
    ``@jax_funcify.register`` instead)."""


def register_view_op_c_code(typ, code, version=()):
    """No-op: see register_deep_copy_op_c_code."""


def view_tree_set(fgraph, v, treeset):
    """Transitive view closure of ``v`` (reference
    ``function/types.py view_tree_set``)."""
    treeset.add(v)
    for client, idx in fgraph.clients.get(v, []):
        if client == "output":
            continue
        vmap = getattr(client.op, "view_map", {}) or {}
        for out_idx, in_idxs in vmap.items():
            if idx in in_idxs:
                view_tree_set(fgraph, client.outputs[out_idx], treeset)
    return treeset


def infer_reuse_pattern(fgraph, outputs_to_disown):
    """Vars that may share memory with any of ``outputs_to_disown``
    (reference ``function/types.py infer_reuse_pattern``)."""
    rval = set()
    for o in outputs_to_disown:
        view_tree_set(fgraph, alias_root(fgraph, o), rval)
    return rval


def alias_root(fgraph, v):
    """Walk view chains back to the storage root (reference
    ``function/types.py alias_root``)."""
    if v.owner is None:
        return v
    vmap = getattr(v.owner.op, "view_map", {}) or {}
    for out_idx, in_idxs in vmap.items():
        if v.owner.outputs[out_idx] is v:
            return alias_root(fgraph, v.owner.inputs[in_idxs[0]])
    return v


def convert_function_input(input, *args, **kwargs):
    """Normalize a function input spec to In (reference
    ``function/types.py convert_function_input``)."""
    from aesara_tpu.compile.io import In
    from aesara_tpu.graph.ir import Variable

    if isinstance(input, In):
        return input
    if isinstance(input, Variable):
        return In(input)
    if isinstance(input, (tuple, list)) and len(input) == 2:
        return In(input[0], value=input[1])
    raise TypeError(f"cannot interpret {input} as a function input")


def get_info_on_inputs(named_inputs, n_unnamed_inputs):
    """Human-readable input summary for error messages (reference
    ``function/types.py`` tail)."""
    return (f"{n_unnamed_inputs} unnamed inputs; "
            f"named: {', '.join(named_inputs) if named_inputs else 'none'}")


#: the mode get_default_mode() caches (reference mode.py module state)
instantiated_default_mode = None


class AliasedMemoryError(Exception):
    """Output storage unexpectedly aliases another buffer (reference
    ``function/types.py AliasedMemoryError``)."""


class AddDestroyHandler:
    """GraphRewriter attaching a DestroyHandler + Supervisor (reference
    ``mode.py AddDestroyHandler``)."""

    def rewrite(self, fgraph):
        from aesara_tpu.graph.destroyhandler import DestroyHandler

        if not hasattr(fgraph, "destroyers"):
            fgraph.attach_feature(DestroyHandler())
        return fgraph

    __call__ = rewrite


class AddFeatureOptimizer:
    """GraphRewriter attaching an arbitrary Feature (reference
    ``mode.py AddFeatureOptimizer``)."""

    def __init__(self, feature):
        self.feature = feature

    def rewrite(self, fgraph):
        fgraph.attach_feature(self.feature)
        return fgraph

    __call__ = rewrite


class PrintCurrentFunctionGraph:
    """Debug pass that debugprints the fgraph when it runs (reference
    ``mode.py PrintCurrentFunctionGraph``)."""

    def __init__(self, header=""):
        self.header = header

    def rewrite(self, fgraph):
        from aesara_tpu.printing import debugprint

        if self.header:
            print(self.header)
        debugprint(fgraph.outputs)
        return fgraph

    __call__ = rewrite


#: the reference's NUMBA mode name exists for API parity; on TPU it
#: resolves to the XLA mode (Numba has no TPU backend)
NUMBA = JAX
