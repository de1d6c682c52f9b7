"""misc: pkl_utils dump/load, may_share_memory, ordered_set, MRG shim,
check_blas harness."""

import io
import numpy as np

import aesara_tpu as atp


def test_pkl_dump_load_roundtrip(tmp_path):
    from aesara_tpu.misc.pkl_utils import dump, load

    obj = {"w": np.arange(6.0).reshape(2, 3), "name": "model"}
    p = tmp_path / "state.zip"
    with open(p, "wb") as f:
        dump(obj, f)
    with open(p, "rb") as f:
        back = load(f)
    np.testing.assert_allclose(back["w"], obj["w"])
    assert back["name"] == "model"


def test_may_share_memory():
    from aesara_tpu.misc.may_share_memory import may_share_memory

    a = np.arange(10.0)
    assert may_share_memory(a, a[2:5])
    assert not may_share_memory(a, a.copy())


def test_ordered_set():
    from aesara_tpu.misc.ordered_set import OrderedSet

    s = OrderedSet([3, 1, 2, 1])
    assert list(s) == [3, 1, 2]
    s.add(5)
    s.discard(1)
    assert list(s) == [3, 2, 5]
    assert list(s.union([7])) == [3, 2, 5, 7]


def test_mrg_shim():
    from aesara_tpu.sandbox.rng_mrg import MRG_RandomStream
    from aesara_tpu.compile.function import function

    srng = MRG_RandomStream(seed=99)
    u = srng.uniform(size=(4,))
    f = function([], u)
    a, b = f(), f()
    assert not np.allclose(a, b)
    subs = srng.get_substream_rngs(3)
    assert len(subs) == 3 and not np.array_equal(subs[0], subs[1])


def test_check_blas_small():
    from aesara_tpu.misc.check_blas import execute

    _, elapsed = execute(verbose=False, M=64, N=64, K=64, iters=2)
    assert elapsed > 0


def test_reference_namespace_parity():
    """Every public name of the reference's root and tensor namespaces
    resolves here (stdlib/typing/logging internals excluded)."""
    import ast

    def exported_names(path):
        tree = ast.parse(open(path).read())
        names = set()
        for node in tree.body:
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        if t.id == "__all__" and isinstance(
                            node.value, (ast.List, ast.Tuple)
                        ):
                            for e in node.value.elts:
                                if isinstance(e, ast.Constant):
                                    names.add(e.value)
                        elif not t.id.startswith("_"):
                            names.add(t.id)
            elif isinstance(node, (ast.FunctionDef, ast.ClassDef)):
                if not node.name.startswith("_"):
                    names.add(node.name)
            elif isinstance(node, ast.ImportFrom):
                for a in node.names:
                    nm = a.asname or a.name
                    if nm != "*" and not nm.startswith("_"):
                        names.add(nm)
        return names

    import os

    if not os.path.exists("/root/reference/aesara/__init__.py"):
        import pytest

        pytest.skip("reference tree not mounted")

    STDLIB = {
        "Any", "Optional", "List", "Tuple", "NoReturn", "TYPE_CHECKING",
        "singledispatch", "DEPRECATED_NAMES", "MATH_DEPRECATED_NAMES",
        "aesara_logger", "disable_log_handler", "logging_default_formatter",
        "logging_default_handler", "rpath",
    }
    import aesara_tpu
    import aesara_tpu.tensor as at_mod

    def have(mod, n):
        try:
            return hasattr(mod, n)
        except Exception:
            return False

    miss_root = [
        n for n in exported_names("/root/reference/aesara/__init__.py")
        if n not in STDLIB and not have(aesara_tpu, n)
    ]
    miss_tensor = [
        n for n in exported_names("/root/reference/aesara/tensor/__init__.py")
        if n not in STDLIB and not have(at_mod, n)
    ]
    assert not miss_root, miss_root
    assert not miss_tensor, miss_tensor

    import importlib

    STDLIB2 = STDLIB | {
        "Literal", "Union", "Sequence", "Callable", "Iterable", "Dict",
        "warnings", "np", "numpy", "config", "partial", "dataclass", "Enum",
        "itertools", "sys", "os", "typing", "collections", "logging",
        "Mapping", "MutableSequence", "TypeVar", "V", "utils",
        "configdefaults", "mode_not_slow", "get_test_values",
        "NominalVariable", "ViewOp", "reduce",
    }
    for ref_path, modname in [
        ("/root/reference/aesara/scan/__init__.py", "aesara_tpu.scan"),
        ("/root/reference/aesara/sparse/__init__.py", "aesara_tpu.sparse"),
        ("/root/reference/aesara/compile/__init__.py", "aesara_tpu.compile"),
        ("/root/reference/aesara/graph/__init__.py", "aesara_tpu.graph"),
        ("/root/reference/aesara/gradient.py", "aesara_tpu.gradient"),
        ("/root/reference/aesara/typed_list/__init__.py", "aesara_tpu.typed_list"),
        ("/root/reference/aesara/tensor/random/__init__.py",
         "aesara_tpu.tensor.random"),
    ]:
        mod = importlib.import_module(modname)
        miss = sorted(
            n for n in exported_names(ref_path)
            if n not in STDLIB2 and not have(mod, n)
        )
        assert not miss, (modname, miss)

    # per-module __all__ parity for the big tensor submodules
    def all_names(path):
        tree = ast.parse(open(path).read())
        for node in tree.body:
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if (isinstance(t, ast.Name) and t.id == "__all__"
                            and isinstance(node.value, (ast.List, ast.Tuple))):
                        return {e.value for e in node.value.elts
                                if isinstance(e, ast.Constant)}
        return set()

    SKIP_MOD = {
        "COp", "DenseTensorType", "Dict", "DisconnectedType", "HasShape",
        "List", "NoneConst", "NotScalarConstantError", "Number", "ParamsType",
        "ShapeValueType", "TensorConstant", "TensorVariable", "Tuple",
        "as_tensor_variable", "at", "dedent", "int32", "int_dtypes",
        "register_shape_c_code", "register_shape_i_c_code",
        "get_vector_length", "tensor",
    }
    for ref_path, modname in [
        ("/root/reference/aesara/tensor/math.py", "aesara_tpu.tensor.math"),
        ("/root/reference/aesara/tensor/basic.py", "aesara_tpu.tensor.basic"),
        ("/root/reference/aesara/tensor/extra_ops.py",
         "aesara_tpu.tensor.extra_ops"),
        ("/root/reference/aesara/tensor/nlinalg.py",
         "aesara_tpu.tensor.nlinalg"),
        ("/root/reference/aesara/tensor/slinalg.py",
         "aesara_tpu.tensor.slinalg"),
        ("/root/reference/aesara/tensor/nnet/__init__.py",
         "aesara_tpu.tensor.nnet"),
        ("/root/reference/aesara/tensor/special.py",
         "aesara_tpu.tensor.special"),
    ]:
        names = all_names(ref_path) or exported_names(ref_path)
        mod = importlib.import_module(modname)
        miss = sorted(n for n in names
                      if n not in SKIP_MOD and not have(mod, n))
        assert not miss, (modname, miss)


def test_config_flag_parity():
    """Every flag name the reference's configdefaults registers is
    accepted here (AESARA_FLAGS strings port unchanged)."""
    import os
    import re

    if not os.path.exists("/root/reference/aesara/configdefaults.py"):
        import pytest

        pytest.skip("reference not mounted")
    from aesara_tpu.config import config

    ref = open("/root/reference/aesara/configdefaults.py").read()
    names = sorted(set(re.findall(r'config\.add\(\s*[\'"]([^\'"]+)[\'"]', ref)))
    miss = [n for n in names if not hasattr(config, n)]
    assert not miss, miss


def test_optimizer_excluding_flag():
    import numpy as np

    import aesara_tpu as atp
    import aesara_tpu.tensor as at_mod
    from aesara_tpu.config import config

    x = at_mod.vector("x")
    expr = at_mod.math.exp(x) * at_mod.math.sigmoid(x) + 1.0
    with config.change_flags(optimizer_excluding="fusion"):
        f = atp.function([x], expr)
        scalar_ops = [getattr(n.op, "scalar_op", None).__class__.__name__
                      for n in f.maker.fgraph.toposort()]
        assert "Composite" not in scalar_ops
    f2 = atp.function([x], expr)
    assert any(
        getattr(n.op, "scalar_op", None).__class__.__name__ == "Composite"
        for n in f2.maker.fgraph.toposort()
    )
    xv = np.arange(3.0, dtype="float32")
    assert np.allclose(f(xv), f2(xv), rtol=1e-6)


def test_profiling_stack():
    """ProfileMode per-op table, function(profile=True), xla_cost_analysis
    (reference ProfileStats/ProfileMode surface)."""
    import io

    import numpy as np

    import aesara_tpu as atp
    import aesara_tpu.tensor as at_mod
    from aesara_tpu.compile.profiling import (ProfileMode, ProfileStats,
                                              xla_cost_analysis)

    x = at_mod.matrix("x")
    y = at_mod.matrix("y")
    expr = at_mod.math.dot(at_mod.math.tanh(x), y)
    stats = ProfileStats(name="t", atexit_print=False)
    f = atp.function([x, y], expr, mode=ProfileMode(stats=stats))
    xv = np.random.default_rng(0).normal(size=(16, 16)).astype("float32")
    for _ in range(3):
        f(xv, xv)
    buf = io.StringIO()
    stats.summary(file=buf)
    out = buf.getvalue()
    assert "function calls : 3" in out and "tanh" in out

    f2 = atp.function([x, y], expr, profile=True)
    f2(xv, xv)
    assert f2.profile is not None and f2.profile.fct_callcount == 1

    f3 = atp.function([x, y], expr)
    f3(xv, xv)
    cost = xla_cost_analysis(f3)
    assert cost.get("flops", 0) > 0


def test_rng_shared_constructors():
    import numpy as np

    import aesara_tpu as atp
    from aesara_tpu.tensor.random import (
        RandomGeneratorSharedVariable,
        RandomStateSharedVariable,
    )
    from aesara_tpu.tensor.random.basic import normal

    sv = atp.shared(np.random.default_rng(3), name="rng")
    assert isinstance(sv, RandomGeneratorSharedVariable)
    sv2 = atp.shared(np.random.RandomState(7))
    assert isinstance(sv2, RandomStateSharedVariable)
    # usable as the rng= input of a RandomVariable
    d = normal(0.0, 1.0, rng=sv)
    f = atp.function([], d, mode="PY")
    assert isinstance(float(f()), float)
