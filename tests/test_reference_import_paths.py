"""Reference import-path parity: every user-facing module path the
reference exposes (including its own deprecation shims) must import
here and resolve its key names — the round-1 lesson
(``builders.infer_shape``) is that untested parity surface = latent
crashes.
"""

import importlib

import numpy as np
import pytest


CASES = [
    # (module path, names that must resolve)
    ("aesara_tpu.assert_op", ["Assert", "assert_op"]),
    ("aesara_tpu.graph.basic", ["Apply", "Variable", "Constant",
                                "graph_inputs", "io_toposort", "clone",
                                "equal_computations", "Atomic"]),
    ("aesara_tpu.graph.type", ["Type"]),
    ("aesara_tpu.graph.toolbox", ["Feature", "ReplaceValidate", "History"]),
    ("aesara_tpu.graph.opt", ["local_optimizer", "LocalOptimizer",
                              "GlobalOptimizer", "EquilibriumOptimizer",
                              "TopoOptimizer", "in2out"]),
    ("aesara_tpu.graph.opt_utils", ["rewrite_graph", "is_same_graph"]),
    ("aesara_tpu.graph.optdb", ["OptimizationDatabase", "OptimizationQuery",
                                "SequenceDB", "EquilibriumDB"]),
    ("aesara_tpu.graph.kanren", ["KanrenRelationSub"]),
    ("aesara_tpu.compile.compilelock", ["lock_ctx", "force_unlock"]),
    ("aesara_tpu.scalar.basic", ["ScalarOp", "ScalarType", "upcast",
                                 "constant"]),
    ("aesara_tpu.scalar.basic_scipy", ["erf", "gammaln"]),
    ("aesara_tpu.scalar.sharedvar", ["ScalarSharedVariable",
                                     "scalar_constructor"]),
    ("aesara_tpu.scan.opt", []),
    ("aesara_tpu.sparse.opt", []),
    ("aesara_tpu.sparse.utils", ["hash_from_sparse"]),
    ("aesara_tpu.sparse.sharedvar", ["SparseTensorSharedVariable",
                                     "sparse_constructor"]),
    ("aesara_tpu.tensor.basic_opt", []),
    ("aesara_tpu.tensor.math_opt", []),
    ("aesara_tpu.tensor.subtensor_opt", []),
    ("aesara_tpu.tensor.opt_uncanonicalize", []),
    ("aesara_tpu.tensor.inplace", ["neg_inplace", "add_inplace",
                                   "mul_inplace", "exp_inplace"]),
    ("aesara_tpu.tensor.utils", ["hash_from_ndarray", "shape_of_variables",
                                 "as_list"]),
    ("aesara_tpu.tensor.nnet.sigm", ["ultra_fast_sigmoid", "hard_sigmoid"]),
    ("aesara_tpu.tensor.nnet.opt", []),
    ("aesara_tpu.tensor.nnet.rewriting", []),
    ("aesara_tpu.tensor.nnet.corr", ["conv2d", "AbstractConv2d"]),
    ("aesara_tpu.tensor.nnet.corr3d", ["conv3d"]),
    ("aesara_tpu.tensor.random.type", ["RandomGeneratorType",
                                       "RandomStateType"]),
    ("aesara_tpu.tensor.random.opt", []),
    ("aesara_tpu.tensor.signal.conv", ["conv2d"]),
    ("aesara_tpu.tensor.signal.pool", []),
    ("aesara_tpu.misc.safe_asarray", ["_asarray"]),
    ("aesara_tpu.sandbox.fourier", ["rfft", "irfft"]),
    ("aesara_tpu.sandbox.solve", ["Solve", "solve"]),
    ("aesara_tpu.sandbox.minimal", ["Minimal", "minimal"]),
    ("aesara_tpu.sandbox.linalg", ["psd_solve_with_chol",
                                   "spectral_radius_bound"]),
    ("aesara_tpu.sandbox.linalg.ops", ["inv_as_solve", "local_det_chol"]),
    ("aesara_tpu.version", ["version", "short_version"]),
    ("aesara_tpu.configdefaults", ["config"]),
    ("aesara_tpu.configparser", ["AesaraConfigParser", "change_flags",
                                 "config"]),
    ("aesara_tpu.link.utils", ["map_storage", "streamline", "raise_with_op",
                               "fgraph_to_python"]),
    ("aesara_tpu.bin.aesara_cache", ["main"]),
    ("aesara_tpu.compile.function.types", ["Function", "orig_function"]),
]


@pytest.mark.parametrize("path,names", CASES, ids=[c[0] for c in CASES])
def test_reference_path_imports(path, names):
    mod = importlib.import_module(path)
    for n in names:
        assert getattr(mod, n, None) is not None, f"{path}.{n} missing"


def test_inplace_values_match_pure():
    """The *_inplace names must compute identical values to the pure ops
    (in-place-ness itself is the donation pass's job here)."""
    import aesara_tpu as atp
    import aesara_tpu.tensor as at
    from aesara_tpu.tensor.inplace import add_inplace, neg_inplace

    x = at.vector("x", dtype="float64")
    f = atp.function([x], [neg_inplace(x), add_inplace(x, x)], mode="PY")
    xv = np.arange(4.0, dtype="float32")
    a, b = f(xv)
    assert np.allclose(a, -xv) and np.allclose(b, 2 * xv)


def test_inplace_unknown_name_raises():
    import aesara_tpu.tensor.inplace as inp

    with pytest.raises(AttributeError):
        inp.definitely_not_an_op_inplace
    with pytest.raises(AttributeError):
        inp.not_an_inplace_name


def test_sparse_generic_shared():
    import scipy.sparse as sp

    import aesara_tpu as atp
    from aesara_tpu.sparse.sharedvar import SparseTensorSharedVariable

    s = atp.shared(sp.eye(3, format="csr") * 2.0, name="s")
    assert isinstance(s, SparseTensorSharedVariable)
    assert s.format == "csr"
    got = s.get_value()
    assert sp.issparse(got) and np.allclose(got.toarray(), 2 * np.eye(3))


def test_signal_conv2d_values():
    import scipy.signal as ss

    import aesara_tpu as atp
    import aesara_tpu.tensor as at
    from aesara_tpu.tensor.signal.conv import conv2d

    rng = np.random.default_rng(5)
    im = at.matrix("im", dtype="float64")
    flt = at.matrix("flt", dtype="float64")
    f = atp.function([im, flt], conv2d(im, flt), mode="PY")
    iv = rng.standard_normal((6, 7)).astype("float32")
    fv = rng.standard_normal((3, 3)).astype("float32")
    expect = ss.convolve2d(iv, fv, mode="valid")
    assert np.allclose(f(iv, fv), expect, rtol=1e-4, atol=1e-5)


def test_shape_of_variables_contract():
    import aesara_tpu.tensor as at
    from aesara_tpu.graph.fg import FunctionGraph
    from aesara_tpu.tensor.utils import shape_of_variables

    x = at.matrix("x", dtype="float64")
    y = at.tanh(at.dot(x, x.T))[1:]
    fg = FunctionGraph([x], [y], clone=False)
    res = shape_of_variables(fg, {x: (5, 4)})
    assert tuple(int(v) for v in res[y]) == (4, 5)
    assert tuple(int(v) for v in res[x]) == (5, 4)
    with pytest.raises(ValueError):
        x2 = at.matrix("x2", dtype="float64")
        fg2 = FunctionGraph([x2], [at.tanh(x2)])  # clone=True
        shape_of_variables(fg2, {x2: (2, 2)})


def test_minimal_op_runs():
    import aesara_tpu as atp
    import aesara_tpu.tensor as at
    from aesara_tpu.sandbox.minimal import minimal

    x = at.vector("x", dtype="float64")
    f = atp.function([x], minimal(x, x * 2), mode="PY")
    assert int(f(np.ones(3, dtype="float32"))) == 0


def test_safe_asarray_dtypes():
    from aesara_tpu.misc.safe_asarray import _asarray

    assert _asarray([1, 2], "float32").dtype == np.float32
    assert str(_asarray([1.5], "bfloat16").dtype) == "bfloat16"
