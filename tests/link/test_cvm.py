"""C++ VM tests (reference tests/link/c strategy: build, run, compare)."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import Mode, OPT_FAST_RUN

rng = np.random.default_rng(13)


def cvm_mode():
    from aesara_tpu.link.c.vm_linker import CVMLinker

    return Mode(CVMLinker(), OPT_FAST_RUN)


def test_cvm_builds_and_matches_py():
    from aesara_tpu.link.c.build import get_cvm_module

    mod = get_cvm_module()
    assert mod is not None, "C++ toolchain available in this image"
    x = at.matrix("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    out = at.tanh(at.dot(x, y)) + at.exp(y).sum()
    f_c = function([x, y], out, mode=cvm_mode())
    f_py = function([x, y], out, mode="PY")
    xv, yv = rng.normal(size=(4, 3)), rng.normal(size=3)
    np.testing.assert_allclose(f_c(xv, yv), f_py(xv, yv), rtol=1e-12)


def test_cvm_updates_and_state():
    w = atp.shared(np.zeros(3), name="w")
    x = at.vector("x", dtype="float64")
    f = function([x], (w * x).sum(), updates={w: w + x}, mode=cvm_mode())
    f(np.ones(3))
    f(np.ones(3))
    np.testing.assert_allclose(w.get_value(), 2.0)


def test_cvm_error_annotation():
    x = at.vector("x", dtype="float64")
    out = at.log(x)[0:1]
    f = function([x], at.math.sum(out), mode=cvm_mode())
    f(np.ones(3))  # fine

    # force an error inside a thunk: wrong runtime shape for SpecifyShape
    from aesara_tpu.tensor.shape import specify_shape

    g = function([x], specify_shape(x, (5,)).sum(), mode=cvm_mode())
    with pytest.raises(Exception) as exc_info:
        g(np.ones(3))
    assert "SpecifyShape" in str(exc_info.value) or "Apply node" in str(
        exc_info.value
    )


def test_cvm_lazy_subset():
    from aesara_tpu.link.c.build import get_cvm_module

    mod = get_cvm_module()
    calls = []

    def make_thunk(i):
        def t():
            calls.append(i)

        return t

    # chain 0 -> 1 -> 2, plus independent 3
    vm = mod.CVM(
        tuple(make_thunk(i) for i in range(4)),
        ((), (), (), ()),
        ((), (0,), (1,), ()),
        0, 1,
    )
    vm.run_subset([2])
    assert calls == [0, 1, 2]  # thunk 3 never ran
    assert vm.get_counts() == [1, 1, 1, 0]
    assert len(vm.get_times()) == 4


def test_module_cache_reuse(tmp_path):
    from aesara_tpu.link.c.build import module_hash

    h1 = module_hash("int main(){}")
    h2 = module_hash("int main(){}")
    h3 = module_hash("int main(){return 1;}")
    assert h1 == h2 != h3


def test_output_subset_lazy_on_cvm():
    """output_subset runs ONLY the requested outputs' ancestor thunks on
    the CVM (reference Stack VM partial eval, link/vm.py:423); updates
    always run."""
    import numpy as np

    import aesara_tpu as atp
    import aesara_tpu.tensor as at
    from aesara_tpu.graph.ir import Apply
    from aesara_tpu.graph.op import Op

    calls = {"a": 0, "b": 0}

    class Tick(Op):
        __props__ = ("key",)

        def __init__(self, key):
            self.key = key

        def make_node(self, x):
            x = at.as_tensor_variable(x)
            return Apply(self, [x], [x.type()])

        def perform(self, node, inputs, out):
            calls[self.key] += 1
            out[0][0] = np.asarray(inputs[0])

    x = at.vector("x", dtype="float64")
    a = Tick("a")(at.math.exp(x))
    b = Tick("b")(at.math.log(at.math.abs(x) + 1))
    f = atp.function([x], [a, b], mode="CVM")
    xv = np.arange(1.0, 4.0, dtype="float32")

    f(xv)
    assert calls == {"a": 1, "b": 1}
    r = f(xv, output_subset=[0])
    assert calls == {"a": 2, "b": 1}
    assert np.allclose(r[0], np.exp(xv))
    f(xv, output_subset=[1])
    assert calls == {"a": 2, "b": 2}

    s = atp.shared(np.float32(0.0), name="s")
    g = atp.function([x], [Tick("a")(at.math.exp(x))],
                     updates=[(s, s + 1)], mode="CVM")
    g(xv, output_subset=[0])
    assert float(s.get_value()) == 1.0


def test_output_subset_full_run_fallback_jax():
    import numpy as np

    import aesara_tpu as atp
    import aesara_tpu.tensor as at

    x = at.vector("x", dtype="float64")
    f = atp.function([x], [at.math.exp(x), at.math.log(at.math.abs(x) + 1)])
    xv = np.arange(1.0, 4.0, dtype="float32")
    r = f(xv, output_subset=[1])
    assert len(r) == 1 and np.allclose(r[0], np.log(np.abs(xv) + 1))


class _CountingExp:
    """Op wrapper that counts perform() executions."""

    def __new__(cls):
        from aesara_tpu.graph.ir import Apply
        from aesara_tpu.graph.op import Op
        from aesara_tpu.tensor.basic import as_tensor_variable

        class CountingExp(Op):
            calls = [0]

            def make_node(self, x):
                x = as_tensor_variable(x)
                return Apply(self, [x], [x.type()])

            def perform(self, node, inputs, output_storage):
                type(self).calls[0] += 1
                output_storage[0][0] = np.exp(inputs[0])

        return CountingExp()


def test_cvm_lazy_ifelse_runs_only_taken_branch():
    """The C++ VM's lazy-thunk protocol: the untaken IfElse branch never
    executes (reference lazylinker Stack semantics)."""
    import aesara_tpu.tensor as at
    from aesara_tpu.compile.function import function
    from aesara_tpu.compile.mode import Mode, OPT_NONE
    from aesara_tpu.ifelse import ifelse
    from aesara_tpu.link.c.vm_linker import CVMLinker

    t_op = _CountingExp()
    f_op = _CountingExp()
    c = at.scalar("c", dtype="float64")
    x = at.vector("x", dtype="float64")
    out = ifelse(c > 0, t_op(x), f_op(x * 2.0))
    fn = function([c, x], out, mode=Mode(CVMLinker(), OPT_NONE))

    v = np.array([0.5, 1.0])
    res = fn(1.0, v)
    np.testing.assert_allclose(np.asarray(res), np.exp(v))
    assert type(t_op).calls[0] == 1
    assert type(f_op).calls[0] == 0  # untaken branch never ran

    res = fn(-1.0, v)
    np.testing.assert_allclose(np.asarray(res), np.exp(v * 2.0))
    assert type(t_op).calls[0] == 1
    assert type(f_op).calls[0] == 1


def test_cvm_lazy_ifelse_nested_condition_chain():
    import aesara_tpu.tensor as at
    from aesara_tpu.compile.function import function
    from aesara_tpu.compile.mode import Mode, OPT_NONE
    from aesara_tpu.ifelse import ifelse
    from aesara_tpu.link.c.vm_linker import CVMLinker

    c = at.scalar("c", dtype="float64")
    x = at.vector("x", dtype="float64")
    inner = ifelse(c > 1, at.exp(x), x + 100.0)
    out = ifelse(c > 0, inner * 2.0, x - 100.0)
    fn = function([c, x], out, mode=Mode(CVMLinker(), OPT_NONE))
    v = np.ones(3)
    np.testing.assert_allclose(np.asarray(fn(2.0, v)), 2 * np.exp(v))
    np.testing.assert_allclose(np.asarray(fn(0.5, v)), 2 * (v + 100.0))
    np.testing.assert_allclose(np.asarray(fn(-1.0, v)), v - 100.0)


def test_cvm_applies_update_pairs_in_vm():
    """update-storage handling inside the C++ VM (reference UpdatingVM)."""
    import aesara_tpu.tensor as at
    from aesara_tpu.graph.fg import FunctionGraph
    from aesara_tpu.link.c.vm_linker import CVMLinker

    x = at.vector("x", dtype="float64")
    new_x = x * 2.0
    fg = FunctionGraph([x], [new_x])
    linker = CVMLinker(update_map={0: 0})
    linker.accept(fg)
    run, in_c, out_c = linker.make_thunk()
    in_c[0].storage[0] = np.ones(3)
    run()
    # the VM itself wrote the update output back into the input cell
    np.testing.assert_allclose(in_c[0].storage[0], 2 * np.ones(3))
    run()
    np.testing.assert_allclose(in_c[0].storage[0], 4 * np.ones(3))
