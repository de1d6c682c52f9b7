"""Fused multiply-accumulate product ops (reference ``aesara/tensor/blas.py``,
2,756 LoC: Gemm:872 / Gemv:231 / Ger:330 / Dot22:1659 / Dot22Scalar:1954 /
GemmOptimizer:1515, plus C bindings in ``blas_c.py``/``blas_headers.py``).

TPU re-design: there is no BLAS library to discover — every product rides
the MXU through one ``dot_general``.  What survives from the reference is
the *fusion contract*: ``beta·z + alpha·(x@y)`` as a single graph node.
That buys three real things here:

- one node instead of four at trace time (Dot + 2 Mul + Add), so large
  optimizer/training graphs stay small before XLA even sees them;
- the accumulate form is explicit, so the inplace variant can declare
  ``destroy_map`` and the runtime may donate ``z``'s buffer — the update
  ``z ← beta·z + alpha·x@y`` never materializes a second (M,N) array
  (XLA's donation analysis needs the aliasing told to it on the py/CVM
  paths; under whole-graph jit the linker already donates updates);
- reference graphs built from ``aesara.tensor.blas`` port unchanged.

The ``GemmOptimizer`` role (pattern-matching the mul/add soup back into
Gemm) is ``local_gemm_fusion``/``local_gemv_fusion``/``local_ger_fusion``
below, registered as the ``BlasOpt`` optdb entry at the reference's
position 1.7.  ``Dot22``/``Dot22Scalar`` exist for parity and as rewrite
targets but are NOT force-substituted for ``Dot``: splitting dots by
arity is a C-dispatch artifact with no MXU payoff.
"""

from __future__ import annotations

import numpy as np

from aesara_tpu.compile.mode import optdb
from aesara_tpu.graph.ir import Apply, Constant
from aesara_tpu.graph.op import Op
from aesara_tpu.graph.rewriting.basic import (
    NodeProcessingGraphRewriter,
    copy_stack_trace,
    in2out,
    node_rewriter,
)
from aesara_tpu.tensor.basic import as_tensor_variable, cast, constant
from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise
from aesara_tpu.tensor.math import (  # noqa: F401  (re-exported reference names)
    BatchedDot,
    Dot,
    batched_dot,
    dot,
    outer,
)
from aesara_tpu.tensor.math import add
from aesara_tpu.tensor.type import TensorType


def _np_out(node, value):
    return np.asarray(value).astype(node.outputs[0].type.dtype, copy=False)


def _check_dtypes(opname, *vars_):
    dt = vars_[0].type.dtype
    for v in vars_[1:]:
        if v.type.dtype != dt:
            raise TypeError(
                f"{opname} requires a single dtype, got "
                f"{[v.type.dtype for v in vars_]}; cast the operands"
            )
    return dt


class Gemm(Op):
    """out = beta·z + alpha·(x @ y) with z, x, y matrices (reference
    ``blas.py:872``).  ``inplace=True`` declares ``destroy_map={0:[0]}``:
    z's buffer is overwritten (donated under XLA)."""

    __props__ = ("inplace",)

    def __init__(self, inplace: bool = False):
        self.inplace = bool(inplace)
        if self.inplace:
            self.destroy_map = {0: [0]}

    def make_node(self, z, alpha, x, y, beta):
        z, alpha, x, y, beta = map(
            as_tensor_variable, (z, alpha, x, y, beta)
        )
        if z.type.ndim != 2 or x.type.ndim != 2 or y.type.ndim != 2:
            raise TypeError("Gemm needs matrix z, x, y")
        if alpha.type.ndim != 0 or beta.type.ndim != 0:
            raise TypeError("Gemm needs scalar alpha, beta")
        dt = _check_dtypes("Gemm", z, alpha, x, y, beta)
        return Apply(self, [z, alpha, x, y, beta],
                     [TensorType(dt, z.type.shape)()])

    def perform(self, node, inputs, output_storage):
        z, alpha, x, y, beta = inputs
        if self.inplace and z.flags.writeable:
            z *= beta
            z += alpha * np.dot(x, y)
            output_storage[0][0] = z
        else:
            output_storage[0][0] = _np_out(node, beta * z + alpha * np.dot(x, y))

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def L_op(self, inputs, outputs, output_grads):
        z, alpha, x, y, beta = inputs
        (gz,) = output_grads
        xy = dot(x, y)
        return [
            cast(gz * beta, z.type.dtype),
            cast((gz * xy).sum(), alpha.type.dtype),
            cast(dot(gz, y.T) * alpha, x.type.dtype),
            cast(dot(x.T, gz) * alpha, y.type.dtype),
            cast((gz * z).sum(), beta.type.dtype),
        ]

    def __str__(self):
        return "Gemm{inplace}" if self.inplace else "Gemm{no_inplace}"


gemm_no_inplace = Gemm(inplace=False)
gemm_inplace = Gemm(inplace=True)


class Gemv(Op):
    """out = beta·z + alpha·(A @ x) with z, x vectors (reference
    ``blas.py:231``)."""

    __props__ = ("inplace",)

    def __init__(self, inplace: bool = False):
        self.inplace = bool(inplace)
        if self.inplace:
            self.destroy_map = {0: [0]}

    def make_node(self, z, alpha, A, x, beta):
        z, alpha, A, x, beta = map(as_tensor_variable, (z, alpha, A, x, beta))
        if z.type.ndim != 1 or A.type.ndim != 2 or x.type.ndim != 1:
            raise TypeError("Gemv needs vector z, matrix A, vector x")
        if alpha.type.ndim != 0 or beta.type.ndim != 0:
            raise TypeError("Gemv needs scalar alpha, beta")
        dt = _check_dtypes("Gemv", z, alpha, A, x, beta)
        return Apply(self, [z, alpha, A, x, beta],
                     [TensorType(dt, z.type.shape)()])

    def perform(self, node, inputs, output_storage):
        z, alpha, A, x, beta = inputs
        output_storage[0][0] = _np_out(node, beta * z + alpha * np.dot(A, x))

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def L_op(self, inputs, outputs, output_grads):
        z, alpha, A, x, beta = inputs
        (gz,) = output_grads
        Ax = dot(A, x)
        return [
            cast(gz * beta, z.type.dtype),
            cast(dot(gz, Ax), alpha.type.dtype),
            cast(outer(gz, x) * alpha, A.type.dtype),
            cast(dot(A.T, gz) * alpha, x.type.dtype),
            cast(dot(gz, z), beta.type.dtype),
        ]

    def __str__(self):
        return "Gemv{inplace}" if self.inplace else "Gemv{no_inplace}"


gemv_no_inplace = Gemv(inplace=False)
gemv_inplace = Gemv(inplace=True)


class Ger(Op):
    """out = z + alpha·outer(x, y) — rank-1 update (reference
    ``blas.py:330``)."""

    __props__ = ("inplace",)

    def __init__(self, inplace: bool = False):
        self.inplace = bool(inplace)
        if self.inplace:
            self.destroy_map = {0: [0]}

    def make_node(self, z, alpha, x, y):
        z, alpha, x, y = map(as_tensor_variable, (z, alpha, x, y))
        if z.type.ndim != 2 or x.type.ndim != 1 or y.type.ndim != 1:
            raise TypeError("Ger needs matrix z, vectors x, y")
        if alpha.type.ndim != 0:
            raise TypeError("Ger needs scalar alpha")
        dt = _check_dtypes("Ger", z, alpha, x, y)
        return Apply(self, [z, alpha, x, y], [TensorType(dt, z.type.shape)()])

    def perform(self, node, inputs, output_storage):
        z, alpha, x, y = inputs
        output_storage[0][0] = _np_out(node, z + alpha * np.outer(x, y))

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def L_op(self, inputs, outputs, output_grads):
        z, alpha, x, y = inputs
        (gz,) = output_grads
        return [
            gz,
            cast((gz * outer(x, y)).sum(), alpha.type.dtype),
            cast(dot(gz, y) * alpha, x.type.dtype),
            cast(dot(gz.T, x) * alpha, y.type.dtype),
        ]

    def __str__(self):
        return "Ger{inplace}" if self.inplace else "Ger{no_inplace}"


ger_no_inplace = Ger(inplace=False)
ger_inplace = Ger(inplace=True)


class Dot22(Op):
    """Matrix-matrix product, both operands 2D (reference ``blas.py:1659``).
    Same MXU lowering as Dot; exists as a parity target."""

    __props__ = ()

    def make_node(self, x, y):
        x, y = as_tensor_variable(x), as_tensor_variable(y)
        if x.type.ndim != 2 or y.type.ndim != 2:
            raise TypeError("Dot22 needs two matrices")
        dt = _check_dtypes("Dot22", x, y)
        return Apply(self, [x, y],
                     [TensorType(dt, (x.type.shape[0], y.type.shape[1]))()])

    def perform(self, node, inputs, output_storage):
        x, y = inputs
        output_storage[0][0] = _np_out(node, np.dot(x, y))

    def infer_shape(self, fgraph, node, input_shapes):
        return [(input_shapes[0][0], input_shapes[1][1])]

    def L_op(self, inputs, outputs, output_grads):
        x, y = inputs
        (gz,) = output_grads
        return [cast(dot(gz, y.T), x.type.dtype),
                cast(dot(x.T, gz), y.type.dtype)]

    def __str__(self):
        return "Dot22"


_dot22 = Dot22()


class Dot22Scalar(Op):
    """a·(x @ y) for 2D x, y and scalar a (reference ``blas.py:1954``)."""

    __props__ = ()

    def make_node(self, x, y, a):
        x, y, a = map(as_tensor_variable, (x, y, a))
        if x.type.ndim != 2 or y.type.ndim != 2 or a.type.ndim != 0:
            raise TypeError("Dot22Scalar needs two matrices and a scalar")
        dt = _check_dtypes("Dot22Scalar", x, y, a)
        return Apply(self, [x, y, a],
                     [TensorType(dt, (x.type.shape[0], y.type.shape[1]))()])

    def perform(self, node, inputs, output_storage):
        x, y, a = inputs
        output_storage[0][0] = _np_out(node, a * np.dot(x, y))

    def infer_shape(self, fgraph, node, input_shapes):
        return [(input_shapes[0][0], input_shapes[1][1])]

    def L_op(self, inputs, outputs, output_grads):
        x, y, a = inputs
        (gz,) = output_grads
        return [
            cast(dot(gz, y.T) * a, x.type.dtype),
            cast(dot(x.T, gz) * a, y.type.dtype),
            cast((gz * dot(x, y)).sum(), a.type.dtype),
        ]

    def __str__(self):
        return "Dot22Scalar"


_dot22scalar = Dot22Scalar()


# --- user-facing builders (reference function surface) ---------------------

def _uniform_dtype(*args):
    from aesara_tpu.scalar.ops import upcast

    dt = args[0].type.dtype
    for a in args[1:]:
        dt = upcast(dt, a.type.dtype)
    return dt


def _castall(dt, *args):
    return [a if a.type.dtype == dt else cast(a, dt) for a in args]


def gemm(z, alpha, x, y, beta):
    """β·z + α·(x@y) as ONE fused node."""
    z, alpha, x, y, beta = map(as_tensor_variable, (z, alpha, x, y, beta))
    dt = _uniform_dtype(z, alpha, x, y, beta)
    return gemm_no_inplace(*_castall(dt, z, alpha, x, y, beta))


def gemv(z, alpha, A, x, beta):
    """β·z + α·(A@x) as ONE fused node."""
    z, alpha, A, x, beta = map(as_tensor_variable, (z, alpha, A, x, beta))
    dt = _uniform_dtype(z, alpha, A, x, beta)
    return gemv_no_inplace(*_castall(dt, z, alpha, A, x, beta))


def ger(z, alpha, x, y):
    """z + α·outer(x, y) as ONE fused node."""
    z, alpha, x, y = map(as_tensor_variable, (z, alpha, x, y))
    dt = _uniform_dtype(z, alpha, x, y)
    return ger_no_inplace(*_castall(dt, z, alpha, x, y))


def batched_tensordot(x, y, axes=2):
    from aesara_tpu.tensor.math import tensordot
    from aesara_tpu.scan.views import map as scan_map

    res, _ = scan_map(lambda a, b: tensordot(a, b, axes=axes),
                      sequences=[x, y])
    return res


# ---------------------------------------------------------------------------
# BlasOpt: the GemmOptimizer role (reference blas.py:1515, optdb position
# 1.7) — recover the fused forms from the canonicalized mul/add soup.
# ---------------------------------------------------------------------------

def _as_scalar(v):
    """The 0-d variable behind a broadcast-to-ndim term, else None."""
    if isinstance(v, Constant):
        data = np.asarray(v.data)
        if data.size == 1:
            return constant(data.reshape(())[()], dtype=v.type.dtype)
        return None
    node = v.owner
    if (
        node is not None
        and isinstance(node.op, DimShuffle)
        and all(o == "x" for o in node.op.new_order)
        and node.inputs[0].type.ndim == 0
    ):
        return node.inputs[0]
    return None


def _split_coeff(term):
    """term -> (scalar_coefficient | None, core_variable).

    Peels ONE level of Mul whose other factors are broadcast scalars
    (the shape the AlgebraicCanonizer leaves behind)."""
    node = term.owner
    if node is None or not isinstance(node.op, Elemwise):
        return None, term
    if type(node.op.scalar_op).__name__ != "Mul":
        return None, term
    scalars, cores = [], []
    for i in node.inputs:
        s = _as_scalar(i)
        if s is not None:
            scalars.append(s)
        else:
            cores.append(i)
    if not scalars or len(cores) != 1:
        return None, term
    coeff = scalars[0]
    for s in scalars[1:]:
        coeff = coeff * s
    return coeff, cores[0]


def _is_plain_dot(v, fgraph):
    """v = Dot/Dot22/Dot22Scalar on matrices consumed only here →
    (x, y, baked_in_scalar_or_None)."""
    node = v.owner
    if node is None or not isinstance(node.op, (Dot, Dot22, Dot22Scalar)):
        return None
    x, y = node.inputs[0], node.inputs[1]
    if x.type.ndim != 2 or y.type.ndim != 2:
        return None
    if len(fgraph.clients.get(v, ())) != 1:
        return None  # the product is needed elsewhere: fusing would recompute
    baked = node.inputs[2] if isinstance(node.op, Dot22Scalar) else None
    return x, y, baked


def _outer_operands(x, y):
    """(vx, vy) when Dot(x, y) is outer(vx, vy), else None."""
    def _col(v):
        n = v.owner
        if (n is not None and isinstance(n.op, DimShuffle)
                and tuple(n.op.new_order) == (0, "x")):
            return n.inputs[0]
        return None

    def _row(v):
        n = v.owner
        if (n is not None and isinstance(n.op, DimShuffle)
                and tuple(n.op.new_order) == ("x", 0)):
            return n.inputs[0]
        return None

    vx, vy = _col(x), _row(y)
    if vx is not None and vy is not None:
        return vx, vy
    return None


def _one(dtype):
    return constant(np.asarray(1, dtype=dtype)[()], dtype=dtype)


def _z_not_broadcasting(zcore, out):
    """Reject fusion when z would broadcast against the dot result:
    Gemm/Gemv type their output from z's static shape, so a z typed
    (1, n) added to an (m, n) dot would give the fused node false
    static-shape metadata (and a wrong infer_shape)."""
    return all(
        not (zs == 1 and os != 1)
        for zs, os in zip(zcore.type.shape, out.type.shape)
    )


@node_rewriter([Elemwise])
def local_gemm_fusion(fgraph, node):
    """add(β·z, α·dot(x,y)) → Gemm / Ger; the matrix case."""
    if type(node.op.scalar_op).__name__ != "Add":
        return False
    out = node.outputs[0]
    if out.type.ndim != 2 or out.type.dtype not in (
        "float16", "bfloat16", "float32", "float64",
    ):
        return False
    terms = list(node.inputs)
    if len(terms) < 2:
        return False
    for i, t in enumerate(terms):
        alpha, core = _split_coeff(t)
        xy = _is_plain_dot(core, fgraph)
        if xy is None:
            continue
        rest = terms[:i] + terms[i + 1:]
        z = rest[0] if len(rest) == 1 else add(*rest)
        if z.type.ndim != 2:
            continue
        beta, zcore = _split_coeff(z)
        if beta is None:
            beta, zcore = _one(out.type.dtype), z
        if zcore.type.ndim != 2 or not _z_not_broadcasting(zcore, out):
            continue
        x, y, baked = xy
        dt = out.type.dtype
        if alpha is None:
            alpha = _one(dt)
        if baked is not None:
            alpha = alpha * baked
        outer_ops = _outer_operands(x, y)
        if outer_ops is not None and _is_one(beta):
            vx, vy = outer_ops
            new = ger_no_inplace(*_castall(dt, zcore, alpha, vx, vy))
        else:
            new = gemm_no_inplace(*_castall(dt, zcore, alpha, x, y, beta))
        if new.type.ndim != 2:
            continue
        conv = out.type.convert_variable(new)
        if conv is None:
            continue
        copy_stack_trace(out, conv)
        return [conv]
    return False


def _is_one(v):
    if isinstance(v, Constant):
        try:
            return float(np.asarray(v.data)) == 1.0
        except Exception:
            return False
    return False


@node_rewriter([Elemwise])
def local_gemv_fusion(fgraph, node):
    """add(β·z, α·dot(A,x)) → Gemv; the vector case."""
    if type(node.op.scalar_op).__name__ != "Add":
        return False
    out = node.outputs[0]
    if out.type.ndim != 1 or out.type.dtype not in (
        "float16", "bfloat16", "float32", "float64",
    ):
        return False
    terms = list(node.inputs)
    if len(terms) < 2:
        return False
    for i, t in enumerate(terms):
        alpha, core = _split_coeff(t)
        n = core.owner
        if n is None or not isinstance(n.op, Dot):
            continue
        A, x = n.inputs
        if A.type.ndim != 2 or x.type.ndim != 1:
            continue
        if len(fgraph.clients.get(core, ())) != 1:
            continue
        rest = terms[:i] + terms[i + 1:]
        z = rest[0] if len(rest) == 1 else add(*rest)
        if z.type.ndim != 1:
            continue
        beta, zcore = _split_coeff(z)
        if beta is None:
            beta, zcore = _one(out.type.dtype), z
        if zcore.type.ndim != 1 or not _z_not_broadcasting(zcore, out):
            continue
        dt = out.type.dtype
        if alpha is None:
            alpha = _one(dt)
        new = gemv_no_inplace(*_castall(dt, zcore, alpha, A, x, beta))
        conv = out.type.convert_variable(new)
        if conv is None:
            continue
        copy_stack_trace(out, conv)
        return [conv]
    return False


@node_rewriter([Elemwise])
def local_dot22scalar(fgraph, node):
    """α·dot(x,y) with no addend → Dot22Scalar (keeps the scale inside
    the one matmul node)."""
    if type(node.op.scalar_op).__name__ != "Mul":
        return False
    out = node.outputs[0]
    if out.type.ndim != 2 or out.type.dtype not in (
        "float16", "bfloat16", "float32", "float64",
    ):
        return False
    alpha, core = _split_coeff(out)
    if alpha is None:
        return False
    xy = _is_plain_dot(core, fgraph)
    if xy is None:
        return False
    x, y, baked = xy
    if baked is not None:
        alpha = alpha * baked
    dt = out.type.dtype
    new = _dot22scalar(*_castall(dt, x, y, alpha))
    conv = out.type.convert_variable(new)
    if conv is None:
        return False
    copy_stack_trace(out, conv)
    return [conv]


# reference: BlasOpt at optdb position 1.7 (blas.py:1909-1921)
optdb.register(
    "BlasOpt",
    in2out(local_gemm_fusion, local_gemv_fusion, local_dot22scalar,
           name="BlasOpt"),
    "fast_run", position=1.7,
)


# ---------------------------------------------------------------------------
# inplace specialization (reference use_c_blas band, position 70): once
# past the destroy-handler gate, accumulate into z's buffer.
# ---------------------------------------------------------------------------

@node_rewriter([Gemm, Gemv, Ger], inplace=True)
def local_blas_inplace(fgraph, node):
    op = node.op
    if op.inplace:
        return False
    z = node.inputs[0]
    # destroying is only legal for intermediates consumed nowhere else
    # (function inputs are Supervisor-protected; other clients would see
    # the clobbered buffer)
    if z.owner is None or len(fgraph.clients.get(z, ())) != 1:
        return False
    # z may be a VIEW of a function input or constant (e.g. x[::-1]):
    # writing into it would clobber the protected root's storage
    from aesara_tpu.graph.destroyhandler import droot

    zroot = droot(z)
    if zroot.owner is None or isinstance(zroot, Constant):
        return False
    inplace_op = {Gemm: gemm_inplace, Gemv: gemv_inplace,
                  Ger: ger_inplace}[type(op)]
    new = inplace_op(*node.inputs)
    copy_stack_trace(node.outputs[0], new)
    return new.owner.outputs


optdb.register(
    "blas_inplace",
    in2out(
        local_blas_inplace,
        name="blas_inplace",
        failure_callback=NodeProcessingGraphRewriter.warn_inplace,
    ),
    "fast_run", "inplace", position=70.0,
)


# ---------------------------------------------------------------------------
# XLA lowerings: one dot_general plus an FMA that XLA folds into the
# matmul epilogue.  Registered here (not in link/jax/dispatch.py) because
# this module loads after link.jax during package init.
# ---------------------------------------------------------------------------

def _register_jax_lowerings():
    import jax.numpy as jnp

    from aesara_tpu.config import config
    from aesara_tpu.link.jax.dispatch import jax_funcify

    precision = config.jax_default_matmul_precision

    @jax_funcify.register(Gemm)
    def _jax_gemm(op, node=None, **kwargs):
        def gemm_(z, alpha, x, y, beta):
            return beta * z + alpha * jnp.matmul(x, y, precision=precision)

        return gemm_

    @jax_funcify.register(Gemv)
    def _jax_gemv(op, node=None, **kwargs):
        def gemv_(z, alpha, A, x, beta):
            return beta * z + alpha * jnp.matmul(A, x, precision=precision)

        return gemv_

    @jax_funcify.register(Ger)
    def _jax_ger(op, node=None, **kwargs):
        def ger_(z, alpha, x, y):
            return z + alpha * jnp.outer(x, y)

        return ger_

    @jax_funcify.register(Dot22)
    def _jax_dot22(op, node=None, **kwargs):
        def dot22_(x, y):
            return jnp.matmul(x, y, precision=precision)

        return dot22_

    @jax_funcify.register(Dot22Scalar)
    def _jax_dot22scalar(op, node=None, **kwargs):
        def dot22scalar_(x, y, a):
            return a * jnp.matmul(x, y, precision=precision)

        return dot22scalar_


_register_jax_lowerings()
