"""``DimShuffle``, ``Elemwise`` and ``CAReduce``: lifting the scalar algebra
to tensors.

Re-design of the reference's ``aesara/tensor/elemwise.py`` (DimShuffle:39,
Elemwise:304, CAReduce:1221).  The reference generates C loops with OpenMP
(``elemwise_cgen.py``); here the device path is XLA (jnp broadcasting /
``jnp.transpose`` / reduction primitives) registered in
``aesara_tpu.link.jax.dispatch`` — XLA fuses elemwise chains onto the VPU,
and the fusion rewrite builds ``Composite`` ops that can optionally lower
to a single Pallas kernel (SURVEY §2.11 item 7).

Broadcasting contract (same as the reference): a dimension broadcasts only
if its *static* shape is 1.  Unknown (None) dims are assumed
non-broadcastable; mismatched runtime dims raise at execution.
"""

from __future__ import annotations

from copy import copy
from typing import Optional, Sequence, Tuple, Union

import numpy as np

from aesara_tpu import scalar as aes
from aesara_tpu.graph.ir import Apply, Variable, io_toposort
from aesara_tpu.graph.op import Op
from aesara_tpu.scalar.ops import ScalarType, _np_dtype, discrete_dtypes
from aesara_tpu.tensor.type import TensorType


__all__ = ["DimShuffle", "Elemwise", "CAReduce", "scalar_elemwise", "get_normalized_batch_axes"]


class DimShuffle(Op):
    """Transpose / insert broadcast dims / drop size-1 dims
    (reference ``elemwise.py:39``; C impl ``tensor/c_code/dimshuffle.c`` →
    XLA transpose+reshape)."""

    __props__ = ("input_ndim", "new_order")
    view_map = {0: [0]}

    def __init__(self, input_ndim: int, new_order: Sequence[Union[int, str]]):
        self.input_ndim = int(input_ndim)
        self.new_order = tuple(new_order)
        for d in self.new_order:
            if d == "x":
                continue
            if not isinstance(d, (int, np.integer)):
                raise TypeError(f"new_order entries must be ints or 'x', got {d!r}")
            if d < 0 or d >= input_ndim:
                raise ValueError(f"axis {d} out of range for ndim {input_ndim}")
        if len([d for d in self.new_order if d != "x"]) != len(
            set(d for d in self.new_order if d != "x")
        ):
            raise ValueError(f"duplicate axes in {new_order}")
        self.drop = [i for i in range(input_ndim) if i not in self.new_order]
        self.shuffle = [d for d in self.new_order if d != "x"]
        self.augment = [i for i, d in enumerate(self.new_order) if d == "x"]
        self.transposition = self.shuffle + self.drop
        self.is_transpose = not self.drop and not self.augment

    def make_node(self, inp) -> Apply:
        from aesara_tpu.tensor.basic import as_tensor_variable

        inp = as_tensor_variable(inp)
        if inp.type.ndim != self.input_ndim:
            raise TypeError(
                f"DimShuffle expected ndim {self.input_ndim}, got {inp.type.ndim}"
            )
        for d in self.drop:
            if inp.type.shape[d] != 1:
                raise TypeError(
                    f"cannot drop non-broadcastable dim {d} of {inp.type}"
                )
        out_shape = tuple(
            1 if d == "x" else inp.type.shape[d] for d in self.new_order
        )
        out_type = TensorType(inp.type.dtype, out_shape)
        return Apply(self, [inp], [out_type()])

    def __str__(self):
        if self.is_transpose:
            return f"Transpose{{axes={self.shuffle}}}"
        return f"DimShuffle{{order=[{', '.join(map(str, self.new_order))}]}}"

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        res = np.transpose(x, self.transposition)
        shape = list(res.shape[: len(self.shuffle)])
        for aug in sorted(self.augment):
            shape.insert(aug, 1)
        output_storage[0][0] = res.reshape(shape)

    def infer_shape(self, fgraph, node, input_shapes):
        (ishape,) = input_shapes
        from aesara_tpu.tensor.basic import constant

        return [
            tuple(
                constant(1, dtype="int64") if d == "x" else ishape[d]
                for d in self.new_order
            )
        ]

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        grad_order = ["x"] * x.type.ndim
        for i, d in enumerate(self.new_order):
            if d != "x":
                grad_order[d] = i
        if x.type.dtype in discrete_dtypes:
            return [x.zeros_like()]
        res = gz
        # dims the forward broadcast in ('x') must be summed out of the
        # cotangent before they can be dropped — gz's static shape there
        # may be unknown (None) even though the VALUE broadcasts
        aug = [i for i, d in enumerate(self.new_order) if d == "x"]
        if aug:
            from aesara_tpu.tensor.math import sum as _tsum

            res = _tsum(res, axis=aug, keepdims=True)
        res = DimShuffle(res.type.ndim, grad_order)(res)
        # restore any static-shape info lost through the round trip
        from aesara_tpu.tensor.shape import specify_shape

        if res.type.shape != x.type.shape:
            res = specify_shape(res, x.type.shape)
        return [res]

    def R_op(self, inputs, eval_points):
        if eval_points[0] is None:
            return [None]
        return self(eval_points[0], return_list=True)


class Elemwise(Op):
    """Broadcast a ScalarOp over tensors (reference ``elemwise.py:304``).

    ``Elemwise(add)(x, y)`` is numpy's ``x + y``.  Inputs of lower rank are
    left-padded with broadcast dims via DimShuffle in ``make_node``.
    """

    __props__ = ("scalar_op", "inplace_pattern")

    def __init__(self, scalar_op, inplace_pattern=None, name=None, nfunc_spec=None):
        self.scalar_op = scalar_op
        self.inplace_pattern = tuple(sorted((inplace_pattern or {}).items()))
        self.name = name
        self.destroy_map = {o: [i] for o, i in self.inplace_pattern}

    @property
    def nin(self):
        return self.scalar_op.nin

    @property
    def nout(self):
        return self.scalar_op.nout

    def get_output_info(self, *inputs):
        """Pad inputs to common ndim, compute output static shapes/dtypes."""
        target_ndim = max(i.type.ndim for i in inputs)
        padded = []
        for i in inputs:
            if i.type.ndim < target_ndim:
                pad = ("x",) * (target_ndim - i.type.ndim) + tuple(range(i.type.ndim))
                i = DimShuffle(i.type.ndim, pad)(i)
            padded.append(i)
        # combine static shapes
        out_shape = []
        for dim in range(target_ndim):
            dims = [i.type.shape[dim] for i in padded]
            non_one = {d for d in dims if d is not None and d != 1}
            if len(non_one) > 1:
                raise TypeError(
                    f"incompatible Elemwise input shapes at dim {dim}: {dims}"
                )
            if non_one:
                out_shape.append(next(iter(non_one)))
            elif all(d == 1 for d in dims):
                out_shape.append(1)
            else:
                out_shape.append(None)
        out_dtypes = [
            t.dtype
            for t in self.scalar_op.output_types(
                [ScalarType(i.type.dtype) for i in padded]
            )
        ]
        return padded, tuple(out_shape), out_dtypes

    def make_node(self, *inputs) -> Apply:
        from aesara_tpu.tensor.basic import as_tensor_variable

        inputs = [as_tensor_variable(i) for i in inputs]
        padded, out_shape, out_dtypes = self.get_output_info(*inputs)
        outputs = [TensorType(dt, out_shape)() for dt in out_dtypes]
        return Apply(self, padded, outputs)

    def __str__(self):
        if self.name:
            return self.name
        items = dict(self.inplace_pattern)
        suffix = f"{{{items}}}" if items else ""
        return f"Elemwise{{{self.scalar_op}}}{suffix}"

    def perform(self, node, inputs, output_storage):
        # reference-semantics broadcasting check: only static-1 dims broadcast
        out_ndim = node.outputs[0].type.ndim
        shapes = [np.shape(i) for i in inputs]
        for inp_var, shp in zip(node.inputs, shapes):
            for d, (st, rt) in enumerate(zip(inp_var.type.shape, shp)):
                if st != 1 and rt == 1:
                    others = [s[d] for s in shapes if s[d] != 1]
                    if others and any(o != 1 for o in others):
                        raise ValueError(
                            f"runtime broadcasting of non-broadcastable dim {d}"
                            f" (static shape {inp_var.type.shape}, got {shp})"
                        )
        out_dts = [o.type.dtype for o in node.outputs]
        if all(dt not in discrete_dtypes for dt in out_dts):
            # numpy ufunc loop selection computes e.g. exp(int8) in
            # FLOAT16 before our output cast; the reference's C code
            # computes in the output dtype.  Pre-cast discrete inputs so
            # the py oracle matches both (int8 exp → float32 precision).
            tgt = _np_dtype(out_dts[0])
            inputs = [
                np.asarray(i).astype(tgt, copy=False)
                if np.asarray(i).dtype.kind in "bui" else i
                for i in inputs
            ]
        try:
            results = self.scalar_op.impl(*inputs)
            if self.nout == 1:
                results = (results,)
            # ufunc-style impls vectorize; verify shape
            expected = np.broadcast_shapes(*shapes) if shapes else ()
            if any(np.shape(r) != expected for r in results):
                raise ValueError("scalar impl did not vectorize")
        except Exception:
            vec = np.vectorize(
                self.scalar_op.impl,
                otypes=[_np_dtype(o.type.dtype) for o in node.outputs],
            )
            results = vec(*inputs)
            if self.nout == 1:
                results = (results,)
        for storage, r, o in zip(output_storage, results, node.outputs):
            storage[0] = np.asarray(r).astype(_np_dtype(o.type.dtype), copy=False)

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.basic import constant

        if len(node.inputs) == 1:
            return [input_shapes[0]] * len(node.outputs)
        out = []
        for d in range(node.outputs[0].type.ndim):
            # pick a dim known statically non-broadcastable if possible
            chosen = None
            for inp, ish in zip(node.inputs, input_shapes):
                if inp.type.shape[d] is not None and inp.type.shape[d] != 1:
                    chosen = ish[d]
                    break
            if chosen is None:
                # static-only broadcasting (enforced on both paths): a
                # runtime-1 dim with static None may NOT broadcast, so
                # every input whose static dim isn't exactly 1 has the
                # same runtime extent — any of them is the output's
                nonb = [
                    ish[d]
                    for inp, ish in zip(node.inputs, input_shapes)
                    if inp.type.shape[d] != 1
                ]
                chosen = nonb[0] if nonb else constant(1, dtype="int64")
            out.append(chosen)
        return [tuple(out)] * len(node.outputs)

    def connection_pattern(self, node):
        if hasattr(self.scalar_op, "connection_pattern"):
            # scalar op arity matches elemwise arity
            snode = self.scalar_op.make_node(
                *[ScalarType(i.type.dtype)() for i in node.inputs]
            )
            return self.scalar_op.connection_pattern(snode)
        return [[True for _ in node.outputs] for _ in node.inputs]

    def L_op(self, inputs, outs, ograds):
        rval = []
        for inp, t_igrad in zip(inputs, self._pointwise_igrads(inputs, outs, ograds)):
            from aesara_tpu.gradient import DisconnectedType, NullType

            if isinstance(getattr(t_igrad, "type", None), (DisconnectedType, NullType)):
                rval.append(t_igrad)
                continue
            rval.append(self._sum_over_broadcasted(t_igrad, inp, outs[0]))
        return rval

    def _pointwise_igrads(self, inputs, outs, ograds):
        """Per-input gradient terms at the OUTPUT shape (no broadcast
        summation).  L_op sums these over broadcast dims; R_op uses them
        directly so broadcast inputs aren't over-counted."""
        from aesara_tpu.gradient import DisconnectedType, NullType

        # 1. scalar gradient graph — a TEMPLATE over fresh scalar
        # placeholders, so test-value propagation must be off while it
        # is built (the placeholders can never carry values; the lifted
        # tensor graph re-propagates them — reference disables test
        # values around the same template construction)
        from aesara_tpu.config import config as _config

        with _config.change_flags(compute_test_value="off"):
            s_inputs = [ScalarType(i.type.dtype)() for i in inputs]
            s_node = self.scalar_op.make_node(*s_inputs)
            s_ograds = [
                ScalarType(g.type.dtype)()
                if not isinstance(g.type, (DisconnectedType, NullType)) else g
                for g in ograds
            ]
            s_igrads = self.scalar_op.L_op(
                s_inputs,
                s_node.outputs,
                s_ograds,
            )
        # 2. lift scalar graph → tensor graph (scalar leaf ↦ tensor arg)
        mapping = dict(zip(s_inputs, inputs))
        for s_out, t_out in zip(s_node.outputs, outs):
            mapping[s_out] = t_out
        for s_g, t_g in zip(s_ograds, ograds):
            if isinstance(s_g, Variable):
                mapping[s_g] = t_g

        def lift(s_var):
            if s_var in mapping:
                return mapping[s_var]
            if isinstance(s_var.type, (DisconnectedType, NullType)):
                return s_var
            if s_var.owner is None:
                # scalar constant → 0-d tensor constant (broadcasts)
                from aesara_tpu.tensor.basic import constant as tconstant

                res = tconstant(s_var.data) if hasattr(s_var, "data") else s_var
                mapping[s_var] = res
                return res
            t_ins = [lift(i) for i in s_var.owner.inputs]
            if any(
                isinstance(getattr(t, "type", None), (DisconnectedType, NullType))
                for t in t_ins
            ):
                bad = next(t for t in t_ins
                           if isinstance(getattr(t, "type", None), (DisconnectedType, NullType)))
                mapping[s_var] = bad
                return bad
            t_node = Elemwise(s_var.owner.op).make_node(*t_ins)
            if _config.compute_test_value != "off":
                # make_node bypasses Op.__call__'s test-value propagation
                from aesara_tpu.graph.op import compute_test_value as _ctv

                _ctv(t_node)
            for s_o, t_o in zip(s_var.owner.outputs, t_node.outputs):
                mapping[s_o] = t_o
            return mapping[s_var]

        rval = []
        for inp, s_igrad in zip(inputs, s_igrads):
            if isinstance(s_igrad.type, (DisconnectedType, NullType)):
                rval.append(s_igrad)
                continue
            rval.append(lift(s_igrad))
        return rval

    @staticmethod
    def _sum_over_broadcasted(gx, inp, out):
        """Sum gradient over dims where ``inp`` was broadcast against the
        elemwise output, restoring inp's static shape."""
        from aesara_tpu.tensor.math import sum as tsum

        if gx.type.ndim != inp.type.ndim:
            raise ValueError("elemwise grad rank mismatch")
        to_sum = [
            d
            for d in range(inp.type.ndim)
            if inp.type.shape[d] == 1 and out.type.shape[d] != 1
        ]
        if to_sum:
            gx = tsum(gx, axis=to_sum, keepdims=True)
        if gx.type.dtype != inp.type.dtype and inp.type.dtype not in discrete_dtypes:
            from aesara_tpu.tensor.basic import cast

            gx = cast(gx, inp.type.dtype)
        return gx

    def do_constant_folding(self, fgraph, node):
        return True


    def R_op(self, inputs, eval_points):
        """JVP of a pointwise op: sum_i (df/dx_i) * t_i.

        The partials are taken at the OUTPUT shape (``_pointwise_igrads``,
        i.e. *before* L_op's broadcast summation) — using L_op directly
        would scale the JVP by the broadcast count for any broadcast
        input (a (1,3) operand against a (4,3) output would contribute
        4x its true tangent)."""
        if all(ev is None for ev in eval_points):
            return [None] * len(self(*inputs, return_list=True))
        outputs = self(*inputs, return_list=True)
        if len(outputs) != 1:
            raise NotImplementedError(
                "R_op for multi-output Elemwise is not implemented"
            )
        from aesara_tpu.tensor.basic import ones_like

        partials = self._pointwise_igrads(inputs, outputs, [ones_like(outputs[0])])
        total = None
        for pd, ev in zip(partials, eval_points):
            if ev is None or pd is None:
                continue
            tname = type(getattr(pd, "type", None)).__name__
            if tname in ("DisconnectedType",):
                continue
            if tname in ("NullType",):
                raise NotImplementedError(
                    f"R_op through non-differentiable input of {self}"
                )
            term = pd * ev
            total = term if total is None else total + term
        return [total]


class CAReduce(Op):
    """Reduce along axes with a commutative/associative ScalarOp
    (reference ``elemwise.py:1221``).  Sum/Prod/Max/Min/All/Any are built
    on this in ``tensor.math``."""

    __props__ = ("scalar_op", "axis", "dtype", "acc_dtype", "upcast_discrete_output")

    def __init__(
        self,
        scalar_op,
        axis: Optional[Union[int, Sequence[int]]] = None,
        dtype: Optional[str] = None,
        acc_dtype: Optional[str] = None,
        upcast_discrete_output: bool = False,
    ):
        if scalar_op.nin != 2 and scalar_op.nin != -1:
            raise TypeError("CAReduce requires a binary (or variadic) scalar op")
        self.scalar_op = scalar_op
        if axis is None:
            self.axis = None
        elif isinstance(axis, (int, np.integer)):
            self.axis = (int(axis),)
        else:
            self.axis = tuple(sorted(int(a) for a in axis))
            if len(set(self.axis)) != len(self.axis):
                raise ValueError("duplicate axes")
        self.dtype = dtype
        self.acc_dtype = acc_dtype
        self.upcast_discrete_output = upcast_discrete_output

    def _normalized_axes(self, ndim: int) -> Tuple[int, ...]:
        if self.axis is None:
            return tuple(range(ndim))
        axes = tuple(a + ndim if a < 0 else a for a in self.axis)
        for a in axes:
            if a < 0 or a >= ndim:
                raise ValueError(f"axis {a} out of range for ndim {ndim}")
        return tuple(sorted(axes))

    def _output_dtype(self, input_dtype: str) -> str:
        from aesara_tpu.config import config

        if self.dtype is not None:
            return self.dtype if self.dtype != "floatX" else config.floatX
        if self.upcast_discrete_output:
            # numpy semantics: small ints accumulate in the platform int
            if input_dtype == "bool" or input_dtype in ("int8", "int16", "int32"):
                return "int64"
            if input_dtype in ("uint8", "uint16", "uint32"):
                return "uint64"
        return input_dtype

    def make_node(self, inp) -> Apply:
        from aesara_tpu.tensor.basic import as_tensor_variable

        inp = as_tensor_variable(inp)
        axes = self._normalized_axes(inp.type.ndim)
        out_shape = tuple(
            s for d, s in enumerate(inp.type.shape) if d not in axes
        )
        out_dtype = self._output_dtype(inp.type.dtype)
        # normalize axis for op identity
        if self.axis is not None and axes != self.axis:
            op = copy(self)
            op.axis = axes
        else:
            op = self
        return Apply(op, [inp], [TensorType(out_dtype, out_shape)()])

    _np_reducers = {
        "add": np.add,
        "mul": np.multiply,
        "maximum": np.maximum,
        "minimum": np.minimum,
        "and_": np.bitwise_and,
        "or_": np.bitwise_or,
        "xor": np.bitwise_xor,
    }

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        axes = self._normalized_axes(x.ndim)
        out_dtype = _np_dtype(node.outputs[0].type.dtype)
        acc_dtype = _np_dtype(self.acc_dtype) if self.acc_dtype else out_dtype
        name = getattr(self.scalar_op, "name", str(self.scalar_op))
        ufunc = self._np_reducers.get(name)
        if x.dtype == np.bool_ and name in ("and_", "or_"):
            ufunc = np.logical_and if name == "and_" else np.logical_or
        if ufunc is None:
            raise NotImplementedError(f"CAReduce perform for {self.scalar_op}")
        acc = x.astype(acc_dtype, copy=False)
        if axes:
            acc = ufunc.reduce(acc, axis=axes)
        elif x.ndim == 0:
            acc = acc
        output_storage[0][0] = np.asarray(acc).astype(out_dtype, copy=False)

    def infer_shape(self, fgraph, node, input_shapes):
        (ishape,) = input_shapes
        axes = self._normalized_axes(node.inputs[0].type.ndim)
        return [tuple(s for d, s in enumerate(ishape) if d not in axes)]

    def grad(self, inputs, output_grads):
        raise NotImplementedError(
            f"gradient of generic CAReduce({self.scalar_op}) not defined"
        )

    def __str__(self):
        ax = "" if self.axis is None else f"{{axis={list(self.axis)}}}"
        name = getattr(self.scalar_op, "name", str(self.scalar_op))
        return f"CAReduce{{{name}}}{ax}"

    def clone(self, **kwargs):
        op = copy(self)
        for k, v in kwargs.items():
            setattr(op, k, v)
        return op


def scalar_elemwise(scalar_op, name: Optional[str] = None):
    """Create the tensor-level function for a scalar op (the ~200 wrappers
    of reference ``tensor/elemwise.py:1718``)."""
    op = Elemwise(scalar_op)

    def fn(*args):
        return op(*args)

    fn.__name__ = name or str(scalar_op)
    fn.scalar_op = scalar_op
    fn.elemwise_op = op
    return fn


def get_normalized_batch_axes(core_axes, core_ndim: int, batch_ndim: int):
    """Map core-op reduction axes to batched axes (helper for vectorize)."""
    if core_axes is None:
        core_axes = tuple(range(core_ndim))
    elif isinstance(core_axes, int):
        core_axes = (core_axes,)
    delta = batch_ndim - core_ndim
    return tuple(a + delta if a >= 0 else a + batch_ndim for a in core_axes)


#: reference printer hook (printing registers a DimShuffle printer)
class DimShufflePrinter:
    def process(self, output, pstate):
        from aesara_tpu.printing import pp

        node = output.owner
        order = node.op.new_order
        inner = pp.process(node.inputs[0], pstate.depth - 1)
        if all(o == "x" for o in order):
            return inner  # pure broadcast pad prints through
        return f"{inner}.dimshuffle({', '.join(map(repr, order))})"
