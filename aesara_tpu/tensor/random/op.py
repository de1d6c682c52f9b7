"""Random variables with functional PRNG state.

TPU-native re-design of the reference's ``aesara/tensor/random/op.py:85``
(RandomVariable) and ``random/type.py`` (RandomGeneratorType).  The
reference mutates NumPy RandomState objects; here state is an immutable
threefry key (uint32[2]) and every RandomVariable returns
``(next_key, draw)`` — key splitting instead of mutation (SURVEY §7
"hard parts" (e)).  The NumPy oracle ``perform`` uses jax.random on the
host so py-mode and XLA-mode draws are bit-identical.
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence, Tuple, Union

import numpy as np

from aesara_tpu.config import config
from aesara_tpu.graph.ir import Apply, Constant, Type, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable, cast, constant, get_vector_length
from aesara_tpu.tensor.type import TensorType


__all__ = ["RandomGeneratorType", "random_generator_type", "RandomVariable",
           "RandomStateType", "default_rng"]


class RandomGeneratorType(Type):
    """Type of PRNG states: raw threefry key data, uint32[2]."""

    def filter(self, data, strict=False, allow_downcast=None):
        arr = np.asarray(data)
        if arr.dtype != np.uint32 or arr.shape != (2,):
            if strict:
                raise TypeError(f"not a threefry key: {data!r}")
            try:
                arr = np.asarray(data, dtype=np.uint32).reshape(2)
            except Exception:
                raise TypeError(f"cannot interpret {data!r} as a threefry key")
        return arr

    def values_eq(self, a, b):
        return np.array_equal(a, b)

    def __eq__(self, other):
        return type(other) is RandomGeneratorType

    def __hash__(self):
        return hash(RandomGeneratorType)

    def __str__(self):
        return "RandomGeneratorType"


#: alias kept for API parity with the reference's RandomStateType
RandomStateType = RandomGeneratorType
random_generator_type = RandomGeneratorType()


_implicit_rng_counter = itertools.count()


def default_rng(seed: Optional[int] = None):
    """Fresh key data from a seed (the reference returns np.random.default_rng).

    With no explicit seed, each call folds a process-unique counter into
    the configured base seed: every implicitly-seeded RandomVariable node
    gets an INDEPENDENT key (the reference creates a fresh Generator per
    make_node).  Identical constant keys would make supposedly
    independent draws bit-equal — and MergeOptimizer would unify the
    nodes outright (review finding)."""
    import jax.random as jr

    if seed is None:
        key = jr.fold_in(
            jr.PRNGKey(config.seed), next(_implicit_rng_counter)
        )
    else:
        key = jr.PRNGKey(seed)
    return np.asarray(jr.key_data(key), dtype=np.uint32)


class RandomVariable(Op):
    """A draw from a distribution (reference ``random/op.py:85``).

    Parameters of the subclass/instance:
      name         — distribution name (maps to jax.random.<fn>)
      ndim_supp    — rank of one draw (0 scalar, 1 vector, ...)
      ndims_params — expected rank of each dist param's core
      dtype        — output dtype ('floatX' resolved at node build)

    Node: (rng, size, *dist_params) → (next_rng, draw).
    """

    __props__ = ("name", "ndim_supp", "ndims_params", "dtype")
    default_output = 1

    def __init__(self, name, ndim_supp, ndims_params, dtype=None):
        self.name = name
        self.ndim_supp = int(ndim_supp)
        self.ndims_params = tuple(ndims_params)
        self.dtype = dtype

    def _supp_shape_from_params(self, dist_params, param_shapes=None):
        """Static support shape (only needed for ndim_supp > 0)."""
        raise NotImplementedError(
            f"{self.name}: support shape rule not implemented"
        )

    def make_node(self, rng, size, *dist_params) -> Apply:
        if rng is None:
            rng = RngConstant(random_generator_type, default_rng())
        if not isinstance(rng.type, RandomGeneratorType):
            raise TypeError("rng must be RandomGeneratorType")
        size = normalize_size_param(size)
        dist_params = [as_tensor_variable(p) for p in dist_params]

        dtype = self.dtype or config.floatX
        if dtype == "floatX":
            dtype = config.floatX

        # static output shape
        try:
            n_size = get_vector_length(size)
        except ValueError:
            n_size = None
        if n_size == 0:
            # broadcast of param batch shapes + support shape
            batch_ndim = 0
            for p, nd in zip(dist_params, self.ndims_params):
                batch_ndim = max(batch_ndim, p.type.ndim - nd)
            out_ndim = batch_ndim + self.ndim_supp
            static = [None] * out_ndim
            # try to combine known param batch dims
            for d in range(batch_ndim):
                dims = []
                for p, nd in zip(dist_params, self.ndims_params):
                    bnd = p.type.ndim - nd
                    off = batch_ndim - bnd
                    if d >= off:
                        dims.append(p.type.shape[d - off])
                known = [x for x in dims if x is not None and x != 1]
                if known:
                    static[d] = known[0]
                elif dims and all(x == 1 for x in dims):
                    static[d] = 1
        else:
            from aesara_tpu.tensor.basic import get_underlying_constant_vector, NotScalarConstantError

            out_ndim = (n_size if n_size is not None else 0) + self.ndim_supp
            static = [None] * out_ndim
            if n_size is not None:
                try:
                    vals = get_underlying_constant_vector(size)
                    for d, v in enumerate(vals):
                        static[d] = int(v)
                except NotScalarConstantError:
                    pass
        if self.ndim_supp:
            try:
                supp = self._supp_shape_from_params(dist_params)
                for i, s in enumerate(supp):
                    static[len(static) - self.ndim_supp + i] = s
            except NotImplementedError:
                pass

        out_type = TensorType(dtype, tuple(static))
        return Apply(
            self, [rng, size] + dist_params, [random_generator_type(), out_type()]
        )

    def __call__(self, *dist_params, size=None, rng=None, name=None,
                 dtype=None, **kwargs):
        # per-call dtype override (reference random/op.py RandomVariable
        # __call__): rebuild the op with the requested output dtype
        op = self
        if dtype is not None and dtype != self.dtype:
            import copy

            op = copy.copy(self)
            op.dtype = "floatX" if dtype == "floatX" else str(np.dtype(dtype))
            return Op.__call__(op, rng, size, *dist_params, name=name, **kwargs)
        res = super().__call__(rng, size, *dist_params, name=name, **kwargs)
        return res

    # --- evaluation via jax.random on host (the oracle IS the device rule)
    def rng_fn(self, key, size_tuple, *params):
        """Return the draw given a jax typed key."""
        import jax.random as jr

        fn = getattr(jr, self.name)
        shape = size_tuple if size_tuple is not None else None
        return fn(key, *params, shape=shape)

    def perform(self, node, inputs, output_storage):
        import jax.random as jr

        rng_data, size, *params = inputs
        key = jr.wrap_key_data(np.asarray(rng_data, dtype=np.uint32))
        next_key, draw_key = jr.split(key)
        size_tuple = tuple(int(s) for s in size) if len(size) else None
        res = self.rng_fn(draw_key, size_tuple, *params)
        from aesara_tpu.scalar.ops import _np_dtype

        output_storage[0][0] = np.asarray(jr.key_data(next_key), dtype=np.uint32)
        output_storage[1][0] = np.asarray(res).astype(
            _np_dtype(node.outputs[1].type.dtype), copy=False
        )

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.shape import shape as tshape

        out = node.outputs[1]
        return [
            (constant(2, dtype="int64"),),
            tuple(tshape(out)[d] for d in range(out.type.ndim)),
        ]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, i, inp, "random draws have no gradient")
                for i, inp in enumerate(inputs)]

    def do_constant_folding(self, fgraph, node):
        return False

    # never fold random draws at trace time: state must stay symbolic
    jax_never_fold = True

    def __str__(self):
        return f"{self.name}_rv"


class RngConstant(Constant):
    """A constant PRNG key."""


def normalize_size_param(size) -> Variable:
    """Coerce size into an int64 vector (empty = derive from params)."""
    if size is None:
        return constant(np.asarray([], dtype="int64"))
    if isinstance(size, Variable):
        if size.type.ndim == 0:
            from aesara_tpu.tensor.basic import stack

            return stack([cast(size, "int64")])
        return cast(size, "int64")
    if isinstance(size, (int, np.integer)):
        return constant(np.asarray([int(size)], dtype="int64"))
    if any(isinstance(s, Variable) for s in size):
        # size=(x.shape[0], 3) — the mainstream reference idiom: stack
        # symbolic dims into an int64 vector (review finding: int()
        # crashed on Variables)
        from aesara_tpu.tensor.basic import stack

        return stack([cast(as_tensor_variable(s), "int64") for s in size])
    return constant(np.asarray([int(s) for s in size], dtype="int64"))
